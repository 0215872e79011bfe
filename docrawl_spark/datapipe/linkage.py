"""String-linkage blocking: exact edit-distance<=1 pair mining at scale.

The naive form — self-join the string universe on
``levenshtein(a, b) <= 1`` — is a cartesian product: O(n^2) comparisons
and a BroadcastNestedLoopJoin plan. The SymSpell / symmetric-delete
observation turns it into an equi-join: if ``ed(a, b) <= 1`` then the
single-character deletion neighborhoods of a and b (each INCLUDING the
string itself) intersect —

- substitution at position i: deleting position i from both sides
  yields the same string;
- insertion/deletion: deleting the inserted character from the longer
  side yields the shorter side, which is in its own neighborhood.

So: explode each string into its len+1 deletion variants (identity
included), equi-join on the variant, and verify the surviving
candidates with one exact ``levenshtein`` call (the block also admits
some ed=2 pairs — two different deletions landing on the same string —
which the verify removes). Per-row fan-out is len(s)+1, bounded and
known; the join is a plain shuffled hash join on the variant key; the
expensive exact comparison runs only on bucket-colliding pairs. This is
the same block-then-verify shape as the MinHash-LSH pipeline
(datapipe/dedup.py), with a deterministic, recall-COMPLETE block:
every true ed<=1 pair shares at least one variant, so unlike LSH there
are no false negatives.

Crawl use: host/URL typo aliasing (``example.com`` vs ``examp1e.com``),
entity key linkage across feeds, OCR-noise vocabulary folding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants_col(col: Column) -> Column:
    """Array of the len+1 single-deletion variants of ``col``, identity
    first: [s, drop(0), drop(1), ...]. Pure JVM exprs (transform over a
    position sequence), no Python in the row path. The empty string maps
    to [''] — guarded, because sequence(1, 0) DESCENDS (CLAUDE.md)."""
    variants = F.concat(
        F.array(col),
        F.transform(
            F.sequence(F.lit(1), F.length(col)),
            lambda i: F.concat(
                F.substring(col, F.lit(1), i - F.lit(1)),
                col.substr(i + F.lit(1), F.length(col)),
            ),
        ),
    )
    return F.when(F.length(col) == 0, F.array(col)).otherwise(variants)


def edit1_pairs(df: DataFrame, col: str) -> DataFrame:
    """All unordered pairs (a < b) of DISTINCT values of ``df[col]``
    with levenshtein(a, b) == 1 (equal strings are not pairs), via
    symmetric-delete blocking + exact verify.

    Returns columns (a, b, dist) with dist == 1 — dist kept so callers
    extending to k>1 keep a stable shape. Scale shape: distinct ->
    explode(len+1) -> variant equi-join -> per-pair dedup (groupBy) ->
    levenshtein verify. Never a cartesian; plan-asserted in tests.
    """
    uni = df.select(F.col(col).cast("string").alias("s")).where(
        F.col("s").isNotNull()
    ).distinct()
    blocked = uni.select(
        "s", F.explode(deletion_variants_col(F.col("s"))).alias("v")
    )
    lhs = blocked.select(F.col("s").alias("a"), "v")
    rhs = blocked.select(F.col("s").alias("b"), "v")
    cand = (
        lhs.join(rhs, on="v", how="inner")
        .where(F.col("a") < F.col("b"))
        # a pair can share several variants — one exact check per pair
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("_n_blocks"))
    )
    return (
        cand.withColumn("dist", F.levenshtein("a", "b"))
        .where(F.col("dist") == 1)
        .select("a", "b", F.col("dist").cast("int").alias("dist"))
    )
