"""Warehouse data-quality audits — column profiling and referential
integrity.

The reference has no data-quality tooling (its only validation is
per-command error logging, `docrawl_core.py` errors path); these are
the rebuild-original audits every large ingest pipeline runs before
trusting a new snapshot: "what does each column actually contain" and
"do the foreign keys resolve".

Scale shape notes live on each function. Everything is exact (the
oracle gate hashes values), with the approximate scale-path variant
documented where one exists (approx_count_distinct for profiles at
100 TB).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass column profile: per column, row count, null count,
    exact distinct count, and min/max rendered as strings — the
    "what landed in this snapshot" audit (a lang column whose
    n_distinct jumps from 40 to 4000 means the upstream tagger broke).

    Returns (col_name, n_rows, n_nulls, n_distinct, min_s, max_s), one
    row per requested column, in ONE aggregate over the input: all
    measures are computed in a single groupBy-less agg (Spark plans
    the multi-distinct via expand — n_cols× row replication in the
    map stage, still one shuffle), then reshaped to rows with a
    stack() unpivot over the 6-tuple per column. String min/max
    compare by code point in both engines (Spark UTF8_BINARY ≡ DuckDB
    binary collation); all-null columns profile to empty-string
    min/max (COALESCE — mirrored in the oracle).

    At 100 TB swap F.count_distinct for F.approx_count_distinct (HLL,
    no expand, mergeable across shards) — the exact form here is the
    oracle-checkable one.

    ``cols`` must be non-empty plain identifiers (the names are
    interpolated into the stack() expression — exotic parquet names
    need renaming upstream)."""
    import re

    if not cols:
        raise ValueError("cols must be non-empty")
    for c in cols:
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", c):
            raise ValueError(f"column name {c!r} is not a plain identifier")
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.coalesce(
                F.sum(F.col(c).isNull().cast("long")), F.lit(0)
            ).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__dist"),
            F.coalesce(F.min(F.col(c)).cast("string"), F.lit("")).alias(
                f"{c}__min"
            ),
            F.coalesce(F.max(F.col(c)).cast("string"), F.lit("")).alias(
                f"{c}__max"
            ),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__nulls, {c}__dist, {c}__min, {c}__max"
        for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_rows, n_nulls, n_distinct, min_s, max_s)"
        )
    ).select(
        "col_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_s",
        "max_s",
    )


def fk_orphan_audit(
    edges: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit over foreign-key edges: for each
    ``(edge_name, fact, fk_col, dim, pk_col)``, count the fact rows,
    the NULL foreign keys (excused — they reference nothing), and the
    ORPHANS (non-null keys that resolve to no dimension row). A
    snapshot whose lineitem→orders orphan count moves off zero is
    corrupt upstream, full stop.

    Per edge: one exact-count pass over the fact plus one
    left_anti join of the DISTINCT non-null fact keys against the
    DISTINCT dim keys — the anti-join runs on the key dims (broadcast
    when the dim is small), and the orphan count weights each missing
    key by its fact multiplicity, so the numbers mean rows, not keys.
    Edges union into one frame (n_edges is tiny; must be non-empty)."""
    if not edges:
        raise ValueError("edges must be non-empty")
    outs = []
    for name, fact, fk, dim, pk in edges:
        keyed = fact.select(F.col(fk).alias("k"))
        per_key = keyed.where(F.col("k").isNotNull()).groupBy("k").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        orphans = per_key.join(
            dim.select(F.col(pk).alias("k")).distinct(), "k", "left_anti"
        ).agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("n_orphans"))
        base = keyed.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(
                F.sum(F.col("k").isNull().cast("long")), F.lit(0)
            ).alias("n_null_fk"),
        )
        outs.append(
            base.crossJoin(F.broadcast(orphans)).select(
                F.lit(name).alias("fk_edge"),
                F.col("n_rows").cast("long").alias("n_rows"),
                F.col("n_null_fk").cast("long").alias("n_null_fk"),
                F.col("n_orphans").cast("long").alias("n_orphans"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def rebalance_audit(
    df: DataFrame,
    id_col: str,
    n_old: int,
    n_new: int,
) -> DataFrame:
    """Resharding movement audit: when the shard count changes
    ``n_old → n_new``, what fraction of the corpus MOVES under (a)
    naive mod-hash placement and (b) rendezvous (highest-random-
    weight) hashing? Mod placement moves ~1 - 1/lcm-ish of all rows
    (an 8→10 reshard moves ~80% of a 100 TB corpus); rendezvous moves
    only the keys the new shards win (~(n_new-n_old)/n_new), which is
    the minimal-movement bound — THE argument for ring/HRW sharding
    at scale. Returns one row per policy: (policy, n_docs, n_moved,
    moved_ppm), exact ppm.

    Mechanics (cross-engine exact, md5-based like the classifier's
    hashed features): key hash h = md5_60bit(id); mod owner = h mod n.
    Rendezvous owner = argmax over shards s of w(s, id) =
    md5_60bit('shard:<s>:<id>'), computed distributively as ONE
    HashAggregate argmax via BIGINT packing — pack = (w div 32)*32 + s
    (the low 5 bits of the 60-bit weight are traded for the shard id;
    weight ties then break to the larger shard id, deterministically
    in both engines) — never a struct-max (SortAggregate demotion) or
    a window. Fan-out: one shard-dim explode ×(n_old + n_new), one
    HashAggregate, one final 2-row rollup. Requires n_old, n_new ≤ 32
    (the pack width); null ids excluded. Placement is per KEY, so ids
    are deduplicated up front — both policies count distinct keys and
    their ppms are directly comparable even on non-unique id columns.
    Empty inputs yield both policy rows with zero counts (no
    divide-by-zero)."""
    if not (0 < n_old <= 32 and 0 < n_new <= 32):
        raise ValueError("shard counts must be in 1..32 (pack width)")
    ids = (
        df.where(F.col(id_col).isNotNull())
        .select(F.col(id_col).cast("string").alias("id"))
        .distinct()
    )
    h = F.conv(F.substring(F.md5(F.col("id")), 1, 15), 16, 10).cast("long")
    mod = ids.select(
        (h % n_old != h % n_new).cast("long").alias("moved")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum("moved"), F.lit(0)).alias("n_moved"),
    ).select(F.lit("mod").alias("policy"), "n_docs", "n_moved")

    shards = F.sequence(F.lit(0), F.lit(max(n_old, n_new) - 1))
    fan = ids.select(
        "id", F.explode(shards).alias("s")
    ).select(
        "id",
        "s",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("shard:"), F.col("s").cast("string"),
                               F.lit(":"), F.col("id"))),
                1, 15,
            ),
            16, 10,
        ).cast("long").alias("w"),
    )
    packed = fan.groupBy("id").agg(
        F.max(
            F.when(F.col("s") < n_old, F.expr("w div 32 * 32 + s"))
        ).alias("p_old"),
        F.max(
            F.when(F.col("s") < n_new, F.expr("w div 32 * 32 + s"))
        ).alias("p_new"),
    )
    rdv = packed.select(
        ((F.col("p_old") % 32) != (F.col("p_new") % 32))
        .cast("long")
        .alias("moved")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum("moved"), F.lit(0)).alias("n_moved"),
    ).select(F.lit("rendezvous").alias("policy"), "n_docs", "n_moved")

    return mod.unionByName(rdv).select(
        "policy",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_moved").cast("long").alias("n_moved"),
        F.expr(
            "CASE WHEN n_docs = 0 THEN 0"
            " ELSE n_moved * 1000000 div n_docs END"
        ).cast("long").alias("moved_ppm"),
    )
