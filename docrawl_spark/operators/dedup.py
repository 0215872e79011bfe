"""Frontier seen-set dedup: Bloom prefilter + exact anti-join.

The reference never revisits a URL only because the user's sequential
program doesn't re-request it; at 10^10-frontier scale "have I seen
this url_hash" is the hottest operator in the engine. Two layers
(SURVEY.md §4.2):

- **Bloom prefilter** (optional): ``bloom_filter_agg`` over the seen
  url_hashes → one binary blob → ``might_contain`` evaluated in the
  candidate scan. Rows the Bloom rejects are DEFINITELY unseen and skip
  the anti-join shuffle entirely; only the might-contain fraction
  (true seen + ~fpp false positives) pays the join. The Bloom is never
  the source of truth — false positives are resolved by the exact join,
  and false negatives are impossible by construction (property-tested).

- **exact left_anti join** on url_hash. At cluster scale both sides are
  bucketed by url_hash (Iceberg ``bucket(N, url_hash)``), making this a
  shuffle-free sort-merge; in local mode AQE picks the strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from docrawl_spark.functions.bloom import build_bloom, might_contain_col


def build_seen_bloom(url_seen: DataFrame, expected_items: int | None = None) -> bytes | None:
    """Aggregate the seen-set into one Bloom blob (a few MB for 10^8
    keys at the default fpp) for broadcast into the candidate scan.
    Returns None for an empty seen-set."""
    n = expected_items if expected_items is not None else url_seen.count()
    if n == 0:
        return None
    return build_bloom(url_seen, "url_hash", expected_items=n)


def anti_join_seen(
    candidates: DataFrame,
    url_seen: DataFrame,
    bloom: bytes | None = None,
    prepartitioned: bool = False,
) -> DataFrame:
    """Rows of ``candidates`` whose url_hash is not in ``url_seen``.

    ``prepartitioned=True``: the caller guarantees ``candidates`` is
    already hash-partitioned on url_hash (e.g. the output of the
    within-wave dedup groupBy). Then the exact join reuses that
    partitioning — zero candidate-side exchange, only the seen side
    shuffles — and the Bloom prefilter is deliberately SKIPPED:

    - its exchange-skipping value is nil here (the big side moves no
      bytes either way), so all it could save is the in-JVM hash
      probe of the build relation — cheaper than the Arrow round-trip
      the probe UDF costs;
    - measured (this repo, Spark 4.1): a pandas/Arrow UDF projection
      BREAKS outputPartitioning propagation — inserting the probe
      column between the dedup aggregate and the join makes the
      planner RE-EXCHANGE the whole candidate side, costing the exact
      shuffle the partition reuse avoids. A Bloom in this position is
      strictly negative until Spark exposes a codegen bloom probe
      (``bloom_filter_agg``/``might_contain`` are not in the public
      registry as of 4.1).

    The Bloom stays load-bearing where candidates are NOT co-located
    with the dedup partitioning: the split path below, recrawl/requeue
    probes, and the storage-bucketed seen table (BENCH.md 100 TB
    notes), where rows it rejects skip the anti-join shuffle.
    ``shuffle_hash`` hint: build the (hash-only) seen side, never
    sort the candidate stream."""
    if bloom is None or prepartitioned:
        return candidates.join(
            url_seen.select("url_hash").hint("shuffle_hash"),
            "url_hash",
            "left_anti",
        )
    # Persist before splitting: the union of two filters over the same
    # parent would otherwise execute the parent (e.g. the within-wave
    # dedup groupBy) twice.
    flagged = candidates.withColumn(
        "_maybe", might_contain_col(candidates, bloom, "url_hash")
    ).persist()
    new_for_sure = flagged.where(~F.col("_maybe")).drop("_maybe")
    resolved = (
        flagged.where(F.col("_maybe"))
        .drop("_maybe")
        .join(url_seen.select("url_hash"), "url_hash", "left_anti")
    )
    return new_for_sure.unionByName(resolved)
