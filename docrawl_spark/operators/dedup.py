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
) -> DataFrame:
    """Rows of ``candidates`` whose url_hash is not in ``url_seen``."""
    if bloom is None:
        return candidates.join(url_seen.select("url_hash"), "url_hash", "left_anti")
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
