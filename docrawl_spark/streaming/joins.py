"""Stream-stream interval join — live fetch enrichment with late
robots/policy updates.

The batch engine joins each wave against the robots dim it read at
wave start (plans/wave.py); the streaming formulation has BOTH sides
moving: fetch results arrive continuously AND robots re-fetches
publish new policy snapshots continuously, each on its own event-time
axis with its own lateness. Structured Streaming's watermarked
stream-stream join is the native answer: the join buffers each side's
rows in the state store only as long as the time-bound condition plus
the watermark can still produce a match, so state is bounded by
``lag_s + watermark_s`` of traffic per host — never the full history.

Semantics here: a fetch row matches every robots snapshot for the same
host published in the ``lag_s`` seconds up to and including the fetch
time (the snapshots that could have governed it). Downstream consumers
pick the newest via the packed-BIGINT argmax in a ``foreachBatch``
(chaining another stateful agg after a stream-stream join is legal in
Spark 4 but needs its own watermark plumbing; the per-batch reduce is
the simpler, replayable form).

At 10^10 scale: the join key is the host (state partitioned by it),
both inputs arrive host-hashed from their sources, and the engine
drops buffered rows the moment the other side's watermark passes
``fetch_time - lag_s`` — the state store holds a bounded window per
host, RocksDB-backed like the frontier dedup state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def robots_fetch_interval_join(
    fetches: DataFrame,
    robots: DataFrame,
    lag_s: int = 600,
    watermark_s: int = 120,
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join.

    ``fetches``: streaming (host, url, status, fetched_at:timestamp).
    ``robots``:  streaming (host, robots_sig, published_at:timestamp).
    A pair joins iff same host and ``published_at`` falls in
    ``[fetched_at - lag_s, fetched_at]``. ``how='leftOuter'`` keeps
    policy-less fetches (their robots columns emit null once the
    robots-side watermark proves no match can arrive — outer results
    are inherently watermark-delayed).

    Output adds ``robots_age_s`` (fetch time minus snapshot time, 0 =
    same instant) for downstream newest-wins reduction."""
    f = fetches.withWatermark("fetched_at", f"{watermark_s} seconds")
    r = (
        robots.withWatermark("published_at", f"{watermark_s} seconds")
        .select(
            F.col("host").alias("r_host"),
            "robots_sig",
            "published_at",
        )
    )
    cond = (
        (F.col("host") == F.col("r_host"))
        & (F.col("published_at") <= F.col("fetched_at"))
        & (
            F.col("published_at")
            >= F.col("fetched_at") - F.expr(f"INTERVAL {int(lag_s)} SECONDS")
        )
    )
    joined = f.join(r, cond, how)
    return joined.select(
        "host",
        "url",
        "status",
        "fetched_at",
        "robots_sig",
        "published_at",
        (
            F.unix_timestamp("fetched_at")
            - F.unix_timestamp("published_at")
        )
        .cast("long")
        .alias("robots_age_s"),
    )


def newest_robots_per_fetch(batch_df: DataFrame) -> DataFrame:
    """The per-micro-batch newest-wins reduce for
    robots_fetch_interval_join output (run inside ``foreachBatch``):
    among a fetch's matched snapshots keep the newest (smallest
    ``robots_age_s``), ties broken deterministically by a 40-bit
    signature hash (stable across runs). Packed-BIGINT min — one
    HashAggregate, no struct-min SortAggregate demotion (CLAUDE.md):
    age (< 1e6 s by the join's lag bound) packs above the hash slot;
    the argmin's sig rides along via a second-pass join on the packed
    winner. leftOuter no-match rows (null robots) pass through via
    null-safe equality on the null pack. A final min(robots_sig)
    re-aggregate guarantees ONE row per fetch even when two distinct
    sigs tie on age and collide in the 40-bit hash slot (or a batch
    carries exact-duplicate join rows)."""
    keyed = batch_df.withColumn(
        "_pack",
        F.col("robots_age_s") * F.lit(1 << 40)
        + F.coalesce(
            F.expr("conv(substr(md5(robots_sig), 1, 10), 16, 10)").cast(
                "long"
            ),
            F.lit(0),
        ),
    )
    best = keyed.groupBy("host", "url", "fetched_at").agg(
        F.min("_pack").alias("_best")
    )
    from pyspark.sql import Window

    wr = Window.partitionBy("host", "url", "fetched_at").orderBy(
        F.col("_pack").asc_nulls_first(),
        F.col("robots_sig").asc_nulls_first(),
        F.col("published_at").asc_nulls_first(),
    )
    return (
        keyed.join(best, ["host", "url", "fetched_at"])
        .where(F.col("_pack").eqNullSafe(F.col("_best")))
        .withColumn("_rn", F.row_number().over(wr))
        .where(F.col("_rn") == 1)
        .select(
            "host",
            "url",
            "status",
            "fetched_at",
            "robots_sig",
            "published_at",
            "robots_age_s",
        )
    )
