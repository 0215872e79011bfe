"""Streaming windowed sketches — live distinct counts (HLL) and
heavy-hitter frequencies (count-min), both as bounded-state windowed
aggregates.

The streaming twin of ``functions/sketches``: per-event-time-window
distinct counts (users, URLs, hosts) as a continuously-maintained HLL
register table. Distinct counting is exactly the aggregate Structured
Streaming cannot do natively under watermark eviction
(``dropDuplicates`` state grows with the key universe; ``approx_count_
distinct`` is not supported on streams with update semantics across
batches) — but the REGISTER TABLE is a plain windowed MAX aggregate:
bounded state (m rows per open window), map-side combinable, late
events within the watermark fold in with a register MAX exactly like
on-time ones, and the same arithmetic as the batch sketches so a batch
backfill and the live stream produce bit-identical registers.

Usage: ``streaming_hll_registers(stream)`` → sink the register rows
(update mode); read the estimate off the stored registers with
``functions/sketches.hll_estimate_grouped(reg, ["win_start"])`` —
estimation is a batch-side fold over ≤ m rows per window, not stream
state. Works on batch frames too (watermark is skipped), which is the
parity-test path: stream registers == batch registers on the same
rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from docrawl_spark.functions.sketches import _HASH_BITS, _hash60, _hash60_sql


def streaming_hll_registers(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_dur: str = "1 hour",
    watermark: str = "2 hours",
    p: int = 6,
) -> DataFrame:
    """Per-(event-time window, bucket) HLL register stream.

    State is bounded: m = 2^p rows per open window, evicted when the
    watermark passes the window end. The register construction is
    byte-identical to ``sketches.hll_registers_grouped`` (same 60-bit
    md5 slice, same rho), so live windows and batch backfills merge by
    plain (window, bucket) MAX.
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    m = 1 << p
    h = _hash60(F.col(key_col).cast("string"))
    rest = F.expr(f"CAST({_hash60_sql(key_col)} AS BIGINT) div {m}")
    width = _HASH_BITS - p
    rho = F.when(rest == 0, F.lit(width + 1)).otherwise(
        F.lit(width) - F.length(F.bin(rest)) + F.lit(1)
    )
    return (
        df.select(
            F.window(F.col(ts_col), window_dur).alias("win"),
            (h % F.lit(m)).alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy("win", "bucket")
        .agg(F.max("rho").alias("max_rho"))
        .select(
            F.col("win.start").alias("win_start"),
            "bucket",
            "max_rho",
        )
    )


def streaming_cms_counters(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "host",
    window_dur: str = "1 hour",
    watermark: str = "2 hours",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Per-(event-time window, row, cell) count-min counter stream —
    live "hot hosts this hour" without per-key state: the state bound
    is d*w cells per open window no matter how many distinct keys
    arrive, and counters ADD across late/on-time rows and across a
    batch backfill (same cell hash as ``sketches.cms_counters``).
    Point-query the stored counters with ``sketches.cms_estimate``
    filtered to one window (min-over-rows upper bound).
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    rows = F.array(*[F.lit(i) for i in range(depth)])
    keyed = df.select(
        F.window(F.col(ts_col), window_dur).alias("win"),
        F.col(key_col).cast("string").alias("k"),
        F.explode(rows).alias("row"),
    )
    cell = (
        _hash60(F.concat_ws("|", F.col("row").cast("string"), F.col("k")))
        % F.lit(width)
    )
    return (
        keyed.select("win", "row", cell.alias("cell"))
        .groupBy("win", "row", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("win.start").alias("win_start"), "row", "cell", "cnt"
        )
    )
