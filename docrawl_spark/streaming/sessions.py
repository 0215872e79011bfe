"""Gap-based sessionization — `F.session_window` in one code path for
batch AND Structured Streaming.

The crawl engine's event stream (fetch log, page events) needs
session-level rollups: a "session" is a maximal run of events for one
key with no inter-event gap STRICTLY greater than the timeout (an
event at exactly last+gap merges — touching windows coalesce; pinned
by tests and mirrored in the DuckDB oracle's islands CTE). Spark's native `session_window` is the
right operator — in batch it compiles to a plain aggregation over a
derived window struct; under `readStream` the SAME expression becomes
a stateful streaming aggregation whose state eviction is driven by the
watermark (late events merge into or extend sessions until the
watermark passes session_end + gap). One definition, two execution
modes — the Spark-first replacement for hand-rolled stateful loops.

Scale shape: one shuffle on the session key; merging overlapping
windows is done by the native operator inside the aggregation — no
window-function over the full stream, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap: str = "30 minutes",
    aggs: list[Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Per-(key, session) rollup: session_start / session_end (end =
    last event + gap, Spark's native convention) + `aggs` (default:
    n_events). Pass ``watermark`` (e.g. "1 hour") when ``events`` is a
    streaming DataFrame — required for state cleanup; ignored-free in
    batch where it's simply not applied."""
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    agg_list = aggs or [F.count("*").alias("n_events")]
    agged = df.groupBy(
        F.session_window(F.col(ts_col), gap).alias("session"), *key_cols
    ).agg(*agg_list)
    # agg output layout is [session, *key_cols, *agg_outputs] — read the
    # aggregate names off the frame instead of parsing Column reprs
    agg_names = agged.columns[1 + len(key_cols):]
    return agged.select(
        *key_cols,
        F.col("session.start").alias("session_start"),
        F.col("session.end").alias("session_end"),
        *[F.col(c) for c in agg_names],
    )
