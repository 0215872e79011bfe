"""As-of join — an operator Spark lacks natively, composed from
built-ins (guide: "bucketize + equi-join, or applyInPandas with
merge_asof"; this uses the third classic form — union + window
last(ignorenulls) — which stays 100% JVM/codegen, one shuffle by key).

Semantics (direction='backward', the market-data default): for each
left row, the right row with the LARGEST right_ts ≤ left_ts within the
same key. Right rows tie-break order: at equal timestamps the right
row sorts BEFORE the left row, so an exactly-simultaneous right match
is visible (matches DuckDB ASOF JOIN with >=).

Scale notes: the union shuffles once on the key; the window sorts
within key partitions. A pathologically hot key is bounded by
time-bucketing (pre-partition both sides by (key, time_bucket) and
carry the previous bucket's last value forward) — not needed until a
single key exceeds task memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on_left: str,
    on_right: str,
    by_left: str,
    by_right: str,
    value_cols: list[str],
) -> DataFrame:
    """Backward as-of join. Returns all left columns plus each right
    ``value_cols`` column (null when no right row precedes).

    The right side should be unique per (key, ts) — pre-aggregate ties
    upstream or the carried value is the max in union order."""
    lcols = left.columns
    l = left.select(
        F.col(by_left).alias("_k"),
        F.col(on_left).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    r = right.select(
        F.col(by_right).alias("_k"),
        F.col(on_right).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    unioned = l.unionByName(r)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in value_cols
        ],
    )
    return filled.where(F.col("_is_left") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"_f_{c}").alias(c) for c in value_cols],
    )
