"""Bucketized interval-overlap join — the scale-safe range join.

Spark has no native range-join optimizer rule (that is a Databricks
runtime extension); a naive ``a.join(b, overlap_predicate)`` compiles to
BroadcastNestedLoopJoin or CartesianProduct — O(|A|x|B|) and a
guaranteed 100 TB killer. The standard decomposition: chop the number
line into fixed-width buckets, explode every interval into the buckets
it spans, and equi-join on the bucket id. The overlap predicate then
only runs on bucket-colliding pairs, and Catalyst plans a plain
shuffled/broadcast hash join on the bucket key.

Exactly-once without a distinct: a pair of overlapping intervals
collides in EVERY shared bucket, so the naive form needs a dedup
shuffle afterwards. Instead each pair is emitted only in its FIRST
common bucket — ``bucket == greatest(floor(l_start/w), floor(r_start/w))``
— which every overlapping pair shares exactly once (the later-starting
interval's first bucket). No distinct, no extra exchange.

Units are caller-defined non-negative integers (epoch days, epoch
seconds, ...). Non-negativity matters: the bucket id uses BIGINT ``div``
(truncating), which equals floor only for non-negative operands — shift
the domain first if it can go negative. Intervals are CLOSED on both
ends; rows with end < start are dropped (``sequence(s, e)`` DESCENDS
when e < s — see CLAUDE.md).

Bucket width is the scale knob: too narrow explodes long intervals into
many rows; too wide makes buckets hot. Pick ~ the median interval
length so the per-row fan-out stays O(1-3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = "__ovl_bucket"


def _bucketed(
    df: DataFrame, start: str, end: str, width: int, side: str
) -> DataFrame:
    """Explode one side into (row, bucket) pairs; keeps a per-side copy
    of the first-bucket id so the join can pick the pair's first common
    bucket without re-deriving it from the (renamed) start column."""
    if width <= 0:
        raise ValueError(f"bucket width must be positive, got {width}")
    s = F.col(start).cast("long")
    e = F.col(end).cast("long")
    first = F.expr(f"CAST({start} AS BIGINT) div {width}")
    last = F.expr(f"CAST({end} AS BIGINT) div {width}")
    return (
        df.where(e >= s)  # guard: sequence() descends on empty intervals
        .withColumn(f"__first_{side}", first)
        .withColumn(_B, F.explode(F.sequence(first, last)))
    )


def overlap_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: int,
) -> DataFrame:
    """Inner-join ``left`` x ``right`` on closed-interval overlap
    (l_start <= r_end AND r_start <= l_end), each overlapping pair
    emitted exactly once. Column names must be disjoint between the two
    frames (rename before calling). Returns left columns then right
    columns; the bucket/bookkeeping columns are dropped.

    Plan shape: explode (per-row fan-out len/width + 1) -> one equi
    shuffle on the bucket id -> residual overlap filter. Never a
    cartesian; plan-asserted in tests/test_intervals.py.
    """
    overlap_names = set(left.columns) & set(right.columns)
    if overlap_names:
        raise ValueError(f"column names must be disjoint: {sorted(overlap_names)}")
    lb = _bucketed(left, left_start, left_end, bucket_width, "l")
    rb = _bucketed(right, right_start, right_end, bucket_width, "r")
    ls, le = F.col(left_start).cast("long"), F.col(left_end).cast("long")
    rs, re_ = F.col(right_start).cast("long"), F.col(right_end).cast("long")
    joined = lb.join(rb, on=_B, how="inner").where(
        (ls <= re_)
        & (rs <= le)
        # first common bucket only: exactly-once without a distinct
        & (F.col(_B) == F.greatest(F.col("__first_l"), F.col("__first_r")))
    )
    return joined.select(*left.columns, *right.columns)
