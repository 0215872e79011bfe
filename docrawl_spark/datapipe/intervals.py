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

from pyspark.sql import DataFrame, Window
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
    keys: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Inner-join ``left`` x ``right`` on closed-interval overlap
    (l_start <= r_end AND r_start <= l_end), each overlapping pair
    emitted exactly once. Column names must be disjoint between the two
    frames (rename before calling). Returns left columns then right
    columns; the bucket/bookkeeping columns are dropped.

    ``keys`` adds equi-join key pairs ``(left_col, right_col)`` on top
    of the time bucket — the per-entity temporal join (host AS-OF a
    versioned dimension): the shuffle key becomes (entity, bucket), so
    a hot time bucket still spreads across entities.

    Plan shape: explode (per-row fan-out len/width + 1) -> one equi
    shuffle on the (keys..., bucket) composite -> residual overlap
    filter. Never a cartesian; plan-asserted in tests/test_intervals.py.
    """
    overlap_names = set(left.columns) & set(right.columns)
    if overlap_names:
        raise ValueError(f"column names must be disjoint: {sorted(overlap_names)}")
    lb = _bucketed(left, left_start, left_end, bucket_width, "l")
    rb = _bucketed(right, right_start, right_end, bucket_width, "r")
    ls, le = F.col(left_start).cast("long"), F.col(left_end).cast("long")
    rs, re_ = F.col(right_start).cast("long"), F.col(right_end).cast("long")
    cond = F.col(f"{_B}_l") == F.col(f"{_B}_r")
    lb = lb.withColumnRenamed(_B, f"{_B}_l")
    rb = rb.withColumnRenamed(_B, f"{_B}_r")
    for lk, rk in keys or []:
        cond = cond & (F.col(lk) == F.col(rk))
    joined = lb.join(rb, on=cond, how="inner").where(
        (ls <= re_)
        & (rs <= le)
        # first common bucket only: exactly-once without a distinct
        & (
            F.col(f"{_B}_l")
            == F.greatest(F.col("__first_l"), F.col("__first_r"))
        )
    )
    return joined.select(*left.columns, *right.columns)


def scd2_intervals(
    df: DataFrame, key_col: str, tick_col: str, attr_col: str
) -> DataFrame:
    """Slowly-changing-dimension (SCD Type 2) interval build — the
    classic gaps-and-islands collapse: per ``key_col``, observations
    ordered by ``tick_col`` are grouped into maximal runs of identical
    ``attr_col`` values, and each run becomes one versioned validity
    row (valid_from, valid_to, version, n_obs, is_current). This is
    how a crawl turns per-wave host observations (status class, robots
    signature, mirror target ...) into a warehouse dimension that
    history queries can join AS OF any tick.

    Semantics: runs are over the OBSERVATION sequence, not the
    calendar — a gap in ticks does not close a run unless the value
    changed when observation resumed. NULL attrs are real values (a
    host that stopped reporting is a state): run comparison uses
    null-safe equality. ``version`` is 1-based per key in tick order;
    ``is_current`` marks the run containing the key's newest tick.

    Cross-engine note (CLAUDE.md): the change flag uses lag() and the
    run id a running SUM over it — DuckDB forbids nesting the lag
    inside the window SUM, so both engines materialize the lag in its
    own select before the running sum.

    Scale shape: two windows over (key × that key's own ticks) — the
    per-key observation count bounds the window, never the corpus —
    then one HashAggregate onto (key, run). A key with 10^5 snapshots
    is one task's window; per-host wave observations are years of
    dailies at worst. Output is dim-sized (runs ≤ observations)."""
    w = Window.partitionBy("k").orderBy("t")
    obs = df.select(
        F.col(key_col).alias("k"),
        F.col(tick_col).alias("t"),
        F.col(attr_col).alias("a"),
    )
    lagged = obs.select(
        "k", "t", "a", F.lag("a").over(w).alias("prev_a"),
        F.row_number().over(w).alias("rn"),
    )
    flagged = lagged.select(
        "k",
        "t",
        "a",
        F.when(
            (F.col("rn") == 1) | ~F.col("a").eqNullSafe(F.col("prev_a")), 1
        )
        .otherwise(0)
        .alias("chg"),
    )
    runs = flagged.select(
        "k",
        "t",
        "a",
        F.sum("chg")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("version"),
    )
    per_run = runs.groupBy("k", "version", "a").agg(
        F.min("t").alias("valid_from"),
        F.max("t").alias("valid_to"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    newest = per_run.groupBy("k").agg(F.max("valid_to").alias("max_to"))
    return (
        per_run.join(F.broadcast(newest), "k")
        .select(
            F.col("k").alias(key_col),
            F.col("version").cast("long").alias("version"),
            F.col("a").alias(attr_col),
            F.col("valid_from").cast("long").alias("valid_from"),
            F.col("valid_to").cast("long").alias("valid_to"),
            F.col("n_obs").cast("long").alias("n_obs"),
            (F.col("valid_to") == F.col("max_to"))
            .cast("int")
            .alias("is_current"),
        )
    )
