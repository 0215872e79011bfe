"""2D skyline (Pareto frontier) — non-dominated rows at scale.

A row dominates another when it is >= on the maximized axis, <= on the
minimized axis, and strictly better on at least one. The textbook
formulation is a NOT EXISTS self-join — quadratic, and Spark plans it
as a BroadcastNestedLoopJoin. The 2D case collapses to two HashAggregates
and a window over a DIMENSION-sized frame:

1. Per distinct maximize-value v, the minimum minimize-value mp(v)
   (groupBy — map-side combinable; output is the distinct-value dim,
   not the fact table).
2. A candidate row must achieve p == mp(v) for its v — anything above
   is dominated by the (v, mp(v)) witness at the same v.
3. (v, mp(v)) itself survives iff no strictly-larger v' has
   mp(v') <= mp(v): a running MIN over the dim ordered by v DESC,
   exclusive frame. The window partitions a dimension-sized frame
   (distinct maximize values), not the corpus — no skew, no salt
   needed.
4. Broadcast-join the surviving (v, p) pairs back to the facts; ties
   (multiple rows at the same skyline point) all survive, matching the
   strict-dominance definition.

Corpus use: quality-vs-cost document frontiers (max quality score, min
length/fetch cost), crawl budget allocation (max value, min delay).

Scale note: the window frame is the DISTINCT-maximize-value dim. For a
discrete axis (sizes, integer scores) that is tiny; for a continuous
axis pre-bucket it first (the skyline of bucket minima is a superset
witness set) or the dim degenerates to corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(df: DataFrame, maximize: str, minimize: str) -> DataFrame:
    """All rows of ``df`` not strictly dominated under (maximize ^,
    minimize v). Null rows on either axis are excluded (nulls are
    incomparable). Returns the original columns.

    Plan: 2 HashAggregates + 1 dim window + 1 broadcast semi-join back.
    Never a cartesian/BNLJ; plan-asserted in tests/test_pareto.py.
    """
    facts = df.where(F.col(maximize).isNotNull() & F.col(minimize).isNotNull())
    dim = facts.groupBy(maximize).agg(F.min(minimize).alias("__mp"))
    # running exclusive MIN over strictly-larger maximize values; the
    # frame is empty for the largest v -> NULL -> coalesce to +inf-like
    # behavior via a null-safe comparison
    w = (
        Window.orderBy(F.col(maximize).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sky = dim.withColumn("__best_above", F.min("__mp").over(w)).where(
        F.col("__best_above").isNull() | (F.col("__mp") < F.col("__best_above"))
    )
    keys = [maximize, minimize]
    return facts.join(
        F.broadcast(
            sky.select(F.col(maximize), F.col("__mp").alias(minimize))
        ),
        on=keys,
        how="leftsemi",
    )
