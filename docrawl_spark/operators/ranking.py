"""Deterministic total-order global ranking without a single-partition
window.

``row_number().over(Window.orderBy(...))`` collapses to ONE partition —
fine at toy scale, a non-starter on a 10^10-row frontier. This operator
computes the same dense 0-based rank scalably:

1. range-repartition + sort on the order columns (Spark's distributed
   sort; the same machinery as orderBy);
2. per-partition local row_number (window partitioned by partition id —
   parallel);
3. per-partition counts → driver (one tiny row per partition) →
   cumulative offsets broadcast back;
4. rank = partition offset + local row_number.

Deterministic as long as the order columns form a total order (callers
must include a unique tiebreaker, e.g. url_hash)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    start: int = 0,
    num_partitions: int | None = None,
    persist_tracker: list | None = None,
) -> DataFrame:
    """Append ``rank_col`` = dense global 0-based position of each row in
    the total order of ``order_cols`` (+ ``start``).

    ``persist_tracker``: optional list the operator appends its
    internal persisted frame to (the range-partitioned copy the result
    rides on). Callers that materialize the result elsewhere (e.g. a
    warehouse commit) should then ``unpersist()`` each tracked frame —
    precise cache cleanup instead of a session-global clearCache()."""
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # Persist the input FIRST: repartitionByRange runs a sampling job to
    # pick range boundaries, and without a cache that sampling pass
    # re-executes the entire upstream plan (e.g. the politeness windows)
    # a second time.
    df = df.persist()
    ordered = df.repartitionByRange(parts, *[F.col(c) for c in order_cols])
    local = ordered.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_lrn",
        F.row_number().over(
            Window.partitionBy("_pid").orderBy(*[F.col(c).asc() for c in order_cols])
        ),
    )
    # Persist before the counts action: repartitionByRange samples to
    # pick boundaries, so an uncached recompute could re-sample and
    # disagree with the collected counts. (MEMORY_AND_DISK — safe under
    # memory pressure.)
    local = local.persist()
    if persist_tracker is not None:
        persist_tracker.append(local)
    counts = (
        local.groupBy("_pid").count().orderBy("_pid").collect()
    )  # one row per partition — tiny; also materializes `local`
    df.unpersist()  # the range-partitioned copy supersedes the input cache
    offsets: dict[int, int] = {}
    acc = start
    for r in counts:
        offsets[r["_pid"]] = acc
        acc += r["count"]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _off long"
    )
    out = (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(rank_col, (F.col("_off") + F.col("_lrn") - 1).cast("long"))
        .drop("_pid", "_lrn", "_off")
    )
    return out
