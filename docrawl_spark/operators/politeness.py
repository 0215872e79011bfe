"""Robots gating + politeness-budget selection (SURVEY.md §2.5, §4.2).

The reference has no robots handling and its politeness is the implicit
1-op/sec sequential loop (docrawl_core.py:1088,1105); the north_rule
generalizes both into explicit per-host policy enforced by dataflow:

- robots gate: pure built-in array predicate over the broadcast hosts
  dimension (no UDF);
- per-host top-B selection: SKEW-SAFE two-phase salted window —
  phase 1 ranks within (host, salt) and keeps the per-salt top-B
  (the global per-host top-B is a subset of the union of per-salt
  top-Bs, since dropping a row can only promote others), phase 2
  ranks the ≤ n_salts·B survivors per host exactly. A single hot host
  with 10^8 pending URLs never lands in one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from docrawl_spark.functions.canon import path_of_col

DEFAULT_BUDGET = 2  # unknown-host budget; must match simulator.DEFAULT_BUDGET


def robots_allowed_col(url: Column, robots_blob: Column) -> Column:
    """True iff no non-empty newline-separated Disallow prefix in
    ``robots_blob`` prefixes the url's path. Null/empty blob → allow."""
    prefixes = F.filter(
        F.split(F.coalesce(robots_blob, F.lit("")), "\n"), lambda p: p != ""
    )
    path = path_of_col(url)
    return ~F.exists(prefixes, lambda p: path.startswith(p))


def gate_and_select(
    candidates: DataFrame,
    hosts: DataFrame,
    order_cols: list[str] | None = None,
    n_salts: int = 8,
) -> DataFrame:
    """Candidates (url, host, host_hash, parent_rank, offset, ...) →
    the politeness-selected subset, with per-host budgets and robots
    from the broadcast ``hosts`` dimension.

    ``order_cols`` define the per-host priority (default: discovery
    order (parent_rank, offset), tie-broken by url_hash for totality).
    """
    order_cols = order_cols or ["parent_rank", "offset", "url_hash"]

    dim = hosts.select(
        "host", F.col("budget").alias("_budget"), F.col("robots_blob").alias("_robots")
    )
    joined = candidates.join(F.broadcast(dim), "host", "left").withColumn(
        "_budget", F.coalesce(F.col("_budget"), F.lit(DEFAULT_BUDGET))
    )
    # drop the robots blob BEFORE the windows — it can be KBs per row
    # and would otherwise ride both politeness shuffles
    gated = joined.where(robots_allowed_col(F.col("url"), F.col("_robots"))).drop(
        "_robots"
    )
    return budget_topk(gated, order_cols, n_salts)


def budget_topk(df: DataFrame, order_cols: list[str], n_salts: int) -> DataFrame:
    """The two-phase salted per-host budget selection over any frame
    carrying (host_hash, url_hash, _budget, *order_cols). Shared by
    ``gate_and_select`` (wide rows, fixture scale) and
    ``plans/wave.schedule_candidates`` (payload-skinny rows, the
    at-scale shuffle shape)."""
    ordering = [F.col(c).asc() for c in order_cols]
    # phase 1: per-(host, salt) prefilter — bounds any single window
    # partition to ~1/n_salts of a hot host's rows
    salted = df.withColumn("_salt", F.pmod(F.col("url_hash"), F.lit(n_salts)))
    w1 = Window.partitionBy("host_hash", "_salt").orderBy(*ordering)
    phase1 = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= F.col("_budget"))
        .drop("_rn", "_salt")
    )
    # phase 2: exact per-host top-B over ≤ n_salts·B rows per host
    w2 = Window.partitionBy("host_hash").orderBy(*ordering)
    return (
        phase1.withColumn("_rn", F.row_number().over(w2))
        .where(F.col("_rn") <= F.col("_budget"))
        .drop("_rn", "_budget")
    )
