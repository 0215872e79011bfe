"""Frontier fairness metrics: how evenly is scheduled crawl load spread
across hosts?

A politeness-correct scheduler can still be *unfair* — a frontier where
1% of hosts hold 90% of scheduled URLs starves the tail and concentrates
fetch failures. The standard scalar is the Gini coefficient over
per-host scheduled counts; alongside it the top-decile share is the
operational "how hot is the head" number.

Float-free spec (so the DuckDB oracle matches bit-for-bit):

- x_i = per-host count, ranked ascending with host as tiebreaker,
  i = 1..n (the rank comes from ``with_global_rank`` — NO
  single-partition window);
- T = Σ x_i, S = Σ i·x_i;
- gini_ppm = floor(10^6 · (2S − (n+1)·T) / (n·T))
  — computed as num div (den div 10^6) when den ≥ 10^12 (keeps every
  intermediate ≤ ~10^18 at frontier scale: S ≤ n·T) else
  (num·10^6) div den (exact at small scale); identical CASE in the
  oracle;
- top_decile_share_ppm = floor(10^6 · Σ_{i > n−k} x_i / T),
  k = max(1, n div 10).

Scale shape: one groupBy(host), the scalable range-partitioned rank,
then single-row aggregates. Counts and ranks are exact BIGINTs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from docrawl_spark.operators.ranking import with_global_rank


def host_load_gini(
    df: DataFrame, host_col: str = "host", weight: Column | None = None
) -> DataFrame:
    """One-row fairness summary over per-host load: (n_hosts, total,
    gini_ppm, top_decile_share_ppm)."""
    w = weight if weight is not None else F.lit(1).cast("long")
    counts = df.groupBy(F.col(host_col).alias("host")).agg(
        F.sum(w).cast("long").alias("x")
    )
    ranked = with_global_rank(counts, ["x", "host"], rank_col="i", start=1)
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("t"),
        F.sum(F.col("i") * F.col("x")).alias("s"),
    )
    top = (
        ranked.crossJoin(
            F.broadcast(agg.select(F.col("n").alias("_n")))
        )
        .where(F.col("i") > F.col("_n") - F.greatest(F.lit(1), F.expr("_n div 10")))
        .agg(F.sum("x").alias("top_x"))
    )
    return agg.crossJoin(F.broadcast(top)).select(
        F.col("n").alias("n_hosts"),
        F.col("t").alias("total"),
        F.expr(
            "CASE WHEN n * t >= 1000000000000 "
            "THEN (2*s - (n+1)*t) div ((n * t) div 1000000) "
            "ELSE ((2*s - (n+1)*t) * 1000000) div (n * t) END"
        ).cast("long").alias("gini_ppm"),
        F.expr("(top_x * 1000000) div t").cast("long").alias(
            "top_decile_share_ppm"
        ),
    )


def waterfill_budgets(
    df: DataFrame,
    budget: int,
    demand_col: str = "demand",
    host_col: str = "host",
) -> DataFrame:
    """Max-min fair (water-filling) split of a global fetch budget
    across hosts: every host gets min(demand, level) URLs, where the
    water level is the largest integer t with Σ min(d_i, t) ≤ budget;
    the sub-level remainder goes +1 each to the first clipped hosts in
    (demand, host) order. Exact integer spec (oracle-reproducible):

    - rank hosts ascending by (demand, host), k = 1..n; P(k) =
      inclusive demand prefix sum (both from ``with_global_prefix_sum``
      — NO single-partition window);
    - if Σd ≤ budget: quota = demand (budget is not binding);
    - else k* = max{k : P(k) + d_k·(n−k) ≤ budget} (0 if none),
      t = (budget − P(k*)) div (n − k*),
      r = budget − P(k*) − t·(n − k*)  (0 ≤ r < n − k*);
      quota = d_k for k ≤ k*, t+1 for the next r hosts, t after —
      Σ quota = budget exactly, and t+1 ≤ every clipped demand (else
      k* was not maximal).

    Scale shape: one distributed range sort over the HOST DIM (never
    the frontier), two single-row aggregates broadcast back. The output
    feeds the per-host politeness top-k as its cap.
    """
    from docrawl_spark.operators.ranking import with_global_prefix_sum

    base = df.select(
        F.col(host_col).alias("host"), F.col(demand_col).cast("long").alias("d")
    )
    ranked = with_global_prefix_sum(
        base, ["d", "host"], "d", rank_col="k", prefix_col="pfx"
    )
    tot = ranked.agg(F.count("*").alias("n"), F.sum("d").alias("total"))
    feas = (
        ranked.crossJoin(F.broadcast(tot))
        .where(F.col("pfx") + F.col("d") * (F.col("n") - F.col("k")) <= budget)
        .agg(
            F.coalesce(F.max("k"), F.lit(0)).alias("kstar"),
            F.coalesce(F.expr("max_by(pfx, k)"), F.lit(0)).alias("pstar"),
        )
    )
    scal = tot.crossJoin(feas).select(
        "n",
        "total",
        "kstar",
        "pstar",
        F.when(
            F.col("total") > budget,
            F.expr(f"({budget}L - pstar) div (n - kstar)"),
        ).alias("lvl"),
        F.when(
            F.col("total") > budget,
            F.expr(f"{budget}L - pstar - (({budget}L - pstar) div (n - kstar)) * (n - kstar)"),
        ).alias("rem"),
    )
    return ranked.crossJoin(F.broadcast(scal)).select(
        "host",
        F.col("d").alias("demand"),
        F.when(F.col("total") <= budget, F.col("d"))
        .when(F.col("k") <= F.col("kstar"), F.col("d"))
        .when(F.col("k") <= F.col("kstar") + F.col("rem"), F.col("lvl") + 1)
        .otherwise(F.col("lvl"))
        .cast("long")
        .alias("quota"),
    )


def ucb_host_allocation(
    host_stats: DataFrame,
    host_col: str = "host",
    fetches_col: str = "n_fetches",
    useful_col: str = "n_useful",
) -> DataFrame:
    """UCB1-style explore/exploit scores for adaptive crawl allocation:
    hosts that have yielded well get budget (exploit), hosts barely
    sampled get budget too (explore) — the bandit view of frontier
    allocation (Auer et al. 2002 applied to crawl scheduling).

    Float-free spec (every term reproducible bit-for-bit in DuckDB):

    - ``yield_ppm  = n_useful · 10^6 div n_fetches``  (the mean term)
    - ``bonus_ppm  = floor(sqrt(2 · bitlen(N) · 10^12 div n_fetches))``
      where N = Σ n_fetches and bitlen is the shared length(bin())
      integer log2 — UCB1's sqrt(2 ln N / n_i) with ln→bit-length;
      the sqrt argument stays < 2^52, where IEEE-double sqrt is
      correctly rounded, so floor(sqrt(·)) is deterministic in both
      engines;
    - ``ucb_ppm = yield_ppm + bonus_ppm`` — an unexplored host's
      bonus (~10^6+ ppm at any real N) dominates any yield, exactly
      the UCB property.

    Output: ``(host, n_fetches, yield_ppm, bonus_ppm, ucb_ppm)``;
    rows with ``n_fetches <= 0`` are rejected (a never-fetched host
    belongs in the frontier's fresh queue, not the bandit).

    Scale shape: one single-row total (broadcast crossJoin) + per-row
    exprs on the host dim; ranking/selection is the caller's
    TakeOrdered.
    """
    h = host_stats.select(
        F.col(host_col).alias("host"),
        F.col(fetches_col).cast("long").alias("n_fetches"),
        F.col(useful_col).cast("long").alias("n_useful"),
    ).where(F.col("n_fetches") > 0)
    tot = h.agg(F.sum("n_fetches").alias("_N"))
    j = h.crossJoin(F.broadcast(tot))
    yield_ppm = F.expr("n_useful * 1000000L div n_fetches")
    bonus_ppm = F.floor(
        F.sqrt(
            F.expr(
                "CAST(2L * length(bin(_N)) * 1000000000000L div n_fetches"
                " AS DOUBLE)"
            )
        )
    ).cast("long")
    return j.select(
        "host",
        "n_fetches",
        yield_ppm.alias("yield_ppm"),
        bonus_ppm.alias("bonus_ppm"),
        (yield_ppm + bonus_ppm).alias("ucb_ppm"),
    )
