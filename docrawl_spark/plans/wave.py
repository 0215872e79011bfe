"""Wave scheduling with payload-skinny shuffles.

The politeness windows and the global-rank exchange do not need the
string payload (url ~50 B, host ~15 B, discovered_by ~40 B per row) —
they key on hashes and order on numbers. At a 10^8-candidate wave,
shipping strings through all three exchanges is 4-5x the bytes of the
skinny columns, and shuffle bandwidth is THE scaling bottleneck of the
wave (measured: the string-wide pipeline saturates a single box's
memory bus at ~500k urls/s regardless of core count — BENCH.md).

``schedule_candidates`` therefore:

1. robots-gates the candidates against the broadcast hosts dim (a
   broadcast join + filter — no shuffle, and the KB-scale robots blob
   never rides an exchange);
2. projects the survivors to the skinny schedule columns
   (url_hash, host_hash, order columns, budget — ~32 B/row);
3. runs the two-phase salted budget windows (operators/politeness) and
   the scalable global rank (operators/ranking) over the skinny rows;
4. rejoins the ≤ Σ budgets selected rows back to the wide payload by
   url_hash — ONE join instead of three string-wide exchanges. AQE
   turns it into a broadcast join whenever the selected set fits.

Identical results to gate_and_select + with_global_rank over wide rows
(the crawl-equality suite pins this: run_crawl routes through here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from docrawl_spark.operators.politeness import (
    DEFAULT_BUDGET,
    budget_topk,
    robots_allowed_col,
)
from docrawl_spark.operators.ranking import with_global_rank


def schedule_candidates(
    candidates: DataFrame,
    hosts: DataFrame,
    n_salts: int = 8,
    order_cols: list[str] | None = None,
    rank_col: str = "_wave_rank",
    rank_start: int = 0,
    persist_wide: bool = True,
    broadcast_result: bool = True,
    seen: DataFrame | None = None,
    bloom: bytes | None = None,
    host_priority: DataFrame | None = None,
    persist_tracker: list | None = None,
) -> DataFrame:
    """candidates (unique by url_hash, post within-wave dedup) →
    robots-allowed, per-host-budget-selected rows with a deterministic
    dense global ``rank_col``, payload columns intact.

    ``persist_wide``: cache the candidate payload between the skinny
    projection and the final rejoin. Pass False when ``candidates`` is
    already storage-backed (run_crawl reads it from the warehouse's
    frontier_pending parquet) — a second scan is cheaper than a cache
    build. ``broadcast_result``: hint the ≤ Σ budgets ranked skinny
    side into a broadcast so the wide payload streams through ONE
    BroadcastHashJoin with no sort and no exchange; turn off only when
    the selected set (Σ per-host budgets) is too big to broadcast —
    then it degrades to a url_hash shuffle join, still one wide
    exchange instead of three.

    ``host_priority``: optional (host, priority) frame — e.g.
    ``datapipe.graph.pagerank_hosts`` output renamed to ``priority`` —
    that reorders the GLOBAL visit rank so higher-priority hosts'
    selected urls crawl first. Per-host budget selection is unaffected
    (priority is constant within a host), so politeness semantics and
    the selected SET are identical; only inter-host ordering changes.
    Joined broadcast on host_hash (stays skinny); hosts absent from the
    frame get priority 0. Default None = the reference-equality order
    (crawl-equality suite pins it)."""
    order_cols = order_cols or ["parent_rank", "offset", "url_hash"]
    wide = candidates.persist() if persist_wide else candidates
    dim = hosts.select(
        "host", F.col("budget").alias("_budget"), F.col("robots_blob").alias("_robots")
    )
    gated = (
        wide.join(F.broadcast(dim), "host", "left")
        .withColumn("_budget", F.coalesce(F.col("_budget"), F.lit(DEFAULT_BUDGET)))
        .where(robots_allowed_col(F.col("url"), F.col("_robots")))
    )
    skinny_cols = list(dict.fromkeys(["url_hash", "host_hash", "_budget", *order_cols]))
    skinny = gated.select(*skinny_cols)
    if seen is not None:
        # seen-set dedup on the SKINNY rows (8 B hashes through the
        # Bloom probe and the anti-join exchange, not ~150 B strings);
        # already-seen rows left in the wide payload are dropped by the
        # final inner rejoin. Robots-gate/anti-join commute (both are
        # filters), so results are identical to anti-joining first.
        from docrawl_spark.operators.dedup import anti_join_seen

        skinny = anti_join_seen(skinny, seen, bloom)
    rank_order = order_cols
    if host_priority is not None:
        from docrawl_spark.functions.canon import url_hash_col

        # micro-unit scaling BEFORE the long cast: sitemap-style
        # fractional priorities (0.0-1.0 doubles) would otherwise all
        # truncate to 0 and the feature would silently no-op
        prio = host_priority.select(
            url_hash_col("host").alias("host_hash"),
            (F.col("priority") * 1_000_000).cast("long").alias("_hp"),
        )
        skinny = (
            skinny.join(F.broadcast(prio), "host_hash", "left")
            .withColumn("_prio", -F.coalesce(F.col("_hp"), F.lit(0)))
            .drop("_hp")
        )
        rank_order = ["_prio", *order_cols]
    if persist_wide and persist_tracker is not None:
        persist_tracker.append(wide)
    selected = budget_topk(skinny, order_cols, n_salts)
    ranked = with_global_rank(
        selected,
        rank_order,
        rank_col=rank_col,
        start=rank_start,
        persist_tracker=persist_tracker,
    )
    keys = ranked.select("url_hash", rank_col)
    if broadcast_result:
        keys = F.broadcast(keys)
    out = wide.join(keys, "url_hash")
    # Precise cache cleanup: every frame this call persisted (the wide
    # payload and the ranking operator's internal cache) lands in
    # ``persist_tracker`` — unpersist them AFTER materializing the
    # result, never a scorched-earth clearCache(). The legacy
    # ``_wave_persisted`` attribute remains for callers that consume
    # the result directly, but it is a plain Python attribute: it is
    # LOST on any further DataFrame transformation — prefer the
    # tracker.
    out._wave_persisted = wide if persist_wide else None
    return out
