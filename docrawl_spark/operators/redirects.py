"""Redirect-chain resolution: follow 3xx ``Location`` edges to each
URL's final destination with a bounded hop budget, detecting cycles —
as a LOG-DOUBLING (pointer-jumping) DataFrame pipeline, not a per-row
walk.

The reference follows redirects implicitly: Selenium's driver.get()
lands on the final URL and `get_current_url` reads it back
(`/root/reference/docrawl/docrawl_core.py` load_website →
driver.current_url). In a batch crawler the redirect map is DATA — a
(src_url, dst_url) edge table accumulated from fetch responses — and
resolution must happen before frontier dedup, or every hop of a
redirect chain occupies its own seen-set slot and the canonical page is
crawled under k different names.

Semantics (HTTP-client equivalent, e.g. curl --max-redirs):

- a URL with no outgoing edge is **direct** (0 hops);
- otherwise follow edges until a terminal node: **redirected**, with
  the exact hop count, if reached within ``max_hops``;
- chains longer than ``max_hops`` — including all cycles, which never
  terminate — are **too_many** (the client would abort); their
  ``final_url`` is pinned to the ORIGIN so downstream stages treat the
  row as unresolvable rather than adopting a mid-cycle URL.

Scale shape: the naive walk is ``max_hops`` sequential self-joins of
the frontier against the edge table. Pointer jumping instead composes
the edge map with itself — after round i each row maps src to the node
min(2^i, chain_len) hops away — so ceil(log2(max_hops+1)) joins of the
*edge table with itself* (redirect edges are a tiny fraction of the
frontier: typically ~1-5% of URLs redirect) followed by ONE join of the
frontier against the composed map. Hop counts saturate at
``max_hops + 1`` so cycle rows can't loop the join forever; each round
keeps exactly one row per src, so the composed map never grows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compose_redirect_map(edges: DataFrame, max_hops: int = 8) -> DataFrame:
    """Close the redirect edge map under pointer jumping: returns one
    row per redirect source — (src, final, hops) where ``final`` is the
    node reached after following edges until a terminal node or until
    the hop counter saturates at ``max_hops + 1`` (cycle / over-long
    chain sentinel).

    ``edges`` must have columns (src, dst); duplicate srcs are resolved
    keep-min-dst for determinism (a well-formed fetch log has one
    Location per URL)."""
    cap = max_hops + 1
    jump = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("final"))
        .withColumn("hops", F.lit(1).cast("long"))
    )
    rounds = max(1, math.ceil(math.log2(cap)))
    for i in range(rounds):
        nxt = jump.select(
            F.col("src").alias("_j_src"),
            F.col("final").alias("_j_final"),
            F.col("hops").alias("_j_hops"),
        )
        jump = (
            jump.join(nxt, jump["final"] == nxt["_j_src"], "left")
            .select(
                "src",
                F.coalesce(F.col("_j_final"), F.col("final")).alias("final"),
                F.least(
                    F.col("hops") + F.coalesce(F.col("_j_hops"), F.lit(0)),
                    F.lit(cap).cast("long"),
                ).alias("hops"),
            )
        )
        # each round doubles reach; localCheckpoint would be overkill
        # for <= 4 rounds of a small dim table, but cut lineage once at
        # the end if the map is reused across many waves (caller's call)
    return jump


def resolve_redirects(
    candidates: DataFrame,
    edges: DataFrame,
    url_col: str = "url",
    max_hops: int = 8,
) -> DataFrame:
    """Annotate a candidate frame with (final_url, n_hops, status):
    status ∈ {'direct', 'redirected', 'too_many'} per the module
    contract. One broadcast-eligible join of the frontier against the
    composed map (the map is per-redirect-source, small next to the
    frontier; Catalyst/AQE picks broadcast when it fits)."""
    jump = compose_redirect_map(edges, max_hops)
    m = jump.select(
        F.col("src").alias("_r_src"),
        F.col("final").alias("_r_final"),
        F.col("hops").alias("_r_hops"),
    )
    out = candidates.join(m, candidates[url_col] == m["_r_src"], "left")
    too_many = F.col("_r_hops") > F.lit(max_hops)
    return (
        out.withColumn(
            "status",
            F.when(F.col("_r_src").isNull(), F.lit("direct"))
            .when(too_many, F.lit("too_many"))
            .otherwise(F.lit("redirected")),
        )
        .withColumn(
            "final_url",
            F.when(
                F.col("_r_src").isNull() | too_many, F.col(url_col)
            ).otherwise(F.col("_r_final")),
        )
        .withColumn(
            "n_hops",
            F.when(
                F.col("_r_src").isNull() | too_many, F.lit(0).cast("long")
            ).otherwise(F.col("_r_hops")),
        )
        .drop("_r_src", "_r_final", "_r_hops")
    )
