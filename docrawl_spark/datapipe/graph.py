"""Link-graph analytics over the crawl frontier.

The crawl's discovered_by → url edges form the web graph; host-level
PageRank is the classic crawl-priority signal (what OPIC/backlink
ordering approximate online). This module gives the batch form:

- ``host_edges``: collapse page-level links to a weighted host graph
  (src_host, dst_host, weight) — hosts are ~5 orders smaller than
  pages, so every downstream iteration runs on the SMALL projection;
- ``pagerank_hosts``: fixed-iteration weighted PageRank.

Scale shape: each iteration is ONE shuffle (groupBy dst) over the host
dim, with ranks re-joined to the edge list on src. Lineage is
truncated per iteration (localCheckpoint) exactly like
``dedup.connected_components`` so 50-iteration runs don't build a
50-deep plan. No per-row Python anywhere.

Determinism / oracle mode: ranks are carried as INTEGER fixed-point
units (BIGINT micro-rank, ``total_units`` ≈ 10^12) with truncating
integer division (`div`) — summation order cannot change a single bit,
so the result hash-matches a DuckDB oracle running the same unrolled
iterations (double-precision PageRank would drift in the last ulp
across engines/summation orders). Classic damping with d = 85/100 and
ppm-floored edge shares (overflow-proof under ANSI):
share_ppm(u,v) = floor(w(u,v)·10^6 / out_w(u)), and
rank'(v) = base + d · Σ_in floor(rank(u)/10^6) · share_ppm(u,v).
Pick ``total_units`` ≥ n_nodes · 10^9 so per-node ranks stay well
above the 10^6-unit quantum (the 10^12 default covers ≤ ~10^5 hosts
comfortably). Dangling-host mass is dropped (not redistributed) —
spec'd, identical on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_TOTAL_UNITS = 1_000_000_000_000  # 10^12 micro-rank units


def host_edges(links: DataFrame, src_col: str = "src_host", dst_col: str = "dst_host") -> DataFrame:
    """Weighted host graph from page-level link rows: one row per
    (src_host, dst_host) with the link count as weight; self-loops
    dropped (a host linking to itself carries no ranking signal and
    would dominate the weights)."""
    return (
        links.where(F.col(src_col) != F.col(dst_col))
        .groupBy(F.col(src_col).alias("src_host"), F.col(dst_col).alias("dst_host"))
        .agg(F.count("*").alias("weight"))
    )


def pagerank_hosts(
    edges: DataFrame,
    nodes: DataFrame,
    n_iter: int = 3,
    damping_pct: int = 85,
    total_units: int = DEFAULT_TOTAL_UNITS,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Fixed-point weighted PageRank over the host graph.

    ``edges``: (src_host, dst_host, weight); ``nodes``: (host) — the
    full host universe incl. dangling/unlinked hosts. Returns
    (host, rank_units: bigint). rank_units/total_units ≈ the PageRank
    probability; exact integer arithmetic end to end.
    """
    n_nodes = nodes.count()  # host-dim cardinality: small by design
    if n_nodes == 0:
        return nodes.select("host", F.lit(0).cast("long").alias("rank_units"))
    r0 = total_units // n_nodes
    base = ((100 - damping_pct) * r0) // 100

    out_w = edges.groupBy("src_host").agg(F.sum("weight").alias("out_w"))
    # (src, dst, share_ppm) is iteration-invariant: compute once. The
    # edge's share of its source's out-mass is pre-floored to ppm so
    # the per-iteration product stays overflow-proof under ANSI:
    # rank_units div 1e6 ≤ 1e6 and share_ppm ≤ 1e6, so the product is
    # ≤ total_units — never near Long.MAX — for ANY edge weight up to
    # ~9.2e12 (weight * 1e6 is the only wide intermediate). The cost is
    # ppm quantization of both factors — exact and identical in the
    # DuckDB oracle, which mirrors the same two floors.
    ew = (
        edges.join(out_w, "src_host")
        .select(
            "src_host",
            "dst_host",
            F.expr("weight * 1000000L div out_w").alias("share_ppm"),
        )
        .localCheckpoint(eager=True)
    )

    ranks = nodes.select("host", F.lit(r0).cast("long").alias("rank_units"))
    for i in range(n_iter):
        contrib = (
            ew.join(ranks, ew.src_host == ranks.host)
            .select(
                F.col("dst_host").alias("host"),
                F.expr("(rank_units div 1000000L) * share_ppm").alias("c"),
            )
            .groupBy("host")
            .agg(F.sum("c").alias("in_units"))
        )
        ranks = (
            nodes.join(contrib, "host", "left")
            .select(
                "host",
                (
                    F.lit(base)
                    + F.expr(
                        f"{damping_pct} * coalesce(in_units, 0L) div 100"
                    )
                ).cast("long").alias("rank_units"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=True)  # truncate lineage
    return ranks


def hits_hosts(
    edges: DataFrame,
    nodes: DataFrame,
    n_iter: int = 2,
    total_units: int = DEFAULT_TOTAL_UNITS,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Fixed-point weighted HITS (hubs & authorities) over the host
    graph — the other classic crawl-priority signal (authorities ≈ pages
    worth fetching, hubs ≈ pages worth mining for links).

    Spec (exact integer arithmetic, same style as ``pagerank_hosts`` so
    a DuckDB oracle matches bit-for-bit):

    - edge shares are pre-floored to ppm of the endpoint's mass:
      out_share_ppm(u,v) = floor(w(u,v)·10^6 / out_w(u)),
      in_share_ppm(u,v)  = floor(w(u,v)·10^6 / in_w(v));
    - auth_raw(v) = Σ_u floor(hub(u)/10^6) · out_share_ppm(u,v),
      hub_raw(u)  = Σ_v floor(auth(v)/10^6) · in_share_ppm(u,v);
    - L1 normalization back to ``total_units``, float-free:
      x' = (x·10^6) div (Σx div 10^6)  (≡ x·total_units/Σx for the
      default 10^12 — overflow-proof: x ≤ Σx ≤ total_units so the wide
      intermediate is ≤ 10^18 < Long.MAX). Σx div 10^6 = 0 (degenerate
      near-empty graph) yields all-zero scores rather than an error.

    Scale shape: per iteration, two shuffles over the host dim (groupBy
    dst then groupBy src) plus one single-row sum each — the edge-share
    frames are iteration-invariant and localCheckpointed once. Returns
    (host, auth_units, hub_units).
    """
    n_nodes = nodes.count()  # host-dim cardinality: small by design
    if n_nodes == 0:
        return nodes.select(
            "host",
            F.lit(0).cast("long").alias("auth_units"),
            F.lit(0).cast("long").alias("hub_units"),
        )
    r0 = total_units // n_nodes

    out_w = edges.groupBy("src_host").agg(F.sum("weight").alias("out_w"))
    in_w = edges.groupBy("dst_host").agg(F.sum("weight").alias("in_w"))
    ew = (
        edges.join(out_w, "src_host")
        .join(in_w, "dst_host")
        .select(
            "src_host",
            "dst_host",
            F.expr("weight * 1000000L div out_w").alias("out_share_ppm"),
            F.expr("weight * 1000000L div in_w").alias("in_share_ppm"),
        )
        .localCheckpoint(eager=True)
    )

    def _normalize(scores: DataFrame, col: str) -> DataFrame:
        total = scores.agg(F.sum(col).alias("t"))
        return scores.crossJoin(F.broadcast(total)).select(
            "host",
            F.when(F.expr("t div 1000000L") <= 0, F.lit(0).cast("long"))
            .otherwise(F.expr(f"({col} * 1000000L) div (t div 1000000L)"))
            .alias(col),
        )

    hub = nodes.select("host", F.lit(r0).cast("long").alias("hub_units"))
    auth = nodes.select("host", F.lit(r0).cast("long").alias("auth_units"))
    for i in range(n_iter):
        a_raw = (
            ew.join(hub, ew.src_host == hub.host)
            .select(
                F.col("dst_host").alias("host"),
                F.expr("(hub_units div 1000000L) * out_share_ppm").alias("c"),
            )
            .groupBy("host")
            .agg(F.sum("c").alias("raw"))
        )
        auth = _normalize(
            nodes.join(a_raw, "host", "left").select(
                "host", F.coalesce("raw", F.lit(0)).cast("long").alias("auth_units")
            ),
            "auth_units",
        )
        h_raw = (
            ew.join(auth, ew.dst_host == auth.host)
            .select(
                F.col("src_host").alias("host"),
                F.expr("(auth_units div 1000000L) * in_share_ppm").alias("c"),
            )
            .groupBy("host")
            .agg(F.sum("c").alias("raw"))
        )
        hub = _normalize(
            nodes.join(h_raw, "host", "left").select(
                "host", F.coalesce("raw", F.lit(0)).cast("long").alias("hub_units")
            ),
            "hub_units",
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            auth = auth.localCheckpoint(eager=True)
            hub = hub.localCheckpoint(eager=True)
    return auth.join(hub, "host")


def host_degree_metrics(edges: DataFrame) -> DataFrame:
    """Per-host in/out degree + weighted degree — the cheap link-graph
    features (one shuffle each side, full outer on the host dim)."""
    out_m = edges.groupBy(F.col("src_host").alias("host")).agg(
        F.count("*").alias("out_deg"), F.sum("weight").alias("out_w")
    )
    in_m = edges.groupBy(F.col("dst_host").alias("host")).agg(
        F.count("*").alias("in_deg"), F.sum("weight").alias("in_w")
    )
    return (
        out_m.join(in_m, "host", "full_outer")
        .select(
            "host",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("out_w", F.lit(0)).alias("out_w"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            F.coalesce("in_w", F.lit(0)).alias("in_w"),
        )
    )


def opic_hosts(
    edges: DataFrame,
    nodes: DataFrame,
    n_iter: int = 3,
    total_units: int = DEFAULT_TOTAL_UNITS,
) -> DataFrame:
    """Fixed-point batch OPIC (On-line Page Importance Computation,
    Abiteboul/Preda/Cobéna WWW 2003) over the host graph — THE classic
    crawl-ordering signal: pages are fetched greedily by accumulated
    "cash", which needs no convergence before it's useful (unlike
    PageRank). This is the synchronous batch form of the same update:

    - every host starts with cash C0 = total_units div n;
    - each round, every host distributes ALL its cash across its
      out-edges by ppm share (same pre-floored
      share_ppm = floor(w·10^6 / out_w) as :func:`pagerank_hosts`),
      and banks it in its history H;
    - dangling hosts (no out-edges) send their cash to the OPIC
      "virtual page", which redistributes it uniformly in the same
      round: each host also receives floor(D div n) where D = Σ cash
      over dangling hosts (the div remainder is dropped — spec'd,
      identical in the oracle);
    - importance after k rounds ∝ H + C (history plus in-flight cash).

    Exact BIGINT arithmetic end to end: cash products are
    floor(cash/10^6)·share_ppm ≤ total_units per edge (overflow-proof
    under ANSI), so summation order cannot change a bit and a DuckDB
    oracle unrolling the same rounds hash-matches.

    Scale shape per round: ONE shuffle over the host dim (groupBy dst)
    plus a single-row dangling-cash sum broadcast back — the edge-share
    frame is iteration-invariant and localCheckpointed once. Returns
    (host, history_units, cash_units, opic_units = history + cash).
    """
    n_nodes = nodes.count()  # host-dim cardinality: small by design
    if n_nodes == 0:
        return nodes.select(
            "host",
            F.lit(0).cast("long").alias("history_units"),
            F.lit(0).cast("long").alias("cash_units"),
            F.lit(0).cast("long").alias("opic_units"),
        )
    c0 = total_units // n_nodes

    out_w = edges.groupBy("src_host").agg(F.sum("weight").alias("out_w"))
    ew = (
        edges.join(out_w, "src_host")
        .select(
            "src_host",
            "dst_host",
            F.expr("weight * 1000000L div out_w").alias("share_ppm"),
        )
        .localCheckpoint(eager=True)
    )
    # Hosts with at least one out-edge; everyone else is dangling.
    linked = out_w.select(F.col("src_host").alias("host"), F.lit(True).alias("_linked"))

    state = nodes.select(
        "host",
        F.lit(0).cast("long").alias("history_units"),
        F.lit(c0).cast("long").alias("cash_units"),
    )
    for i in range(n_iter):
        tagged = state.join(linked, "host", "left")
        dangling = tagged.where(F.col("_linked").isNull()).agg(
            F.coalesce(F.sum("cash_units"), F.lit(0)).cast("long").alias("d")
        )
        recv = (
            ew.join(tagged, ew.src_host == tagged.host)
            .select(
                F.col("dst_host").alias("host"),
                F.expr("(cash_units div 1000000L) * share_ppm").alias("c"),
            )
            .groupBy("host")
            .agg(F.sum("c").alias("in_units"))
        )
        state = (
            state.join(recv, "host", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "host",
                (F.col("history_units") + F.col("cash_units"))
                .cast("long")
                .alias("history_units"),
                (
                    F.coalesce(F.col("in_units"), F.lit(0))
                    + F.expr(f"d div {int(n_nodes)}L")
                )
                .cast("long")
                .alias("cash_units"),
            )
        )
        # Unlike pagerank (one reference to ranks per round), each OPIC
        # round references state THREE times (dangling sum, contribution
        # join, carry-forward) — without truncation the plan subtree
        # TRIPLES per round (3^n growth), so checkpoint every round.
        # LAZY: the checkpoint materializes once inside the next job
        # and is reused by all three references — truncation without
        # paying a synchronous job per round (measured: eager cost
        # ~2.7x pagerank at sf0.1; lazy ~1.3x).
        if i + 1 < n_iter:
            state = state.localCheckpoint(eager=False)
    return state.select(
        "host",
        "history_units",
        "cash_units",
        (F.col("history_units") + F.col("cash_units")).alias("opic_units"),
    )


def host_reciprocity(edges: DataFrame) -> DataFrame:
    """Per-host link-reciprocity — the cheap nepotistic-link (link-farm)
    signal: for each host, the share of its outbound weight that flows
    over RECIPROCATED edges (an edge u→v is reciprocated iff v→u also
    exists). Link exchanges / mirror rings reciprocate nearly all their
    weight; organically-linked hosts reciprocate little.

    Returns (host, out_w, recip_w, recip_ppm) with exact BIGINT ppm
    (``div``). Scale shape: one self-equi-join of the host-dim edge
    list on the reversed key (never page-level), then one HashAggregate
    per host — both sides of the join are the same host-dim frame.
    """
    fwd = edges.select("src_host", "dst_host", "weight")
    rev = edges.select(
        F.col("dst_host").alias("src_host"),
        F.col("src_host").alias("dst_host"),
        F.lit(True).alias("_recip"),
    )
    tagged = fwd.join(rev, ["src_host", "dst_host"], "left")
    return (
        tagged.groupBy(F.col("src_host").alias("host"))
        .agg(
            F.sum("weight").cast("long").alias("out_w"),
            F.coalesce(
                F.sum(F.when(F.col("_recip"), F.col("weight"))), F.lit(0)
            )
            .cast("long")
            .alias("recip_w"),
        )
        .select(
            "host",
            "out_w",
            "recip_w",
            F.expr("recip_w * 1000000L div out_w").alias("recip_ppm"),
        )
    )


def trustrank_hosts(
    edges: DataFrame,
    nodes: DataFrame,
    seeds: DataFrame,
    n_iter: int = 3,
    damping_pct: int = 85,
    total_units: int = DEFAULT_TOTAL_UNITS,
    checkpoint_every: int = 8,
) -> DataFrame:
    """TrustRank (Gyöngyi/Garcia-Molina/Pedersen VLDB 2004): PageRank
    with the teleport restricted to a vetted SEED set — trust flows
    out of hand-checked good hosts and decays with link distance, so
    spam farms that fabricate in-links from nowhere stay near zero.
    The anti-spam complement of :func:`pagerank_hosts` (same exact
    BIGINT fixed-point spec; only the base/teleport term differs):

    - seeds start with r0 = total_units div n_seeds, non-seeds with 0;
    - per iteration: rank'(v) = base(v) + d·Σ floor(rank(u)/10^6)·
      share_ppm(u,v), where base(v) = (100−d)·r0 div 100 for seeds and
      0 otherwise.

    ``seeds``: (host) — must be a subset of ``nodes``; empty seeds →
    all-zero trust (spec'd). Same scale shape as pagerank_hosts: one
    host-dim shuffle per iteration, iteration-invariant edge shares.
    Returns (host, trust_units).
    """
    n_seeds = seeds.count()  # seed list: tiny by definition
    if n_seeds == 0:
        return nodes.select("host", F.lit(0).cast("long").alias("trust_units"))
    r0 = total_units // n_seeds
    base_units = ((100 - damping_pct) * r0) // 100

    out_w = edges.groupBy("src_host").agg(F.sum("weight").alias("out_w"))
    ew = (
        edges.join(out_w, "src_host")
        .select(
            "src_host",
            "dst_host",
            F.expr("weight * 1000000L div out_w").alias("share_ppm"),
        )
        .localCheckpoint(eager=True)
    )
    seed_dim = seeds.select("host", F.lit(True).alias("_seed"))
    nodes_tagged = (
        nodes.join(seed_dim, "host", "left")
        .select("host", F.coalesce("_seed", F.lit(False)).alias("_seed"))
        .localCheckpoint(eager=True)
    )
    base = F.when(F.col("_seed"), F.lit(base_units)).otherwise(F.lit(0))

    ranks = nodes_tagged.select(
        "host",
        F.when(F.col("_seed"), F.lit(r0))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("trust_units"),
    )
    for i in range(n_iter):
        contrib = (
            ew.join(ranks, ew.src_host == ranks.host)
            .select(
                F.col("dst_host").alias("host"),
                F.expr("(trust_units div 1000000L) * share_ppm").alias("c"),
            )
            .groupBy("host")
            .agg(F.sum("c").alias("in_units"))
        )
        ranks = (
            nodes_tagged.join(contrib, "host", "left")
            .select(
                "host",
                (
                    base
                    + F.expr(f"{damping_pct} * coalesce(in_units, 0L) div 100")
                )
                .cast("long")
                .alias("trust_units"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    max_iter: int = 30,
    host_col: str = "host",
) -> DataFrame:
    """(host, dist): shortest hop count from the seed set over the
    directed host graph — the seed-proximity metric behind crawl-depth
    budgeting (pages far from any seed are late-wave, low-trust
    territory; TrustRank uses the same seed notion for rank mass,
    this gives the HOP metric).

    Iterative min-distance relaxation: each round the frontier's
    neighbors get dist+1, union + groupBy-min folds them in, early
    stop when no distance changed (converges in graph-diameter
    rounds; one shuffle pair per round, localCheckpoint truncates the
    growing plan exactly like connected_components). Unreached hosts
    are excluded rather than given a sentinel."""
    e = edges.select("src_host", "dst_host").distinct().persist()
    dist = sources.select(
        F.col(host_col).alias("host"), F.lit(0).cast("long").alias("dist")
    ).localCheckpoint()
    converged = False
    for _ in range(max_iter):
        nbr = (
            e.join(dist, e["src_host"] == dist["host"])
            .select(F.col("dst_host").alias("host"), (F.col("dist") + 1).alias("dist"))
        )
        new = (
            dist.union(nbr).groupBy("host").agg(F.min("dist").alias("dist"))
        ).localCheckpoint()
        stats = new.agg(
            F.count("*").alias("n"), F.sum("dist").alias("s")
        ).first()
        old = dist.agg(F.count("*").alias("n"), F.sum("dist").alias("s")).first()
        dist = new
        if (stats["n"], stats["s"]) == (old["n"], old["s"]):
            converged = True
            break
    e.unpersist()
    if not converged:
        raise RuntimeError(
            f"bfs_distances did not converge in {max_iter} rounds — the "
            "graph diameter exceeds max_iter; raise it (partial distances "
            "would silently overstate seed proximity)"
        )
    return dist


def cocitation_pairs(
    edges: DataFrame,
    min_cocite: int = 2,
    max_out: int = 64,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """Co-citation similarity (Small 1973, the link-structure dual of
    content near-dup): target pairs cited together by many sources are
    topically related — the related-page signal that needs no content
    at all, and the structural confirmation channel for mirror
    candidates found by ``operators/mirrors.mirror_host_pairs``.

    ``(a, b, cocites)`` for unordered target pairs with
    ``cocites >= min_cocite``, where cocites counts distinct sources
    citing both.

    Scale guard: a source with more than ``max_out`` distinct targets
    is DROPPED before pairing (its pair fan-out is quadratic in
    outdegree, and mega-hub sources — navigation pages, link farms —
    carry ~no topical signal; the classic co-citation cap). After the
    cap, the self-join on the source key fans out ≤ C(max_out, 2) per
    source; the explicit join-key repartition keeps that fan-out
    parallel under AQE (user-specified counts are exempt from
    coalescing — same guard as the SimHash chunk join).
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    # degree dim is src-cardinality (unbounded) — a plain equi-join,
    # co-partitioned with the pairing shuffle below; never broadcast
    deg = e.groupBy("src").agg(F.count("*").alias("_out"))
    kept = e.join(deg.where(F.col("_out") <= max_out).select("src"), "src")
    kept = kept.repartition(
        edges.sparkSession.sparkContext.defaultParallelism, "src"
    )
    a = kept.select("src", F.col("dst").alias("a"))
    b = kept.select("src", F.col("dst").alias("b"))
    pairs = a.join(b, "src").where(F.col("a") < F.col("b"))
    return (
        pairs.groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("cocites"))
        .where(F.col("cocites") >= min_cocite)
    )


def hyperball_neighborhood(
    edges: DataFrame,
    nodes: DataFrame,
    n_rounds: int = 3,
    p: int = 4,
    host_col: str = "host",
) -> DataFrame:
    """HyperBall (Boldi & Vigna 2013): the neighborhood function of the
    host graph via per-node mergeable HLL counters — N(r) = Σ_v
    |Ball(v, r)| estimated without materializing reachability sets.
    THE web-graph-scale algorithm for effective-diameter / average-
    distance / "how connected is the crawl frontier" questions: exact
    BFS closure is O(n²) state at 10^9 hosts, HyperBall is m registers
    per node and one register-max merge along edges per round.

    Counter arithmetic is the repo's integer-exact HLL
    (functions/sketches: 60-bit md5 slice, bit-length rho, fixed-point
    alpha, exact linear-counting table) so every estimate — and
    therefore the whole output — is oracle-hashable bit-for-bit.

    Plan shape per round: counters equi-join edges on dst (register
    arrays ride the join), union with the previous counters, then the
    CLAUDE.md explode→HashAggregate reshape for the elementwise
    register max (posexplode → (host, j) MAX → array_sort(collect_list)
    reassembly) — no interpreted per-array HOF in the hot path, and
    the shuffle carries (host, j, rho) rows, m per node.

    Returns one row per radius r = 0..n_rounds:
    (r, n_nodes, nf_units) with nf_units monotone nondecreasing."""
    prof = hyperball_ball_profile(edges, nodes, n_rounds, p, host_col)
    return (
        prof.groupBy("r")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("ball_units").cast("long").alias("nf_units"),
        )
        .select(F.col("r").cast("int").alias("r"), "n_nodes", "nf_units")
    )


def hyperball_ball_profile(
    edges: DataFrame,
    nodes: DataFrame,
    n_rounds: int = 3,
    p: int = 4,
    host_col: str = "host",
) -> DataFrame:
    """Per-node HyperBall state: (host, r, ball_units) for
    r = 0..n_rounds — |Ball(host, r)| estimated by the shared
    integer-exact HLL arithmetic. The building block under both the
    neighborhood function (sum over nodes) and harmonic centrality
    (per-node growth deltas)."""
    from docrawl_spark.functions.sketches import _hash60, _hll_estimate_expr

    m = 1 << p
    width = 60 - p
    k_cap = 40
    h = _hash60(F.col(host_col).cast("string"))
    bucket = (h % F.lit(m)).alias("b")
    rest = F.expr(
        f"conv(substring(md5(CAST({host_col} AS STRING)), 1, 15), 16, 10)"
        f" div {m}"
    )
    rho = F.when(rest == 0, F.lit(width + 1)).otherwise(
        F.lit(width) - F.length(F.bin(rest)) + F.lit(1)
    )
    counters = nodes.select(
        F.col(host_col).alias("host"), bucket, rho.cast("int").alias("rho")
    ).select(
        "host",
        F.expr(f"transform(sequence(0, {m - 1}),"
               f" j -> IF(j = b, rho, 0))").alias("regs"),
    )
    e = (
        edges.select("src_host", "dst_host")
        .where(F.col("src_host") != F.col("dst_host"))
        .distinct()
    )

    def _balls(c: DataFrame, r: int) -> DataFrame:
        ex = c.select("host", F.explode("regs").alias("rho"))
        per = ex.groupBy("host").agg(
            F.expr(
                f"CAST(sum(shiftleft(CAST(1 AS BIGINT),"
                f" CAST(greatest({k_cap} - rho, 0) AS INT))) AS BIGINT)"
            ).alias("s"),
            F.expr("CAST(sum(IF(rho = 0, 1, 0)) AS BIGINT)").alias("zeros"),
        )
        return per.select(
            "host",
            F.lit(r).cast("int").alias("r"),
            _hll_estimate_expr(p).alias("ball_units"),
        )

    out = _balls(counters, 0)
    for r in range(1, n_rounds + 1):
        nb = (
            e.withColumnRenamed("dst_host", "host")
            .join(counters, "host")
            .select(F.col("src_host").alias("host"), "regs")
        )
        ex = (
            counters.unionByName(nb)
            .select("host", F.posexplode("regs").alias("j", "rho"))
        )
        mx = ex.groupBy("host", "j").agg(F.max("rho").alias("rho"))
        counters = mx.groupBy("host").agg(
            F.expr(
                "transform(array_sort(collect_list(struct(j, rho))),"
                " x -> x.rho)"
            ).alias("regs")
        )
        # per-round lineage truncation (the bfs_distances/connected_
        # components discipline) — also sidesteps a Catalyst union-
        # constraint rewrite failure on deeply self-referencing plans
        counters = counters.localCheckpoint(eager=False)
        out = out.unionByName(_balls(counters, r))
    return out


def harmonic_centrality_topk(
    edges: DataFrame,
    nodes: DataFrame,
    n_rounds: int = 3,
    p: int = 4,
    k: int = 20,
    host_col: str = "host",
) -> DataFrame:
    """Harmonic centrality via HyperBall growth deltas (Boldi & Vigna's
    actual use case): H(v) ≈ Σ_{r=1..R} (|Ball(v,r)| − |Ball(v,r−1)|)/r
    — each newly reached node at distance r contributes 1/r. Pass the
    REVERSED edge table for classic inbound centrality ("how easily is
    this host reached"), the forward table for outreach.

    Integer basis: hc_units = Σ greatest(Δball, 0)·10^6 div r. The
    greatest(·,0) clamp matters: the HLL estimate is monotone within
    each branch but can dip a unit when crossing the linear-counting →
    raw boundary; a negative "newly reached" count is meaningless, so
    it is clamped (mirrored in the oracle). Top-k by (hc desc, host) —
    TakeOrdered, no global sort."""
    prof = hyperball_ball_profile(edges, nodes, n_rounds, p, host_col)
    growth = [
        F.sum(
            F.when(F.col("r") == r, F.col("ball_units")).otherwise(F.lit(0))
        ).alias(f"b{r}")
        for r in range(0, n_rounds + 1)
    ]
    wide = prof.groupBy("host").agg(*growth)
    hc = None
    for r in range(1, n_rounds + 1):
        term = F.expr(
            f"greatest(b{r} - b{r - 1}, CAST(0 AS BIGINT))"
            f" * CAST(1000000 AS BIGINT) div {r}"
        )
        hc = term if hc is None else hc + term
    return (
        wide.select("host", hc.cast("long").alias("hc_units"))
        .orderBy(F.col("hc_units").desc(), F.col("host").asc())
        .limit(k)
    )


def label_propagation_communities(
    edges: DataFrame,
    nodes: DataFrame,
    n_rounds: int = 4,
    host_col: str = "host",
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over the
    UNDIRECTED host graph — community detection for crawl partitioning
    and link-farm discovery (a spam farm is a dense community whose
    labels converge in one round; connected_components only sees
    reachability, LPA sees density).

    Deterministic by construction: labels start as the host's own
    name, each round every node adopts the most frequent label among
    its neighbors with ties broken by MIN label (count-max computed as
    groupBy + max + equi-join + MIN — two HashAggregates, NO per-host
    window, so a 10^7-degree hub never lands in one task; CLAUDE.md's
    struct-min SortAggregate demotion is avoided too). Isolated nodes
    keep their own label. Fixed synchronous rounds (bipartite
    structures can oscillate — the fixed-round output is still
    deterministic and oracle-hashable); per-round localCheckpoint
    truncates lineage.

    Returns (host, community)."""
    eu = (
        edges.select("src_host", "dst_host")
        .union(
            edges.select(
                F.col("dst_host").alias("src_host"),
                F.col("src_host").alias("dst_host"),
            )
        )
        .where(F.col("src_host") != F.col("dst_host"))
        .distinct()
        .persist()
    )
    labels = nodes.select(
        F.col(host_col).alias("host"), F.col(host_col).alias("label")
    ).localCheckpoint(eager=False)
    for _ in range(n_rounds):
        nb = (
            eu.withColumnRenamed("src_host", "host")
            .join(labels, "host")
            .select(F.col("dst_host").alias("host"), "label")
            .groupBy("host", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        mx = nb.groupBy("host").agg(F.max("c").alias("cmax"))
        top = (
            nb.join(mx, "host")
            .where(F.col("c") == F.col("cmax"))
            .groupBy("host")
            .agg(F.min("label").alias("top_label"))
        )
        labels = (
            labels.join(top, "host", "left")
            .select(
                "host",
                F.coalesce("top_label", "label").alias("label"),
            )
            .localCheckpoint(eager=False)
        )
    out = labels.select("host", F.col("label").alias("community"))
    eu.unpersist()
    return out


def bowtie_decomposition(
    edges: DataFrame,
    nodes: DataFrame,
    pivot: str | None = None,
    max_iter: int = 30,
    host_col: str = "host",
) -> DataFrame:
    """Bow-tie structure of the host graph (Broder et al. 2000 — the
    canonical macroscopic web-crawl analysis): classify every host
    relative to the core strongly-connected component containing a
    pivot as SCC (reaches and is reached), IN (reaches the core), OUT
    (reached from the core), or OTHER (tendrils/disconnected). Crawl
    reading: seeds in IN+SCC cover SCC+OUT; a frontier stuck in OUT
    can never climb back — the shape tells you where seed investment
    pays.

    Exactly two BFS closures (forward and backward from the pivot,
    reusing ``bfs_distances`` — one shuffle pair per round, converge-
    or-raise) plus two host-dim left joins; no transitive-closure
    materialization. Pivot defaults to the lexicographic MIN host for
    determinism — in production pass a known-core host (e.g. the top
    PageRank host). Classifies the pivot's SCC, which is the giant
    one whenever the pivot sits in it (Broder's setting)."""
    if pivot is None:
        pivot = nodes.agg(F.min(host_col).alias("p")).collect()[0]["p"]
    piv = nodes.sparkSession.createDataFrame([(pivot,)], f"{host_col} string")
    e = edges.select("src_host", "dst_host")
    rev = edges.select(
        F.col("dst_host").alias("src_host"), F.col("src_host").alias("dst_host")
    )
    fwd = bfs_distances(e, piv, max_iter, host_col).select(
        "host", F.lit(1).alias("in_f")
    )
    bwd = bfs_distances(rev, piv, max_iter, host_col).select(
        "host", F.lit(1).alias("in_b")
    )
    return (
        nodes.select(F.col(host_col).alias("host"))
        .join(fwd, "host", "left")
        .join(bwd, "host", "left")
        .select(
            "host",
            F.when((F.col("in_f") == 1) & (F.col("in_b") == 1), F.lit("SCC"))
            .when(F.col("in_b") == 1, F.lit("IN"))
            .when(F.col("in_f") == 1, F.lit("OUT"))
            .otherwise(F.lit("OTHER"))
            .alias("component"),
        )
    )


def effective_diameter(
    edges: DataFrame,
    nodes: DataFrame,
    n_rounds: int = 3,
    p: int = 4,
    pct_ppm: int = 900000,
    host_col: str = "host",
) -> DataFrame:
    """Effective diameter from the HyperBall neighborhood function —
    the standard web-graph statistic (smallest radius r where N(r)
    reaches ``pct_ppm`` of N(R_max), conventionally 90%): how many
    hops a crawl needs before reachability saturates. One row:
    (eff_diameter, nf_at_r, nf_max) — integer comparison, no
    interpolation (the DuckDB mirror must agree bit-for-bit)."""
    nf = hyperball_neighborhood(edges, nodes, n_rounds, p, host_col)
    mx = nf.agg(F.max("nf_units").alias("nf_max"))
    return (
        nf.crossJoin(F.broadcast(mx))
        .where(
            F.col("nf_units") * F.lit(1000000).cast("long")
            >= F.lit(pct_ppm).cast("long") * F.col("nf_max")
        )
        .orderBy(F.col("r").asc())
        .limit(1)
        .select(
            F.col("r").alias("eff_diameter"),
            F.col("nf_units").alias("nf_at_r"),
            "nf_max",
        )
    )


def _oriented_triangles(und: DataFrame, deg: DataFrame) -> DataFrame:
    """Enumerate every triangle of the undirected edge set ``und``
    (columns a < b) exactly once as (u, x, y), using the degree-ordered
    orientation trick: edges directed from the (degree, host)-smaller
    endpoint bound every out-degree by O(sqrt(|E|)), so the wedge
    self-join on the common source — the step a naive adjacency
    self-join explodes on at a 10^6-degree hub — is arboricity-bounded.
    ``deg`` is the (h, deg) degree table of ``und``."""
    da = deg.select(F.col("h").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("h").alias("b"), F.col("deg").alias("deg_b"))
    withdeg = und.join(da, "a").join(db, "b")
    # orient small -> large under the (degree, host) total order
    o = withdeg.select(
        F.when(
            (F.col("deg_a") < F.col("deg_b"))
            | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))),
            F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
        )
        .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
        .alias("e")
    ).select(F.col("e.u").alias("u"), F.col("e.v").alias("v"))
    # order wedge arms under the SAME total order so each triangle
    # closes exactly once: need (deg, host) of v and w
    dv = deg.select(F.col("h").alias("v"), F.col("deg").alias("deg_v"))
    ov = o.join(dv, "v")
    e1 = ov.select("u", F.col("v").alias("x"), F.col("deg_v").alias("deg_x"))
    e2 = ov.select("u", F.col("v").alias("y"), F.col("deg_v").alias("deg_y"))
    wedges = e1.join(e2, "u").where(
        (F.col("deg_x") < F.col("deg_y"))
        | ((F.col("deg_x") == F.col("deg_y")) & (F.col("x") < F.col("y")))
    )
    closer = o.select(F.col("u").alias("x"), F.col("v").alias("y"))
    return wedges.join(closer, ["x", "y"]).select("u", "x", "y")


def host_triangles(
    edges: DataFrame,
    nodes: DataFrame,
    host_col: str = "host",
) -> DataFrame:
    """Exact triangle counts + local clustering coefficients over the
    undirected host graph — link farms and PBNs are triangle-dense
    (organic cross-host linking is sparse and tree-ish; a paid network
    inter-links densely), so clustering_ppm is a spam-graph signal the
    degree-only metrics miss.

    Scale shape: the degree-ordered ORIENTATION trick (each undirected
    edge directed from the (degree, host)-smaller endpoint to the
    larger) bounds every node's out-degree by O(sqrt(|E|)) on any
    graph, so the wedge join (o ⋈ o on the common source) — the step
    that explodes on a naive adjacency self-join when a hub has 10^6
    neighbors — fans out at most out_deg² per node with out_deg
    arboricity-bounded. Wedges close via one more equi-join against
    the oriented edge set. Every triangle is enumerated exactly once;
    per-host counts explode the 3 corners into one HashAggregate.

    Returns (host, degree, n_triangles, clustering_ppm) for every node
    in ``nodes`` — clustering_ppm = 2·tri·10^6 div (deg·(deg−1)),
    0 for degree < 2."""
    und = (
        edges.select(
            F.least("src_host", "dst_host").alias("a"),
            F.greatest("src_host", "dst_host").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("h"))
        .union(und.select(F.col("b").alias("h")))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    tris = _oriented_triangles(und, deg)
    corners = tris.select(
        F.explode(F.array("u", "x", "y")).alias("h")
    ).groupBy("h").agg(F.count(F.lit(1)).alias("n_triangles"))
    return (
        nodes.select(F.col(host_col).alias("host"))
        .join(deg.withColumnRenamed("h", "host"), "host", "left")
        .join(corners.withColumnRenamed("h", "host"), "host", "left")
        .select(
            "host",
            F.coalesce("deg", F.lit(0)).cast("long").alias("degree"),
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
            F.expr(
                "CASE WHEN coalesce(deg, 0) >= 2 THEN"
                " 2 * coalesce(n_triangles, 0) * CAST(1000000 AS BIGINT)"
                " div (coalesce(deg, 0) * (coalesce(deg, 0) - 1))"
                " ELSE CAST(0 AS BIGINT) END"
            ).alias("clustering_ppm"),
        )
    )


def kcore_members(
    edges: DataFrame,
    nodes: DataFrame,
    k: int,
    n_rounds: int = 4,
    host_col: str = "host",
) -> DataFrame:
    """k-core membership over the undirected host graph by synchronous
    peeling: each round drops every node whose degree WITHIN the
    surviving subgraph is < k; the fixed point is the k-core (Seidman
    1983) — the crawl's "dense nucleus" (k-core size tracks the
    mutually-reinforcing link mass that PageRank concentrates on, and
    spam networks inflate it).

    Fixed synchronous rounds for cross-engine determinism (the oracle
    unrolls the same chain); peeling is monotone, so if round R equals
    round R−1 the answer is exact — callers at unknown depth should
    raise ``n_rounds`` until a stability test passes (the unit test
    pins a 2-round-deep peel cascade). Per round: one alive-restricted
    degree HashAggregate + two semi-joins; per-round localCheckpoint.

    Returns (host, in_kcore boolean) for every node in ``nodes``."""
    und = (
        edges.select(
            F.least("src_host", "dst_host").alias("a"),
            F.greatest("src_host", "dst_host").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    alive = nodes.select(F.col(host_col).alias("host")).localCheckpoint(
        eager=False
    )
    for _ in range(n_rounds):
        ea = und.join(alive.withColumnRenamed("host", "a"), "a").join(
            alive.withColumnRenamed("host", "b"), "b"
        )
        deg = (
            ea.select(F.col("a").alias("h"))
            .union(ea.select(F.col("b").alias("h")))
            .groupBy("h")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        alive = (
            alive.join(deg.withColumnRenamed("h", "host"), "host", "left")
            .where(F.coalesce("deg", F.lit(0)) >= k)
            .select("host")
            .localCheckpoint(eager=False)
        )
    out = (
        nodes.select(F.col(host_col).alias("host"))
        .join(alive.withColumn("_in", F.lit(True)), "host", "left")
        .select("host", F.coalesce("_in", F.lit(False)).alias("in_kcore"))
    )
    und.unpersist()
    return out


def ktruss_edges(
    edges: DataFrame,
    k: int,
    n_rounds: int = 3,
) -> DataFrame:
    """k-truss membership per undirected edge (Cohen 2008): the
    k-truss is the maximal subgraph where every edge closes ≥ k−2
    triangles *within the subgraph*. Where the k-core keeps any
    well-connected node, the truss demands the connections reinforce
    each other — the sharpest cheap signal for densely inter-linked
    host clusters (PBNs sit in high trusses; organic hub-and-spoke
    linking does not).

    Synchronous peel, fixed ``n_rounds`` for cross-engine determinism
    (the oracle unrolls the same chain): each round re-enumerates
    triangle support over surviving edges via the degree-ordered
    orientation (arboricity-bounded wedge join — see
    ``_oriented_triangles``) and drops edges with support < k−2.
    Peeling is monotone, so equal consecutive rounds = exact fixed
    point; the unit test pins a 2-round peel cascade. Per-round
    localCheckpoint caps plan growth.

    Returns (a, b, in_ktruss) for every undirected input edge,
    a < b lexicographically."""
    und = (
        edges.select(
            F.least("src_host", "dst_host").alias("a"),
            F.greatest("src_host", "dst_host").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    alive = und.localCheckpoint(eager=False)
    support_floor = k - 2
    for _ in range(n_rounds):
        deg = (
            alive.select(F.col("a").alias("h"))
            .union(alive.select(F.col("b").alias("h")))
            .groupBy("h")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        tris = _oriented_triangles(alive, deg)
        pairs = tris.select(
            F.explode(
                F.array(
                    F.struct(
                        F.least("u", "x").alias("a"),
                        F.greatest("u", "x").alias("b"),
                    ),
                    F.struct(
                        F.least("u", "y").alias("a"),
                        F.greatest("u", "y").alias("b"),
                    ),
                    F.struct(
                        F.least("x", "y").alias("a"),
                        F.greatest("x", "y").alias("b"),
                    ),
                )
            ).alias("e")
        ).select(F.col("e.a").alias("a"), F.col("e.b").alias("b"))
        support = pairs.groupBy("a", "b").agg(
            F.count(F.lit(1)).alias("sup")
        )
        alive = (
            alive.join(support, ["a", "b"], "left")
            .where(F.coalesce("sup", F.lit(0)) >= support_floor)
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
    out = (
        und.join(alive.withColumn("_in", F.lit(True)), ["a", "b"], "left")
        .select("a", "b", F.coalesce("_in", F.lit(False)).alias("in_ktruss"))
    )
    und.unpersist()
    return out


def degree_assortativity_stats(edges: DataFrame) -> DataFrame:
    """Exact sufficient statistics for the degree-assortativity
    coefficient (Newman 2002) of the undirected host graph — the web
    is famously *disassortative* (hubs link to leaves); a strongly
    assortative host neighborhood is a link-farm fingerprint.

    Emits ONE row of exact BIGINT sums over the symmetrized edge list
    (each undirected edge contributes both (x=deg u, y=deg v) and the
    swap, so x/y marginals are identical by construction):
    ``(m, sum_x, sum_y, sum_xy, sum_x2, sum_y2)`` with m = 2·|E|.
    Pearson r = (m·Σxy − Σx·Σy) / sqrt((m·Σx² − Σx²)(m·Σy² − Σy²))
    belongs driver-side on the one collected row (see
    :func:`assortativity_coefficient`) — the cross-term products would
    need >63 bits long before the distributed sums do (the sums
    themselves overflow only past Σ deg² ≈ 9.2·10^18, i.e. graphs far
    beyond host-dim scale; switch the aggregate to DECIMAL(38,0) if
    you ever index page-level graphs here).

    Scale shape: one degree HashAggregate + two broadcast-joinable dim
    joins + one global aggregate. No per-row Python."""
    und = (
        edges.select(
            F.least("src_host", "dst_host").alias("a"),
            F.greatest("src_host", "dst_host").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("h"))
        .union(und.select(F.col("b").alias("h")))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    sym = und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    dx = deg.select(F.col("h").alias("a"), F.col("deg").alias("x"))
    dy = deg.select(F.col("h").alias("b"), F.col("deg").alias("y"))
    return (
        sym.join(dx, "a")
        .join(dy, "b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("m"),
            F.sum("x").cast("long").alias("sum_x"),
            F.sum("y").cast("long").alias("sum_y"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sum_xy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sum_x2"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("sum_y2"),
        )
    )


def assortativity_coefficient(row) -> float:
    """Driver-side Pearson r from the one stats row of
    :func:`degree_assortativity_stats` (Python ints are unbounded, so
    the cross-term products are exact). Returns 0.0 on degenerate
    graphs (constant degree or no edges)."""
    m = row["m"]
    if m == 0:
        return 0.0
    num = m * row["sum_xy"] - row["sum_x"] * row["sum_y"]
    dx = m * row["sum_x2"] - row["sum_x"] ** 2
    dy = m * row["sum_y2"] - row["sum_y"] ** 2
    if dx <= 0 or dy <= 0:
        return 0.0
    return num / (dx * dy) ** 0.5


def component_size_histogram(
    labels: DataFrame,
    label_col: str = "component",
) -> DataFrame:
    """Log2-bucketed size histogram of a component labeling — the
    one-screen shape summary of graph fragmentation (a healthy crawl
    frontier has one giant component and a long tail of small
    islands; mirror farms show up as an unexpected bump of mid-size
    components). Bucket = bit length of the component size (the
    cross-engine integer log2: ``length(bin(x))``, identical in Spark
    and DuckDB), so bucket b holds sizes in [2^(b−1), 2^b).

    Input: any (node, label) frame; returns one row per occupied
    bucket — ``(bucket_bits, n_components, n_nodes)``. Two
    HashAggregates, no joins."""
    sizes = labels.groupBy(label_col).agg(F.count(F.lit(1)).alias("sz"))
    return (
        sizes.select(
            F.length(F.bin(F.col("sz"))).cast("long").alias("bucket_bits"),
            "sz",
        )
        .groupBy("bucket_bits")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_components"),
            F.sum("sz").cast("long").alias("n_nodes"),
        )
    )


def host_random_walks(
    edges: DataFrame,
    nodes: DataFrame,
    walk_len: int = 4,
    n_walks: int = 2,
    host_col: str = "host",
) -> DataFrame:
    """Deterministic pseudo-random walks over the DIRECTED host graph
    — the walk-corpus prep step of DeepWalk/node2vec-style graph
    embeddings (the walks are the training sentences; an embedding
    trainer consumes them downstream). Determinism is load-bearing:
    the "random" next hop is ``md5_60bit(walk_id:step:cur) %
    out_degree(cur)``, a pure function of position, so walks are
    bit-reproducible across runs, partitionings, and engines (the
    oracle unrolls the same chain) — no Math.random, no seed state.

    ``n_walks`` walks start at every node (walk_id = host#k). A walk
    reaching a node with no out-neighbors stops early (truncated, not
    padded). Output long form: (walk_id, step, host), step 0-based.

    Scale shape per step: one equi-join of the walk state against the
    degree dim and one against the ROW_NUMBER-indexed neighbor table
    — walk_len fixed small (the embedding-corpus norm), so the plan is
    walk_len shallow joins, no iteration state to checkpoint."""
    e = (
        edges.select(F.col("src_host").alias("src"), F.col("dst_host").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    w_idx = Window.partitionBy("src").orderBy("dst")
    nbr = e.withColumn("i", F.row_number().over(w_idx) - 1)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    starts = nodes.select(F.col(host_col).alias("cur")).crossJoin(
        F.broadcast(
            nodes.sparkSession.range(n_walks).select(
                F.col("id").cast("string").alias("k")
            )
        )
    ).select(
        F.concat(F.col("cur"), F.lit("#"), F.col("k")).alias("walk_id"), "cur"
    )
    out = [starts.select("walk_id", F.lit(0).alias("step"), F.col("cur").alias("host"))]
    state = starts
    for s in range(1, walk_len):
        pick = (
            state.join(deg, state["cur"] == deg["src"])
            .select(
                "walk_id",
                F.col("cur"),
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.col("walk_id"),
                                    F.lit(f":{s}:"),
                                    F.col("cur"),
                                )
                            ),
                            1,
                            15,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % F.col("d")
                ).alias("pick_i"),
            )
        )
        state = pick.join(
            nbr,
            (pick["cur"] == nbr["src"]) & (pick["pick_i"] == nbr["i"]),
        ).select("walk_id", F.col("dst").alias("cur"))
        out.append(
            state.select("walk_id", F.lit(s).alias("step"), F.col("cur").alias("host"))
        )
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


def host_coreness(
    edges: DataFrame,
    nodes: DataFrame,
    n_rounds: int = 4,
    host_col: str = "host",
) -> DataFrame:
    """Full coreness (k-core number) per host via the h-index
    iteration (Lü, Zhou, Zhang & Stanley 2016): start every node at
    its degree; each round replace a node's value with the H-index of
    its neighbors' values (the largest h with ≥ h neighbors valued
    ≥ h). The sequence is non-increasing from degree and converges to
    the exact coreness — the whole k-core decomposition in one number
    per node, where :func:`kcore_members` answers a single k.

    Fixed synchronous ``n_rounds`` for cross-engine determinism (the
    oracle unrolls the same chain); monotone, so equal consecutive
    rounds = exact fixed point. H-index per node = ``max(least(rank,
    value))`` over neighbors ranked by value descending — one per-node
    window whose partition is the node's neighbor list (document the
    hub caveat: a 10^6-degree hub sorts its list in one task; coreness
    at that scale wants the count-bucket variant). Per-round
    localCheckpoint caps plan growth.

    Returns (host, coreness) for every node in ``nodes`` — isolated
    hosts get 0."""
    und = (
        edges.select(
            F.least("src_host", "dst_host").alias("a"),
            F.greatest("src_host", "dst_host").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("v"))
    c = nodes.select(F.col(host_col).alias("h")).join(
        deg.withColumnRenamed("a", "h"), "h", "left"
    ).select("h", F.coalesce("v", F.lit(0)).cast("long").alias("v"))
    for _ in range(n_rounds):
        nv = sym.join(
            c.select(F.col("h").alias("b"), F.col("v").alias("nbr_v")), "b"
        ).select(F.col("a").alias("h"), "nbr_v")
        w = Window.partitionBy("h").orderBy(F.col("nbr_v").desc())
        h_idx = (
            nv.withColumn("rn", F.row_number().over(w))
            .select("h", F.least(F.col("rn").cast("long"), F.col("nbr_v")).alias("m"))
            .groupBy("h")
            .agg(F.max("m").alias("v"))
        )
        c = (
            nodes.select(F.col(host_col).alias("h"))
            .join(h_idx, "h", "left")
            .select("h", F.coalesce("v", F.lit(0)).cast("long").alias("v"))
            .localCheckpoint(eager=False)
        )
    und.unpersist()
    return c.select(F.col("h").alias("host"), F.col("v").alias("coreness"))


def adamic_adar_pairs(
    edges: DataFrame,
    min_cocite: int = 2,
    max_out: int = 64,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """Adamic-Adar link prediction over co-citing sources (Adamic &
    Adar 2003): like ``cocitation_pairs`` but each common source
    contributes 1/log(outdegree) instead of 1 — a hub page citing 60
    targets says far less about any pair of them than a focused page
    citing 3. The standard related-host / missing-link score when raw
    co-citation over-rewards navigation hubs.

    Integer-exact cross-engine surrogate: 1/log2 via the bit length,
    ``w_ppm = 1_000_000 div length(bin(outdeg))`` — bit length is
    floor(log2)+1, monotone in outdegree, and behaves identically in
    Spark and DuckDB (both strip leading zeros). Output per unordered
    target pair: ``(a, b, cocites, aa_ppm)`` with
    ``cocites >= min_cocite``.

    Scale shape: identical to ``cocitation_pairs`` — the mega-hub cap
    (> ``max_out`` distinct targets dropped) bounds the source
    self-join fan-out at C(max_out, 2), the explicit join-key
    repartition keeps the fan-out parallel under AQE, and the weight
    rides the pairing join as one extra BIGINT; no new shuffle.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    deg = e.groupBy("src").agg(F.count("*").alias("_out"))
    kept = e.join(deg.where(F.col("_out") <= max_out), "src")
    kept = kept.withColumn(
        "w_ppm", F.expr("1000000 div CAST(length(bin(_out)) AS BIGINT)")
    )
    kept = kept.repartition(
        edges.sparkSession.sparkContext.defaultParallelism, "src"
    )
    a = kept.select("src", "w_ppm", F.col("dst").alias("a"))
    b = kept.select("src", F.col("dst").alias("b"))
    pairs = a.join(b, "src").where(F.col("a") < F.col("b"))
    return (
        pairs.groupBy("a", "b")
        .agg(
            F.count("*").cast("long").alias("cocites"),
            F.sum("w_ppm").cast("long").alias("aa_ppm"),
        )
        .where(F.col("cocites") >= min_cocite)
    )
