"""Unit tests for HITS, registrable-domain extraction, frontier
fairness, and magic-byte media sniffing (the cross-engine oracle rows
live in test_oracle_parity; these pin the operator semantics on
hand-computed cases)."""

from __future__ import annotations

from pyspark.sql import functions as F

from docrawl_spark.datapipe.graph import hits_hosts, host_edges
from docrawl_spark.datapipe.multimodal import sniff_media_type_col
from docrawl_spark.functions.domains import registrable_domains, suffix_dim
from docrawl_spark.operators.fairness import host_load_gini

TOTAL = 1_000_000_000_000


def test_hits_star_graph_exact(spark):
    """4 spokes each linking to one center: the center takes ALL
    authority mass (10^12 after L1 normalization), each spoke takes an
    exact quarter of the hub mass; second iteration is a fixed point."""
    nodes = spark.createDataFrame(
        [("c",), ("s1",), ("s2",), ("s3",), ("s4",)], "host string"
    )
    links = spark.createDataFrame(
        [(s, "c") for s in ("s1", "s2", "s3", "s4")],
        "src_host string, dst_host string",
    )
    out = {
        r["host"]: (r["auth_units"], r["hub_units"])
        for r in hits_hosts(host_edges(links), nodes, n_iter=2).collect()
    }
    assert out["c"] == (TOTAL, 0)
    for s in ("s1", "s2", "s3", "s4"):
        assert out[s] == (0, TOTAL // 4)


def test_hits_mass_conserved_and_deterministic(spark):
    """On an arbitrary graph the L1 mass stays ~total_units (floor
    losses only: < n_nodes + 10^6 units) and reruns are bit-identical."""
    nodes = spark.createDataFrame([(f"h{i}",) for i in range(7)], "host string")
    links = spark.createDataFrame(
        [(f"h{i}", f"h{(i * 3 + j) % 7}") for i in range(7) for j in range(1, 4)],
        "src_host string, dst_host string",
    )
    edges = host_edges(links)
    r1 = sorted(map(tuple, hits_hosts(edges, nodes, n_iter=3).collect()))
    r2 = sorted(map(tuple, hits_hosts(edges, nodes, n_iter=3).collect()))
    assert r1 == r2
    auth_mass = sum(r[1] for r in r1)
    hub_mass = sum(r[2] for r in r1)
    # L1 normalization is integer: per-node floors lose up to n units,
    # the quantized divisor (t div 10^6) can overshoot by ~t/q ≈ 10^6
    for mass in (auth_mass, hub_mass):
        assert abs(mass - TOTAL) <= 2 * (len(r1) + 1_000_000)


def test_registrable_domain_rules(spark):
    cases = {
        "www.example.co.uk": ("co.uk", "example.co.uk"),
        "a.b.example.github.io": ("github.io", "example.github.io"),
        "github.io": ("github.io", None),           # host IS a suffix
        "example.xyzzy": ("xyzzy", "example.xyzzy"),  # default * rule
        "xyzzy": ("xyzzy", None),
        "bucket.x.s3.amazonaws.com": ("s3.amazonaws.com", "x.s3.amazonaws.com"),
        "plain.com": ("com", "plain.com"),
    }
    hosts = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {
        r["host"]: (r["suffix"], r["registrable_domain"])
        for r in registrable_domains(hosts, suffix_dim(spark)).collect()
    }
    assert got == cases


def test_host_load_gini_hand_computed(spark):
    """x = [1,2,3,4]: S=30, T=10, n=4 -> gini = 10/40 = 250000 ppm;
    top decile = top-1 host = 4/10 = 400000 ppm."""
    rows = (
        [("a", i) for i in range(1)]
        + [("b", i) for i in range(2)]
        + [("c", i) for i in range(3)]
        + [("d", i) for i in range(4)]
    )
    df = spark.createDataFrame(rows, "host string, k int")
    out = host_load_gini(df).collect()[0]
    assert (out["n_hosts"], out["total"]) == (4, 10)
    assert out["gini_ppm"] == 250_000
    assert out["top_decile_share_ppm"] == 400_000


def test_host_load_gini_uniform_is_zero(spark):
    df = spark.createDataFrame(
        [(f"h{i}", j) for i in range(5) for j in range(3)], "host string, k int"
    )
    out = host_load_gini(df).collect()[0]
    assert out["gini_ppm"] == 0


def test_sniff_media_type_each_magic(spark):
    cases = [
        (b"\x89PNG\r\n\x1a\x0arest-of-file", "png"),
        (b"\xff\xd8\xff\xe0junk", "jpeg"),
        (b"GIF87a....", "gif"),
        (b"GIF89a....", "gif"),
        (b"%PDF-1.7 ...", "pdf"),
        (b"RIFF....WAVE", "riff"),
        (b"plain text", "unknown"),
        (b"", "unknown"),
        (None, "unknown"),
    ]
    df = spark.createDataFrame(
        [(i, c) for i, (c, _) in enumerate(cases)], "i int, content binary"
    )
    got = {
        r["i"]: r["t"]
        for r in df.select("i", sniff_media_type_col("content").alias("t")).collect()
    }
    assert got == {i: want for i, (_, want) in enumerate(cases)}


def test_opic_cycle_with_dangling(spark):
    """a→b→c cycle plus dangling d: hand-unrolled round 1. Every host
    starts with c0 = TOTAL/4; after one round each cycle member passes
    its full cash along (share_ppm = 10^6) and everyone (incl. d)
    receives floor(d_cash / n) from the virtual-page redistribution."""
    from docrawl_spark.datapipe.graph import opic_hosts

    nodes = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",)], "host string"
    )
    links = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")],
        "src_host string, dst_host string",
    )
    out = {
        r["host"]: r
        for r in opic_hosts(host_edges(links), nodes, n_iter=1).collect()
    }
    c0 = TOTAL // 4
    uniform = c0 // 4  # dangling d's cash spread over all 4 hosts
    passed = (c0 // 1_000_000) * 1_000_000  # ppm-quantized full pass
    for h in ("a", "b", "c"):
        assert out[h]["history_units"] == c0
        assert out[h]["cash_units"] == passed + uniform
    assert out["d"]["history_units"] == c0
    assert out["d"]["cash_units"] == uniform  # receives only virtual mass
    for h in out:
        assert out[h]["opic_units"] == out[h]["history_units"] + out[h]["cash_units"]


def test_opic_mass_nearly_conserved_and_deterministic(spark):
    """Cash in flight stays ≈ total_units across rounds (ppm floors and
    the dangling div lose < n·10^6 + n units per round) and reruns are
    bit-identical."""
    from docrawl_spark.datapipe.graph import opic_hosts

    nodes = spark.createDataFrame([(f"h{i}",) for i in range(7)], "host string")
    links = spark.createDataFrame(
        [(f"h{i}", f"h{(i * 3 + j) % 7}") for i in range(5) for j in range(1, 4)],
        "src_host string, dst_host string",
    )
    edges = host_edges(links)
    r1 = sorted(map(tuple, opic_hosts(edges, nodes, n_iter=3).collect()))
    r2 = sorted(map(tuple, opic_hosts(edges, nodes, n_iter=3).collect()))
    assert r1 == r2
    cash = sum(r[2] for r in r1)
    n_iter, n = 3, 7
    assert 0 < cash <= TOTAL
    assert TOTAL - cash <= n_iter * (n * 1_000_000 + n + 1_000_000)


def test_host_reciprocity_hand_case(spark):
    """a↔b reciprocated (uneven weights), a→c one-way: a's recip share
    is 2/(2+1), b's is 1/1, c has no out-edges (absent)."""
    from docrawl_spark.datapipe.graph import host_reciprocity

    links = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "a"), ("a", "c")],
        "src_host string, dst_host string",
    )
    out = {
        r["host"]: r for r in host_reciprocity(host_edges(links)).collect()
    }
    assert set(out) == {"a", "b"}
    assert (out["a"]["out_w"], out["a"]["recip_w"]) == (3, 2)
    assert out["a"]["recip_ppm"] == 666_666
    assert (out["b"]["out_w"], out["b"]["recip_w"]) == (1, 1)
    assert out["b"]["recip_ppm"] == 1_000_000


def test_trustrank_decay_and_spam_isolation(spark):
    """Trust flows seed → linked chain and decays; a spam host with
    fabricated in-links from OTHER spam only (no path from a seed)
    stays at zero; empty seed set -> all-zero."""
    from docrawl_spark.datapipe.graph import trustrank_hosts

    nodes = spark.createDataFrame(
        [("seed",), ("mid",), ("far",), ("spam1",), ("spam2",)], "host string"
    )
    links = spark.createDataFrame(
        [("seed", "mid"), ("mid", "far"), ("spam1", "spam2"), ("spam2", "spam1")],
        "src_host string, dst_host string",
    )
    seeds = spark.createDataFrame([("seed",)], "host string")
    edges = host_edges(links)
    out = {
        r["host"]: r["trust_units"]
        for r in trustrank_hosts(edges, nodes, seeds, n_iter=3).collect()
    }
    assert out["seed"] > out["mid"] > out["far"] > 0  # decay with distance
    assert out["spam1"] == 0 and out["spam2"] == 0  # unreachable from seeds

    empty = spark.createDataFrame([], "host string")
    zeros = trustrank_hosts(edges, nodes, empty, n_iter=2).collect()
    assert all(r["trust_units"] == 0 for r in zeros)


def test_bfs_distances_multi_hop_chain(spark):
    """Path graph a->b->c->d plus unreachable z and a 2-cycle: exact
    hop counts, early convergence, unreached nodes excluded."""
    from docrawl_spark.datapipe.graph import bfs_distances

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"), ("y", "x")],
        "src_host string, dst_host string",
    )
    seeds = spark.createDataFrame([("a",)], "host string")
    got = {r["host"]: r["dist"] for r in bfs_distances(edges, seeds).collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_bfs_distances_raises_on_non_convergence(spark):
    import pytest as _pytest

    from docrawl_spark.datapipe.graph import bfs_distances

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src_host string, dst_host string"
    )
    seeds = spark.createDataFrame([("a",)], "host string")
    with _pytest.raises(RuntimeError):
        bfs_distances(edges, seeds, max_iter=2)


def test_zorder_key_matches_python_interleave(spark):
    """zkey == the bit-interleave reference, and z-ordering clusters:
    any 16-key bucket spans at most a 4x4 (x, y) rectangle."""
    from pyspark.sql import functions as F

    from docrawl_spark.datapipe.export import zorder_key_col

    df = spark.range(256).select(
        (F.col("id") % 16).alias("x"), (F.col("id") / 16).cast("long").alias("y")
    )
    rows = df.select(
        "x", "y", zorder_key_col(F.col("x"), F.col("y"), bits=8).alias("zkey")
    ).collect()

    def ref(x, y):
        k = 0
        for i in range(8):
            k |= ((x >> i) & 1) << (2 * i)
            k |= ((y >> i) & 1) << (2 * i + 1)
        return k

    buckets = {}
    for r in rows:
        assert r["zkey"] == ref(r["x"], r["y"])
        buckets.setdefault(r["zkey"] // 16, []).append((r["x"], r["y"]))
    for pts in buckets.values():
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        assert max(xs) - min(xs) <= 3 and max(ys) - min(ys) <= 3


def test_cocitation_pairs_counts_and_cap(spark):
    """Hand graph: (x,y) and (y,z) co-cited twice survive, (x,z) once
    is pruned, and a hub source above the outdegree cap contributes
    nothing (its pairs vanish entirely)."""
    from docrawl_spark.datapipe.graph import cocitation_pairs

    edges = [
        ("s1", "x"), ("s1", "y"), ("s1", "z"),
        ("s2", "x"), ("s2", "y"),
        ("s3", "y"), ("s3", "z"),
        # hub: outdeg 4 > max_out=3 -> dropped wholesale
        ("s4", "x"), ("s4", "y"), ("s4", "z"), ("s4", "w"),
        # duplicate edge must not double-count
        ("s2", "x"),
    ]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    out = {
        (r["a"], r["b"]): r["cocites"]
        for r in cocitation_pairs(df, min_cocite=2, max_out=3).collect()
    }
    assert out == {("x", "y"): 2, ("y", "z"): 2}
    # with the cap relaxed the hub's pairs come back
    relaxed = {
        (r["a"], r["b"]): r["cocites"]
        for r in cocitation_pairs(df, min_cocite=2, max_out=64).collect()
    }
    assert relaxed[("x", "y")] == 3 and ("w", "x") not in relaxed


def test_ucb_host_allocation_explore_exploit(spark):
    """An under-sampled host outranks a well-sampled high-yield host
    (exploration dominates); among equally-sampled hosts yield orders
    them; zero-fetch hosts are rejected; values are hand-exact."""
    from docrawl_spark.operators.fairness import ucb_host_allocation

    import math

    rows = [
        ("hot", 1000, 900),      # well-sampled, high yield
        ("cold", 1, 0),          # barely sampled, no yield yet
        ("mid", 1000, 100),
        ("never", 0, 0),         # rejected
    ]
    df = spark.createDataFrame(rows, "host string, n_fetches long, n_useful long")
    got = {r["host"]: r for r in ucb_host_allocation(df).collect()}
    assert "never" not in got
    n_total = 2001  # bitlen = 11
    assert got["hot"]["yield_ppm"] == 900000
    exp_cold = math.floor(math.sqrt(2 * 11 * 10**12 // 1))
    assert got["cold"]["bonus_ppm"] == exp_cold
    # exploration dominates: cold's ucb beats hot's
    assert got["cold"]["ucb_ppm"] > got["hot"]["ucb_ppm"]
    # equal sampling -> yield decides
    assert got["hot"]["ucb_ppm"] > got["mid"]["ucb_ppm"]
    assert got["hot"]["bonus_ppm"] == got["mid"]["bonus_ppm"]


def test_hyperball_matches_python_hll_simulation(spark):
    """HyperBall rows equal a pure-Python mirror of the integer HLL
    arithmetic over EXACT BFS balls (the register state after r rounds
    is exactly the union sketch of Ball(v, r)), on a small digraph
    with a cycle, a chain, and an isolated node."""
    import hashlib
    import math

    from docrawl_spark.datapipe.graph import hyperball_neighborhood

    adj = {
        "a": ["b"],
        "b": ["c"],
        "c": ["a", "d"],
        "d": [],
        "e": [],  # isolated
    }
    hosts = sorted(adj)
    p, m, width, k_cap, rounds = 4, 16, 56, 40, 3
    alpha_ppm = int(0.7213 / (1.0 + 1.079 / m) * 1_000_000)
    lc = [round(m * math.log(m / z)) for z in range(1, m + 1)]

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def regs_of(keys):
        regs = [0] * m
        for s in keys:
            h = h60(s)
            b, rest = h % m, h // m
            rho = width + 1 if rest == 0 else width - rest.bit_length() + 1
            regs[b] = max(regs[b], rho)
        return regs

    def est(regs):
        s = sum(1 << max(k_cap - r, 0) for r in regs)
        zeros = sum(1 for r in regs if r == 0)
        raw = alpha_ppm * ((m * m * (1 << k_cap)) // s) // 1_000_000
        if zeros > 0 and raw <= 5 * m // 2:
            return lc[zeros - 1]
        return raw

    balls = {v: {v} for v in hosts}
    expect = []
    for r in range(rounds + 1):
        if r > 0:
            balls = {
                v: balls[v].union(*[balls[w] for w in adj[v]] or [set()])
                for v in hosts
            }
        expect.append((r, len(hosts), sum(est(regs_of(balls[v])) for v in hosts)))

    edges = spark.createDataFrame(
        [(s, d) for s, ds in adj.items() for d in ds],
        "src_host string, dst_host string",
    )
    nodes = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = [
        (r["r"], r["n_nodes"], r["nf_units"])
        for r in hyperball_neighborhood(edges, nodes, n_rounds=rounds, p=p)
        .orderBy("r")
        .collect()
    ]
    assert got == expect
    # and the neighborhood function is monotone nondecreasing
    nf = [x[2] for x in got]
    assert nf == sorted(nf)


def test_harmonic_centrality_python_simulation_and_order(spark):
    """Inbound harmonic centrality equals the Python mirror (reverse
    BFS balls → same integer HLL estimates → clamped 1/r deltas), and
    the star center outranks every spoke."""
    import hashlib
    import math

    from docrawl_spark.datapipe.graph import harmonic_centrality_topk

    # spokes s1..s4 -> hub; chain t1 -> t2 -> hub
    fwd = [("s1", "hub"), ("s2", "hub"), ("s3", "hub"), ("s4", "hub"),
           ("t1", "t2"), ("t2", "hub")]
    hosts = sorted({h for e in fwd for h in e})
    p, m, width, k_cap, rounds = 4, 16, 56, 40, 3
    alpha_ppm = int(0.7213 / (1.0 + 1.079 / m) * 1_000_000)
    lc = [round(m * math.log(m / z)) for z in range(1, m + 1)]

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def est(keys):
        regs = [0] * m
        for s in keys:
            h = h60(s)
            b, rest = h % m, h // m
            rho = width + 1 if rest == 0 else width - rest.bit_length() + 1
            regs[b] = max(regs[b], rho)
        s = sum(1 << max(k_cap - r, 0) for r in regs)
        zeros = sum(1 for r in regs if r == 0)
        raw = alpha_ppm * ((m * m * (1 << k_cap)) // s) // 1_000_000
        return lc[zeros - 1] if zeros > 0 and raw <= 5 * m // 2 else raw

    radj = {v: [] for v in hosts}
    for s, d in fwd:
        radj[d].append(s)  # inbound: ball grows along reversed edges
    balls = {v: {v} for v in hosts}
    prof = {v: [est(balls[v])] for v in hosts}
    for _ in range(rounds):
        balls = {
            v: balls[v].union(*[balls[w] for w in radj[v]] or [set()])
            for v in hosts
        }
        for v in hosts:
            prof[v].append(est(balls[v]))
    expect = {
        v: sum(
            max(prof[v][r] - prof[v][r - 1], 0) * 1_000_000 // r
            for r in range(1, rounds + 1)
        )
        for v in hosts
    }

    edges = spark.createDataFrame(fwd, "src_host string, dst_host string")
    nodes = spark.createDataFrame([(h,) for h in hosts], "host string")
    rev = edges.selectExpr("dst_host AS src_host", "src_host AS dst_host")
    got = {
        r["host"]: r["hc_units"]
        for r in harmonic_centrality_topk(rev, nodes, n_rounds=rounds, p=p, k=10).collect()
    }
    assert got == expect
    assert got["hub"] == max(got.values())
    assert all(got["hub"] > got[s] for s in ["s1", "s2", "s3", "s4"])


def test_label_propagation_two_cliques_and_isolate(spark):
    """Two 3-cliques joined by one bridge edge converge to two
    communities labeled by each clique's min host; an isolated node
    keeps its own label; the bridge doesn't merge them (each bridge
    endpoint has 2 same-clique neighbors vs 1 cross edge)."""
    from docrawl_spark.datapipe.graph import label_propagation_communities

    cliques = [("a1", "a2"), ("a1", "a3"), ("a2", "a3"),
               ("b1", "b2"), ("b1", "b3"), ("b2", "b3"),
               ("a3", "b1")]  # bridge
    hosts = ["a1", "a2", "a3", "b1", "b2", "b3", "iso"]
    edges = spark.createDataFrame(cliques, "src_host string, dst_host string")
    nodes = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {
        r["host"]: r["community"]
        for r in label_propagation_communities(edges, nodes, n_rounds=4).collect()
    }
    assert got["iso"] == "iso"
    assert got["a1"] == got["a2"] == got["a3"] == "a1"
    # clique B converges to its own community (the bridge does not
    # merge it into A); its label is the stale propagated "a3" — label
    # NAMES are arbitrary identifiers, the PARTITION is the output
    assert got["b1"] == got["b2"] == got["b3"] == "a3"
    assert len(set(got.values())) == 3


def test_bowtie_decomposition_hand_graph(spark):
    """Classic bow-tie: IN → SCC cycle → OUT, plus a disconnected
    node. Pivot defaults to min host ('a', inside the SCC)."""
    from docrawl_spark.datapipe.graph import bowtie_decomposition

    # SCC: a <-> b (cycle); IN: i -> a; OUT: b -> o; OTHER: x
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("i", "a"), ("b", "o")],
        "src_host string, dst_host string",
    )
    nodes = spark.createDataFrame(
        [("a",), ("b",), ("i",), ("o",), ("x",)], "host string"
    )
    got = {
        r["host"]: r["component"]
        for r in bowtie_decomposition(edges, nodes).collect()
    }
    assert got == {"a": "SCC", "b": "SCC", "i": "IN", "o": "OUT", "x": "OTHER"}


def test_effective_diameter_chain_graph(spark):
    """On a directed 4-chain with rounds=3, N(r) saturates at r=3
    (every node's full forward ball reached); the 90% radius is ≤ 3
    and N is monotone so nf_at_r ≥ 0.9·nf_max exactly holds."""
    from docrawl_spark.datapipe.graph import effective_diameter

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")],
        "src_host string, dst_host string",
    )
    nodes = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",)], "host string"
    )
    row = effective_diameter(edges, nodes, n_rounds=3, p=4).collect()[0]
    assert 0 <= row["eff_diameter"] <= 3
    assert row["nf_at_r"] * 1_000_000 >= 900_000 * row["nf_max"]
    # one radius earlier must be BELOW the 90% bar (minimality), unless
    # the answer is radius 0
    if row["eff_diameter"] > 0:
        from docrawl_spark.datapipe.graph import hyperball_neighborhood

        nf = {
            r["r"]: r["nf_units"]
            for r in hyperball_neighborhood(edges, nodes, 3, 4).collect()
        }
        assert nf[row["eff_diameter"] - 1] * 1_000_000 < 900_000 * row["nf_max"]


def test_host_triangles_hand_graph(spark):
    """K4 minus one edge: {a,b,c,d} with all edges except c-d. Two
    triangles (abc, abd); a and b corner both, c and d corner one.
    Clustering: a,b have deg 3 → 2·2/6; c,d deg 2 → 2·1/2 = 1.
    Isolated e: all zeros."""
    from docrawl_spark.datapipe.graph import host_triangles

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("d", "b")],
        "src_host string, dst_host string",
    )
    nodes = spark.createDataFrame(
        [(h,) for h in "abcde"], "host string"
    )
    got = {
        r["host"]: (r["degree"], r["n_triangles"], r["clustering_ppm"])
        for r in host_triangles(edges, nodes).collect()
    }
    assert got == {
        "a": (3, 2, 2 * 2 * 1_000_000 // 6),
        "b": (3, 2, 2 * 2 * 1_000_000 // 6),
        "c": (2, 1, 1_000_000),
        "d": (2, 1, 1_000_000),
        "e": (0, 0, 0),
    }


def test_host_triangles_direction_and_duplicate_edges_collapse(spark):
    """Reciprocal and duplicate directed edges are ONE undirected edge
    — a 3-cycle with doubled edges still counts exactly one triangle
    per corner."""
    from docrawl_spark.datapipe.graph import host_triangles

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("c", "a"), ("a", "c")],
        "src_host string, dst_host string",
    )
    nodes = spark.createDataFrame([(h,) for h in "abc"], "host string")
    got = {
        r["host"]: (r["degree"], r["n_triangles"])
        for r in host_triangles(edges, nodes).collect()
    }
    assert got == {"a": (2, 1), "b": (2, 1), "c": (2, 1)}


def test_kcore_peel_cascade(spark):
    """2-core of a triangle with a pendant chain: peeling the chain
    tip exposes the next node — a 2-round cascade — and the triangle
    survives. Boolean output covers every input node."""
    from docrawl_spark.datapipe.graph import kcore_members

    # triangle a-b-c; chain c-d, d-e (e deg 1; after e peels, d deg 1)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")],
        "src_host string, dst_host string",
    )
    nodes = spark.createDataFrame([(h,) for h in "abcde"], "host string")
    got = {
        r["host"]: r["in_kcore"]
        for r in kcore_members(edges, nodes, k=2, n_rounds=4).collect()
    }
    assert got == {"a": True, "b": True, "c": True, "d": False, "e": False}
    # stability: one more round changes nothing (the fixed point)
    got5 = {
        r["host"]: r["in_kcore"]
        for r in kcore_members(edges, nodes, k=2, n_rounds=5).collect()
    }
    assert got5 == got


def test_kcore_k_too_high_empties(spark):
    from docrawl_spark.datapipe.graph import kcore_members

    edges = spark.createDataFrame(
        [("a", "b")], "src_host string, dst_host string"
    )
    nodes = spark.createDataFrame([("a",), ("b",)], "host string")
    got = {
        r["host"]: r["in_kcore"]
        for r in kcore_members(edges, nodes, k=2, n_rounds=2).collect()
    }
    assert got == {"a": False, "b": False}


def test_ktruss_shared_edge_and_pendant(spark):
    """Two triangles sharing edge b-c plus a pendant edge: the 3-truss
    (every edge in >= 1 triangle) keeps all triangle edges and drops
    the pendant."""
    from docrawl_spark.datapipe.graph import ktruss_edges

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d"), ("d", "e")],
        "src_host string, dst_host string",
    )
    got = {
        (r["a"], r["b"]): r["in_ktruss"]
        for r in ktruss_edges(edges, k=3, n_rounds=2).collect()
    }
    assert got == {
        ("a", "b"): True,
        ("a", "c"): True,
        ("b", "c"): True,
        ("b", "d"): True,
        ("c", "d"): True,
        ("d", "e"): False,
    }


def test_ktruss_peel_cascade_and_k4_survival(spark):
    """Triangle strip T(a,b,c), T(b,c,d), T(c,d,e): at k=4 only bc/cd
    have support 2, but after round 1 removes their neighbors they have
    no triangles left — a 2-round cascade to empty. A disjoint K4
    (every edge in exactly 2 triangles) survives k=4 untouched."""
    from docrawl_spark.datapipe.graph import ktruss_edges

    strip = [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d"),
             ("c", "e"), ("d", "e")]
    k4 = [("p", "q"), ("p", "r"), ("p", "s"), ("q", "r"), ("q", "s"), ("r", "s")]
    edges = spark.createDataFrame(
        strip + k4, "src_host string, dst_host string"
    )
    got = {
        (r["a"], r["b"]): r["in_ktruss"]
        for r in ktruss_edges(edges, k=4, n_rounds=3).collect()
    }
    assert all(got[e] for e in k4)
    assert not any(got[e] for e in strip)
    # stability: an extra round is the fixed point
    got4 = {
        (r["a"], r["b"]): r["in_ktruss"]
        for r in ktruss_edges(edges, k=4, n_rounds=4).collect()
    }
    assert got4 == got


def test_assortativity_star_is_disassortative(spark):
    """A star graph is maximally disassortative (r = -1): every edge
    pairs the hub (deg n) with a leaf (deg 1)."""
    from docrawl_spark.datapipe.graph import (
        assortativity_coefficient,
        degree_assortativity_stats,
    )

    edges = spark.createDataFrame(
        [("hub", f"leaf{i}") for i in range(5)],
        "src_host string, dst_host string",
    )
    row = degree_assortativity_stats(edges).collect()[0]
    assert row["m"] == 10 and row["sum_x"] == row["sum_y"]
    # symmetrized star: each edge contributes (5,1) and (1,5)
    assert row["sum_xy"] == 10 * 5
    assert abs(assortativity_coefficient(row) + 1.0) < 1e-12


def test_assortativity_degenerate_graphs(spark):
    from docrawl_spark.datapipe.graph import (
        assortativity_coefficient,
        degree_assortativity_stats,
    )

    # constant-degree (cycle): zero variance -> defined as 0.0
    cyc = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")],
        "src_host string, dst_host string",
    )
    row = degree_assortativity_stats(cyc).collect()[0]
    assert assortativity_coefficient(row) == 0.0
    # empty graph
    empty = spark.createDataFrame([], "src_host string, dst_host string")
    row0 = degree_assortativity_stats(empty).collect()[0]
    assert row0["m"] == 0 and assortativity_coefficient(row0) == 0.0


def test_host_random_walks_deterministic_and_truncating(spark):
    """Walks are bit-identical across invocations; a dead-end node
    truncates its walk; every step's host is a real out-neighbor of
    the previous step."""
    from docrawl_spark.datapipe.graph import host_random_walks

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")],  # d isolated
        "src_host string, dst_host string",
    )
    nodes = spark.createDataFrame([(h,) for h in "abcd"], "host string")

    def run():
        return sorted(
            (r["walk_id"], r["step"], r["host"])
            for r in host_random_walks(edges, nodes, walk_len=3, n_walks=2).collect()
        )

    w1, w2 = run(), run()
    assert w1 == w2
    by_walk = {}
    for wid, step, host in w1:
        by_walk.setdefault(wid, {})[step] = host
    adj = {"a": {"b", "c"}, "b": {"c"}, "c": {"a"}}
    for wid, steps in by_walk.items():
        assert steps[0] == wid.split("#")[0]
        for s in range(1, 3):
            if s in steps:
                assert steps[s] in adj[steps[s - 1]], (wid, s, steps)
    # d has no out-edges: its walks are exactly the start row
    assert by_walk["d#0"] == {0: "d"} and by_walk["d#1"] == {0: "d"}
    # connected starts walk the full length
    assert set(by_walk["a#0"]) == {0, 1, 2}


def test_host_coreness_triangle_pendant_isolated(spark):
    """Triangle -> coreness 2; pendant -> 1; isolated -> 0; coreness
    of the kcore test fixture agrees with kcore_members."""
    from docrawl_spark.datapipe.graph import host_coreness, kcore_members

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")],
        "src_host string, dst_host string",
    )
    nodes = spark.createDataFrame([(h,) for h in "abcdef"], "host string")
    got = {
        r["host"]: r["coreness"]
        for r in host_coreness(edges, nodes, n_rounds=4).collect()
    }
    assert got == {"a": 2, "b": 2, "c": 2, "d": 1, "e": 1, "f": 0}
    # cross-check: coreness >= k  <=>  kcore_members(k) is True
    members = {
        r["host"]: r["in_kcore"]
        for r in kcore_members(edges, nodes.where("host <> 'f'"), k=2, n_rounds=4).collect()
    }
    for h, m in members.items():
        assert m == (got[h] >= 2), h


def test_dense_subgraph_family_vs_brute_random_graphs(spark):
    """Seeded random graphs: triangles / coreness / k-truss each match
    an independent brute-force Python implementation."""
    import itertools
    import random

    from docrawl_spark.datapipe.graph import (
        host_coreness,
        host_triangles,
        ktruss_edges,
    )

    for seed in range(4):
        rng = random.Random(seed)
        n = 10
        names = [f"h{i:02d}" for i in range(n)]
        und = {
            (names[i], names[j])
            for i in range(n)
            for j in range(i + 1, n)
            if rng.random() < 0.35
        }
        adj = {x: set() for x in names}
        for a, b in und:
            adj[a].add(b)
            adj[b].add(a)

        edges = spark.createDataFrame(
            sorted(und), "src_host string, dst_host string"
        )
        nodes = spark.createDataFrame([(x,) for x in names], "host string")

        # brute triangles per node
        tri_cnt = {x: 0 for x in names}
        for a, b, c in itertools.combinations(names, 3):
            if b in adj[a] and c in adj[a] and c in adj[b]:
                for x in (a, b, c):
                    tri_cnt[x] += 1
        got_tri = {
            r["host"]: r["n_triangles"]
            for r in host_triangles(edges, nodes).collect()
        }
        assert got_tri == tri_cnt, f"triangles seed={seed}"

        # brute coreness: repeated peel
        core = {x: len(adj[x]) for x in names}
        live = dict(adj)
        k = 0
        alive = set(names)
        while alive:
            k += 1
            changed = True
            while changed:
                changed = False
                for x in sorted(alive):
                    if sum(1 for y in live[x] if y in alive) < k:
                        core[x] = k - 1
                        alive.discard(x)
                        changed = True
        got_core = {
            r["host"]: r["coreness"]
            for r in host_coreness(edges, nodes, n_rounds=12).collect()
        }
        assert got_core == core, f"coreness seed={seed}"

        # brute 4-truss: peel edges with support < 2
        es = set(und)
        while True:
            sup = {
                e: sum(1 for w in adj[e[0]] & adj[e[1]]
                       if (min(e[0], w), max(e[0], w)) in es
                       and (min(e[1], w), max(e[1], w)) in es)
                for e in es
            }
            drop = {e for e, s in sup.items() if s < 2}
            if not drop:
                break
            es -= drop
        got_truss = {
            (r["a"], r["b"])
            for r in ktruss_edges(edges, k=4, n_rounds=12).collect()
            if r["in_ktruss"]
        }
        assert got_truss == es, f"ktruss seed={seed}"


def test_adamic_adar_pairs_hand_weights_and_cap(spark, plan_of):
    """Hand graph: each co-citing source contributes
    1e6 div bitlen(outdeg) — s1 (outdeg 3, bitlen 2) gives 500000,
    s2 (outdeg 2, bitlen 2) gives 500000, s3 (outdeg 2) gives 500000,
    so focused co-citers outweigh a 4-target source (bitlen 3 ->
    333333). Hub above the cap vanishes; single co-citations pruned;
    plan stays equi-join (no cartesian)."""
    from docrawl_spark.datapipe.graph import adamic_adar_pairs

    edges = [
        ("s1", "x"), ("s1", "y"), ("s1", "z"),
        ("s2", "x"), ("s2", "y"),
        ("s3", "y"), ("s3", "z"),
        ("s4", "x"), ("s4", "y"), ("s4", "z"), ("s4", "w"),
        ("s2", "x"),  # duplicate edge must not double-count
    ]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    out = {
        (r["a"], r["b"]): (r["cocites"], r["aa_ppm"])
        for r in adamic_adar_pairs(df, min_cocite=2, max_out=3).collect()
    }
    # s1 outdeg 3 -> bitlen('11')=2 -> 500000; s2/s3 outdeg 2 -> 500000
    assert out == {("x", "y"): (2, 1000000), ("y", "z"): (2, 1000000)}
    relaxed = {
        (r["a"], r["b"]): (r["cocites"], r["aa_ppm"])
        for r in adamic_adar_pairs(df, min_cocite=2, max_out=64).collect()
    }
    # hub s4 outdeg 4 -> bitlen('100')=3 -> 333333 joins the x,y score
    assert relaxed[("x", "y")] == (3, 1333333)

    plan = plan_of(adamic_adar_pairs(df))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
