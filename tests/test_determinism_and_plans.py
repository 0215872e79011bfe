"""Determinism under parallelism (SURVEY.md §5.2 item 5) and
physical-plan shape assertions — the 100 TB questions: does the filter
reach the scan, did the small side broadcast, is the kernel
shuffle-free, is top-k a TakeOrdered not a global sort."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from docrawl_spark.operators.ranking import with_global_rank
from docrawl_spark.operators.scan import scan_documents
from docrawl_spark.plans import driver_queries as dq
from docrawl_spark.plans.crawl import run_crawl
from docrawl_spark.sources.fixtures import fixture_to_dfs, generate_web
from docrawl_spark.sources.storage import Warehouse

SF = "/root/testdata/sf0.01"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# Determinism
# ---------------------------------------------------------------------------


def test_crawl_invariant_to_salts_and_partitions(spark, tmp_path):
    fx = generate_web(seed=5)
    docs_raw, hosts, seeds = fixture_to_dfs(spark, fx)
    results = []
    for i, (salts, parts) in enumerate([(1, 2), (8, 16)]):
        wh = Warehouse(str(tmp_path / f"wh{i}"), spark)
        docs_rp = docs_raw.repartition(parts)
        res = run_crawl(
            spark, docs_rp, hosts, seeds, max_waves=4, warehouse=wh,
            use_bloom=False, n_salts=salts, collect_visits=True,
        )
        results.append((res.visits, res.seen_urls))
    assert results[0] == results[1]


def test_global_rank_invariant_to_partitioning(spark):
    df = spark.range(1000).select(
        (F.col("id") * 37 % 1000).alias("k"), F.col("id").alias("v")
    )
    a = {
        (r["k"], r["rank"])
        for r in with_global_rank(df.repartition(3), ["k"], num_partitions=4).collect()
    }
    b = {
        (r["k"], r["rank"])
        for r in with_global_rank(df.repartition(17), ["k"], num_partitions=11).collect()
    }
    assert a == b
    ranks = sorted(r for _, r in a)
    assert ranks == list(range(1000))


# ---------------------------------------------------------------------------
# Plan shapes
# ---------------------------------------------------------------------------


def test_pricing_summary_pushdown_and_pruning(spark):
    plan = plan_of(dq.q_pricing_summary(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: unused columns don't reach the scan
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]


def test_revenue_by_nation_broadcasts_dims(spark):
    plan = plan_of(dq.q_revenue_by_nation(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_topk_compiles_to_take_ordered(spark):
    from docrawl_spark.datapipe.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = plan_of(cosine_topk(emb, [1.0] + [0.0] * 63, k=10))
    assert "TakeOrderedAndProject" in plan


def test_scan_kernel_is_shuffle_free(spark):
    fx = generate_web(seed=5)
    docs_raw, _, _ = fixture_to_dfs(spark, fx)
    plan = plan_of(scan_documents(docs_raw))
    assert "Exchange" not in plan


def test_politeness_uses_broadcast_for_hosts(spark):
    from docrawl_spark.operators.politeness import gate_and_select

    fx = generate_web(seed=5)
    docs_raw, hosts, seeds = fixture_to_dfs(spark, fx)
    from docrawl_spark.plans.crawl import seeds_to_candidates

    cands = seeds_to_candidates(seeds)
    plan = plan_of(gate_and_select(cands, hosts.select("host", "budget", "robots_blob")))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_politeness_phase1_window_is_salted(spark):
    """Skew safety: the first politeness window must partition by
    (host_hash, _salt) so a hot host's pending URLs spread over
    n_salts tasks — if the salt ever falls out of the partition spec,
    one task would hold the whole host."""
    from docrawl_spark.operators.politeness import gate_and_select
    from docrawl_spark.plans.crawl import seeds_to_candidates

    fx = generate_web(seed=5)
    _, hosts, seeds = fixture_to_dfs(spark, fx)
    cands = seeds_to_candidates(seeds)
    plan = plan_of(
        gate_and_select(cands, hosts.select("host", "budget", "robots_blob")),
        mode="extended",
    )
    import re

    w = re.search(r"windowspecdefinition\(host_hash[^)]*_salt", plan)
    assert w, "phase-1 window no longer partitioned by (host_hash, _salt)"


def test_bucketed_seen_antijoin_is_shuffle_free(spark, tmp_path):
    """The 100 TB seen-set design (BENCH.md): frontier and url_seen
    bucketed+sorted by url_hash make the exact anti-join a co-located
    sort-merge with NO Exchange and NO per-query Sort — the shuffle is
    paid once at write time, not every wave."""
    from pyspark.sql import functions as F

    frontier = spark.range(0, 2000).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
        F.col("id").alias("payload"),
    )
    seen = spark.range(0, 1000).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash")
    )
    spark.sql("DROP TABLE IF EXISTS bt_frontier")
    spark.sql("DROP TABLE IF EXISTS bt_seen")
    for name, df in [("bt_frontier", frontier), ("bt_seen", seen)]:
        (
            df.write.bucketBy(8, "url_hash")
            .sortBy("url_hash")
            .option("path", str(tmp_path / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    f, s = spark.table("bt_frontier"), spark.table("bt_seen")
    # hint forces the merge join (else the tiny side would broadcast
    # and prove nothing about the at-scale plan)
    plan = plan_of(f.join(s.hint("merge"), "url_hash", "left_anti"))
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    # correctness of the co-located join
    got = f.join(s.hint("merge"), "url_hash", "left_anti").count()
    exact = frontier.join(seen, "url_hash", "left_anti").count()
    assert got == exact
    spark.sql("DROP TABLE bt_frontier")
    spark.sql("DROP TABLE bt_seen")


def test_minhash_signatures_hash_aggregates(spark):
    """The reshaped minhash runs as a codegen HashAggregate (map-side
    combinable) — a SortAggregate demotion would mean per-group sorts
    at 10^9-doc scale, and an interpreted array fold would sit outside
    codegen entirely."""
    from docrawl_spark.datapipe.dedup import minhash_signatures

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(minhash_signatures(docs, n_hashes=8))
    assert "HashAggregate" in plan
    assert "SortAggregate" not in plan


def test_simhash_table_hash_aggregates(spark):
    from docrawl_spark.datapipe.dedup import simhash_table

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(simhash_table(docs))
    assert "HashAggregate" in plan
    assert "SortAggregate" not in plan


def test_embedding_neardup_query_is_bucket_joined(spark):
    """The embedding_neardup query entry must run the SCALE path: a
    bucket/probe equi-join, never the _blk=0 all-pairs self-join
    (round-1 weak finding). Candidates = pairs with SRP-bucket hamming
    <= 1; assert the plan has an equi-join on _probe and no cartesian/
    nested-loop node, and that the output is the exact-verified subset
    of the brute pairs."""
    plan = plan_of(dq.q_embedding_neardup(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "_probe" in plan  # the bucket equi-join key

    from docrawl_spark.datapipe.dedup import embedding_neardup_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    brute = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in embedding_neardup_pairs(emb, threshold=0.4).collect()
    }
    bucketed = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in dq.q_embedding_neardup(spark, SF).collect()
    }
    assert bucketed <= brute  # every returned pair is exact-verified
    assert len(bucketed) > 0


def test_ngram_jaccard_query_feeds_from_lsh_candidates(spark):
    """The jaccard query entry must verify LSH candidates, not a
    blocked corpus self-join: its pair set is a subset of the LSH
    candidate set, and the plan has no cartesian node."""
    from docrawl_spark.datapipe.dedup import minhash_lsh_pairs

    plan = plan_of(dq.q_ngram_jaccard_pairs(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cands = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            docs, n_hashes=8, n_bands=4, hash_mode="md5hex"
        ).collect()
    }
    got = {
        (r["id_a"], r["id_b"]) for r in dq.q_ngram_jaccard_pairs(spark, SF).collect()
    }
    assert got <= cands
    assert len(got) > 0


def test_spans_kind_filter_stays_inside_generator(spark):
    """The kind filter must run inside the array BEFORE the explode —
    the generate node's input is the filtered lambda, so non-matching
    spans never become rows."""
    from docrawl_spark.operators.scan import spans_of_kind

    fx = generate_web(seed=5)
    docs_raw, _, _ = fixture_to_dfs(spark, fx)
    plan = plan_of(spans_of_kind(docs_raw, "link"), mode="simple")
    assert "Generate posexplode" in plan or "Generate explode(filter(" in plan


def test_schedule_candidates_windows_are_payload_skinny(spark):
    """The at-scale wave shuffle shape (plans/wave.py): the politeness
    window exchanges must carry ONLY the skinny schedule columns —
    never the url/discovered_by string payload (the strings rejoin once
    at the end, measured 4-5x shuffle-byte reduction at 32M rows)."""
    from docrawl_spark.plans.wave import schedule_candidates

    cands = spark.range(1000).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
        F.concat(
            F.lit("https://h"), (F.col("id") % 7).cast("string"),
            F.lit(".test/p"), F.col("id").cast("string"),
        ).alias("url"),
        F.concat(F.lit("h"), (F.col("id") % 7).cast("string"), F.lit(".test")).alias("host"),
        F.xxhash64(F.concat(F.lit("h"), (F.col("id") % 7).cast("string"))).alias("host_hash"),
        F.lit(1).alias("depth"),
        F.col("id").alias("parent_rank"),
        (F.col("id") % 31).cast("int").alias("offset"),
        F.lit("x").alias("discovered_by"),
    )
    hosts = spark.range(7).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".test")).alias("host"),
        F.lit(3).alias("budget"),
        F.lit("").alias("robots_blob"),
    )
    out = schedule_candidates(cands, hosts)
    plan = plan_of(out)
    # every host_hash-keyed exchange (the window shuffles) is skinny
    blocks = plan.split("\n\n")
    window_exchanges = [
        b
        for b in blocks
        if ") Exchange" in b and "hashpartitioning(host_hash" in b
    ]
    assert window_exchanges, "expected host_hash window exchanges in the plan"
    for b in window_exchanges:
        assert "url#" not in b, f"url string rides a window exchange:\n{b}"
        assert "discovered_by#" not in b, f"payload rides a window exchange:\n{b}"
    # correctness: per-host budget respected and ranks dense
    rows = out.collect()
    assert len(rows) == 7 * 3
    ranks = sorted(r["_wave_rank"] for r in rows)
    assert ranks == list(range(21))
    spark.catalog.clearCache()


def test_schedule_candidates_seen_dedup_equivalence(spark):
    """Folding the seen-set anti-join into the skinny section must give
    exactly anti-join-then-schedule (robots gate and seen filter
    commute), with the Bloom prefilter on and off."""
    from docrawl_spark.operators.dedup import anti_join_seen, build_seen_bloom
    from docrawl_spark.plans.wave import schedule_candidates

    cands = spark.range(2000).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
        F.concat(
            F.lit("https://h"), (F.col("id") % 11).cast("string"),
            F.lit(".test/p"), F.col("id").cast("string"),
        ).alias("url"),
        F.concat(F.lit("h"), (F.col("id") % 11).cast("string"), F.lit(".test")).alias("host"),
        F.xxhash64(F.concat(F.lit("h"), (F.col("id") % 11).cast("string"))).alias("host_hash"),
        F.lit(1).alias("depth"),
        F.col("id").alias("parent_rank"),
        (F.col("id") % 31).cast("int").alias("offset"),
        F.lit("x").alias("discovered_by"),
    )
    hosts = spark.range(11).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".test")).alias("host"),
        F.lit(5).alias("budget"),
        F.lit("").alias("robots_blob"),
    )
    seen = spark.range(0, 2000, 3).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash")
    )
    expected = {
        (r["url"], r["_wave_rank"])
        for r in schedule_candidates(
            anti_join_seen(cands, seen), hosts
        ).collect()
    }
    assert len(expected) == 11 * 5
    for blob in (None, build_seen_bloom(seen, expected_items=700)):
        got = {
            (r["url"], r["_wave_rank"])
            for r in schedule_candidates(
                cands, hosts, seen=seen, bloom=blob
            ).collect()
        }
        assert got == expected
    spark.catalog.clearCache()


def test_schedule_candidates_host_priority_reorders_not_reselects(spark):
    """host_priority (e.g. pagerank_hosts output) must change ONLY the
    inter-host global visit order: the selected set and the per-host
    politeness budgets are identical to the default run, and every url
    of a higher-priority host ranks before every url of a lower one."""
    from docrawl_spark.plans.wave import schedule_candidates

    cands = spark.range(200).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
        F.concat(
            F.lit("https://h"), (F.col("id") % 3).cast("string"),
            F.lit(".test/p"), F.col("id").cast("string"),
        ).alias("url"),
        F.concat(F.lit("h"), (F.col("id") % 3).cast("string"), F.lit(".test")).alias("host"),
        F.xxhash64(
            F.concat(F.lit("h"), (F.col("id") % 3).cast("string"), F.lit(".test"))
        ).alias("host_hash"),
        F.col("id").alias("parent_rank"),
        (F.col("id") % 31).cast("int").alias("offset"),
    )
    hosts = spark.range(3).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".test")).alias("host"),
        F.lit(4).alias("budget"),
        F.lit("").alias("robots_blob"),
    )
    prio = spark.createDataFrame(
        [("h2.test", 900), ("h0.test", 500), ("h1.test", 100)],
        "host string, priority long",
    )
    base = schedule_candidates(cands, hosts, rank_col="visit_rank")
    pri = schedule_candidates(cands, hosts, rank_col="visit_rank", host_priority=prio)
    b = {r["url_hash"]: r for r in base.collect()}
    p = {r["url_hash"]: r for r in pri.collect()}
    assert set(b) == set(p)  # same selected set
    # ranks dense in both
    assert sorted(r["visit_rank"] for r in b.values()) == list(range(len(b)))
    assert sorted(r["visit_rank"] for r in p.values()) == list(range(len(p)))
    # priority run: h2 block first, then h0, then h1
    by_host = {}
    for r in p.values():
        by_host.setdefault(r["host"], []).append(r["visit_rank"])
    assert max(by_host["h2.test"]) < min(by_host["h0.test"])
    assert max(by_host["h0.test"]) < min(by_host["h1.test"])
    # within a host, the default order (parent_rank) is preserved
    h2 = sorted(
        (r["visit_rank"], r["parent_rank"]) for r in p.values() if r["host"] == "h2.test"
    )
    assert [x[1] for x in h2] == sorted(x[1] for x in h2)


def test_schedule_candidates_fractional_priority(spark):
    """Sitemap-style fractional priorities (0.0-1.0 doubles) must still
    reorder hosts — micro-unit scaling regression (a bare long cast
    floored them all to 0 and the feature no-opped)."""
    from docrawl_spark.plans.wave import schedule_candidates

    cands = spark.range(60).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
        F.concat(F.lit("https://f"), (F.col("id") % 2).cast("string"),
                 F.lit(".test/p"), F.col("id").cast("string")).alias("url"),
        F.concat(F.lit("f"), (F.col("id") % 2).cast("string"), F.lit(".test")).alias("host"),
        F.xxhash64(F.concat(F.lit("f"), (F.col("id") % 2).cast("string"), F.lit(".test"))).alias("host_hash"),
        F.col("id").alias("parent_rank"),
        F.lit(0).alias("offset"),
    )
    hosts = spark.range(2).select(
        F.concat(F.lit("f"), F.col("id").cast("string"), F.lit(".test")).alias("host"),
        F.lit(5).alias("budget"),
        F.lit("").alias("robots_blob"),
    )
    prio = spark.createDataFrame(
        [("f0.test", 0.1), ("f1.test", 0.9)], "host string, priority double"
    )
    out = schedule_candidates(cands, hosts, rank_col="visit_rank", host_priority=prio)
    by_host = {}
    for r in out.collect():
        by_host.setdefault(r["host"], []).append(r["visit_rank"])
    assert max(by_host["f1.test"]) < min(by_host["f0.test"])


def test_anchor_index_phase1_window_is_salted(spark):
    """Skew safety twin of the politeness test: the anchor index's
    first window must partition by (target, _salt) so a viral target
    with 10^7 distinct anchor terms spreads over n_salts tasks; the
    exact phase-2 window then sees <= n_salts*k rows per target."""
    import re

    from docrawl_spark.operators.links import anchor_term_index

    links = spark.createDataFrame(
        [("https://t.test/p", "click here now")] * 4, "url string, anchor_text string"
    )
    plan = plan_of(anchor_term_index(links, k=3), mode="extended")
    w = re.search(r"windowspecdefinition\(target[^)]*_salt", plan)
    assert w, "anchor phase-1 window no longer partitioned by (target, _salt)"


def test_anchor_index_salted_equals_unsalted_topk(spark):
    """The two-phase salted top-k must return EXACTLY the single-window
    result (rank included) on a term distribution with count ties."""
    import itertools

    from pyspark.sql import Window

    from docrawl_spark.operators.links import anchor_term_index

    rows = [
        (f"https://t.test/p{i % 3}", " ".join(words))
        for i, words in enumerate(
            itertools.islice(itertools.permutations("abcdefg", 3), 60)
        )
    ]
    links = spark.createDataFrame(rows, "url string, anchor_text string")
    got = {
        (r["target"], r["term"], r["n"], r["rank"])
        for r in anchor_term_index(links, k=4, n_salts=5).collect()
    }
    # unsalted reference: one exact window
    terms = F.explode(F.split(F.col("anchor_text"), " ")).alias("term")
    counts = (
        links.select(F.col("url").alias("target"), terms)
        .groupBy("target", "term")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("target").orderBy(F.col("n").desc(), F.col("term").asc())
    want = {
        (r["target"], r["term"], r["n"], r["rank"])
        for r in counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 4)
        .collect()
    }
    assert got == want


def test_new_schedulers_are_window_free(spark):
    """The round-3 scheduler/graph operators promise HashAggregate
    max/join resolution instead of windows: a Window here would be a
    skew exposure on a hot host at 10^10 frontier scale."""
    for name in (
        "robots_refetch",
        "circuit_breaker",
        "host_lang_profile",
        "pmi_collocations",
    ):
        plan = plan_of(dq.queries()[name](spark, SF))
        assert "Window" not in plan, f"{name} plan grew a Window:\n{plan}"

    # graph operators checked directly (the shared synthetic-graph PREP
    # legitimately uses the range-partitioned rank's bounded window)
    from docrawl_spark.datapipe.graph import (
        host_edges,
        host_reciprocity,
        opic_hosts,
        trustrank_hosts,
    )

    nodes = spark.createDataFrame([("a",), ("b",), ("c",)], "host string")
    links = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src_host string, dst_host string"
    )
    edges = host_edges(links)
    for label, df in (
        ("opic", opic_hosts(edges, nodes, n_iter=2)),
        ("trustrank", trustrank_hosts(edges, nodes, nodes, n_iter=2)),
        ("reciprocity", host_reciprocity(edges)),
    ):
        plan = plan_of(df)
        assert "Window" not in plan, f"{label} plan grew a Window:\n{plan}"


def test_classify_blocks_is_shuffle_free(spark):
    """Block classification is a pure per-row pipeline (split →
    posexplode → exprs): any Exchange before the caller's aggregate
    would shuffle the full block table for nothing."""
    from docrawl_spark.datapipe.boilerplate import classify_blocks

    pages = dq._docs_as_pages(spark, SF)
    plan = plan_of(classify_blocks(pages))
    assert "Exchange" not in plan, plan


def test_feed_entries_is_shuffle_free(spark):
    """Feed parsing is from_xml + explode over the feed-corpus scan."""
    from docrawl_spark.operators.feeds import feed_entries

    feeds = spark.createDataFrame(
        [("h", "<rss><channel></channel></rss>")], "host string, feed_xml string"
    )
    plan = plan_of(feed_entries(feeds, keep_cols=["host"]))
    assert "Exchange" not in plan, plan


def test_semantic_dedup_plan_and_greedy_reference(spark):
    """SemDeDup's two scale invariants: (1) the centroid join is a
    broadcast of the k-row centroid table (never a shuffle of the
    corpus against it) feeding a HashAggregate argmax — no
    SortAggregate demotion, no Window; (2) the pair stage is an
    equi-join on cluster_id, never a corpus cartesian. Values: the
    kept set must equal a pure-Python greedy keep-lowest-id reference
    over the same assignment."""
    import math

    from docrawl_spark.datapipe.dedup import semantic_dedup
    from docrawl_spark.datapipe.similarity import centroid_assign_exact

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = dq._semantic_centroids(spark, SF)

    assign = centroid_assign_exact(emb, cents)
    aplan = plan_of(assign)
    assert "BroadcastNestedLoopJoin" in aplan or "BroadcastExchange" in aplan
    # the argmax is the packed-BIGINT HashAggregate, not a per-vector
    # window and not a SortAggregate demotion (the only Window allowed
    # is the 8-row centroid labeling under its TakeOrderedAndProject)
    assert "HashAggregate" in aplan
    assert "SortAggregate" not in aplan
    assert aplan.count("- Window") <= 1

    out = semantic_dedup(emb, cents, threshold=0.4)
    plan = plan_of(out)
    assert "CartesianProduct" not in plan
    assert "cluster_id" in plan  # the bounded equi-join key

    # pure-Python reference on the collected fixture
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb.collect()}
    cvs = {r["cent_id"]: [float(x) for x in r["cent_vec"]] for r in cents.collect()}

    def cos6(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        if na == 0 or nb == 0:
            return 0.0
        return round(sum(x * y for x, y in zip(a, b)) / (na * nb), 6)

    ref_assign = {}
    for vid, v in vecs.items():
        best = max(cvs, key=lambda c: (cos6(v, cvs[c]), -c))
        ref_assign[vid] = best
    ref_kept = {}
    for vid in sorted(vecs):
        cl = ref_assign[vid]
        dup = any(
            ref_assign[o] == cl and cos6(vecs[o], vecs[vid]) >= 0.4
            for o in sorted(vecs)
            if o < vid
        )
        ref_kept[vid] = not dup

    got = {(r["vec_id"]): (r["cluster_id"], r["kept"]) for r in out.collect()}
    assert got == {v: (ref_assign[v], ref_kept[v]) for v in vecs}
    assert any(not k for _, k in got.values())  # threshold actually bites


def test_doc_keywords_shapes_and_reference(spark):
    """TF-IDF keywords: integer-exact scores (no floats anywhere in the
    schema), HashAggregate tf/df stages, per-doc top-3 with
    lexicographic tie-break verified against a pure-Python reference."""
    from collections import Counter

    from docrawl_spark.datapipe.text import doc_keywords

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = doc_keywords(docs, k=3, min_len=2)
    assert all(f.dataType.simpleString() != "double" for f in out.schema.fields)
    plan = plan_of(out)
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan

    rows = docs.select("doc_id", "text").collect()
    n = len(rows)
    tf = {}
    for r in rows:
        toks = [t for t in r["text"].strip().lower().split() if len(t) >= 2]
        for t_, c in Counter(toks).items():
            tf[(r["doc_id"], t_)] = c
    dfreq = Counter(t_ for (_, t_) in tf)
    got = {(r["doc_id"], r["token"]): (r["tf"], r["idf_bits"], r["score"], r["rnk"])
           for r in out.collect()}
    # spot-verify every returned row against the reference scoring
    for (did, tok), (tfv, bits, score, rnk) in got.items():
        assert tf[(did, tok)] == tfv
        assert bits == (n // dfreq[tok]).bit_length()
        assert score == tfv * bits
        assert 1 <= rnk <= 3
    # per-doc the kept set is the reference top-3
    by_doc = {}
    for (did, tok), c in tf.items():
        bits = (n // dfreq[tok]).bit_length()
        by_doc.setdefault(did, []).append((-c * bits, tok))
    for did, scored in by_doc.items():
        want = {t for _, t in sorted(scored)[:3]}
        have = {tok for (d, tok) in got if d == did}
        assert have == want, (did, have, want)


def test_script_profile_is_shuffle_free_and_exact(spark):
    """Script detection is row-local JVM regexp counting — no Exchange;
    counts verified on a handwritten multilingual row."""
    from docrawl_spark.datapipe.text import script_profile

    df = spark.createDataFrame(
        [(1, "abc 你好 12"), (2, "你好你好"), (3, "")],
        "doc_id long, text string",
    )
    plan = plan_of(script_profile(df))
    assert "Exchange" not in plan, plan
    got = {r["doc_id"]: r.asDict() for r in script_profile(df).collect()}
    assert got[1]["n_latin"] == 3 and got[1]["n_han"] == 2
    assert got[1]["n_digit"] == 2 and got[1]["n_space"] == 2
    assert got[1]["dominant"] == "latin"
    assert got[2]["dominant"] == "han" and got[2]["han_ppm"] == 1000000
    assert got[3]["n_chars_total"] == 0 and got[3]["dominant"] == "latin"


def test_soft404_broadcasts_template_side(spark):
    """The soft-404 probe must be a broadcast-hash lookup per page —
    never a shuffle of the page table — and must flag exactly the
    200-status pages whose body equals a same-host 404 body."""
    from docrawl_spark.operators.traps import soft404_flags

    pages = spark.createDataFrame(
        [
            (1, "a", 404, "oops   Not Found"),
            (2, "a", 200, "OOPS not  found"),   # normalizes equal -> soft
            (3, "a", 200, "real content"),
            (4, "b", 200, "oops not found"),    # host b has no 404 template
        ],
        "doc_id long, host string, status int, text string",
    )
    out = soft404_flags(pages)
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    got = {r["doc_id"]: r["soft_404"] for r in out.collect()}
    assert got == {2: True, 3: False, 4: False}


def test_host_components_multi_component(spark):
    """The sparse host graph must yield a REAL partition (>1 component)
    and agree with a pure-Python union-find over the same edges."""
    out = dq.q_host_components(spark, SF).collect()
    comps = {r["host"]: r["component"] for r in out}
    assert len(set(comps.values())) > 1
    # every component label is the lexicographic min of its members
    members = {}
    for h, c in comps.items():
        members.setdefault(c, []).append(h)
    for c, hs in members.items():
        assert c == min(hs + [c])


def test_pagination_chains_normalizes_layouts(spark):
    """Both param layouts of one listing must collapse to ONE series
    key; position/first/last follow page order; non-paginated URLs are
    excluded."""
    from docrawl_spark.operators.links import pagination_chains

    df = spark.createDataFrame(
        [
            (1, "https://h.test/l?page=2&sort=asc"),
            (2, "https://h.test/l?sort=asc&page=1"),
            (3, "https://h.test/l?sort=asc&page=10"),
            (4, "https://h.test/other"),
            (5, "https://h.test/l?sort=desc&page=1"),  # different series
        ],
        "doc_id long, url string",
    )
    rows = {r["doc_id"]: r.asDict() for r in pagination_chains(df).collect()}
    assert 4 not in rows
    assert rows[1]["series_key"] == rows[2]["series_key"] == rows[3]["series_key"]
    assert rows[5]["series_key"] != rows[1]["series_key"]
    assert (rows[2]["pos"], rows[1]["pos"], rows[3]["pos"]) == (1, 2, 3)
    assert rows[2]["is_first"] and rows[3]["is_last"] and not rows[1]["is_first"]
    assert rows[3]["page_no"] == 10 and rows[1]["chain_len"] == 3
    assert rows[5]["chain_len"] == 1 and rows[5]["is_first"] and rows[5]["is_last"]


def test_url_template_generalization(spark):
    """Hex runs (>=8 chars) generalize before digit runs; short hex
    stays literal; (host, template) aggregation is exact: n_pages vs
    n_paths separates refetch pressure from template breadth."""
    from docrawl_spark.operators.links import url_template_profile

    rows = [
        ("h.test", "/doc/123", 10),
        ("h.test", "/doc/456", 20),
        ("h.test", "/doc/456", 30),          # duplicate concrete path
        ("h.test", "/a/deadbeefcafe0123", 40),   # 16 hex chars -> {h}
        ("h.test", "/a/beef", 50),           # 4 hex chars -> literal
        ("h.test", "/archive/2024/7", 60),
    ]
    df = spark.createDataFrame(rows, "host string, path string, n long")
    out = {
        r["template"]: r
        for r in url_template_profile(df, yield_col="n").collect()
    }
    assert set(out) == {"/doc/{d}", "/a/{h}", "/a/beef", "/archive/{d}/{d}"}
    d = out["/doc/{d}"]
    assert (d["n_pages"], d["n_paths"], d["sum_yield"]) == (3, 2, 60)
    assert d["example_path"] == "/doc/123"
    assert d["yield_per_page"] == 20
    assert out["/a/{h}"]["n_pages"] == 1


def test_outlink_diversity_spam_vs_organic(spark):
    """A link farm (many edges, one registrable domain) must score a
    LOW diversity_ppm; an organic host spreading across domains scores
    high; self-links and subdomain collapse are counted exactly."""
    from docrawl_spark.functions.domains import suffix_dim
    from docrawl_spark.operators.links import outlink_diversity

    edges = [
        # farm: 4 edges, all land in example.com (two via subdomains)
        ("farm.test", "example.com"),
        ("farm.test", "a.example.com"),
        ("farm.test", "b.example.com"),
        ("farm.test", "example.com"),
        # organic: 4 edges, 3 domains + 1 self-link
        ("org.test", "example.com"),
        ("org.test", "w.example.co.uk"),
        ("org.test", "n1.org"),
        ("org.test", "org.test"),
    ]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    out = {
        r["src_host"]: r
        for r in outlink_diversity(df, suffix_dim(spark)).collect()
    }
    farm, org = out["farm.test"], out["org.test"]
    assert (farm["n_outlinks"], farm["n_dst_hosts"], farm["n_dst_domains"]) == (4, 3, 1)
    assert farm["diversity_ppm"] == 250000 and farm["self_ppm"] == 0
    assert (org["n_dst_domains"], org["self_ppm"]) == (4, 250000)
    assert org["diversity_ppm"] > farm["diversity_ppm"]


def test_rendezvous_shard_properties(spark):
    """HRW sharding: (1) every host lands in [0, n); (2) resizing
    n -> n+1 moves ONLY hosts won by the new shard, and each moved
    host moves TO that shard; (3) the moved fraction is ~1/(n+1);
    (4) loads are balanced; (5) the argmax folds as a codegen
    HashAggregate (packed BIGINT, not a struct max)."""
    from docrawl_spark.operators.sharding import (
        rendezvous_assign,
        rendezvous_rebalance_plan,
    )

    hosts = spark.range(2000).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".test")).alias(
            "host"
        )
    )
    plan = rendezvous_rebalance_plan(hosts, 16, 17).collect()
    assert len(plan) == 2000
    assert all(0 <= r["shard_a"] < 16 and 0 <= r["shard_b"] < 17 for r in plan)
    moved = [r for r in plan if r["moved"]]
    # every moved host lands on the NEW shard (id 16) — the HRW law
    assert moved and all(r["shard_b"] == 16 for r in moved)
    # unmoved hosts keep their exact shard id
    assert all(r["shard_a"] == r["shard_b"] for r in plan if not r["moved"])
    # E[moved] = 2000/17 ~ 118, sigma ~ 10.5 -> generous 6-sigma band
    assert 55 <= len(moved) <= 185
    # balance: 2000 hosts over 16 shards, mean 125, md5-uniform
    from collections import Counter

    loads = Counter(r["shard_a"] for r in plan)
    assert len(loads) == 16 and max(loads.values()) < 190

    a1 = {r["host"]: r["shard"] for r in rendezvous_assign(hosts, 16).collect()}
    a2 = {r["host"]: r["shard"] for r in rendezvous_assign(hosts, 16).collect()}
    assert a1 == a2  # deterministic

    agg_plan = rendezvous_assign(hosts, 16)._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in agg_plan and "SortAggregate" not in agg_plan


def test_rendezvous_rejects_oversize_fleet(spark):
    from docrawl_spark.operators.sharding import rendezvous_assign

    hosts = spark.range(1).select(F.lit("a.test").alias("host"))
    with pytest.raises(ValueError):
        rendezvous_assign(hosts, 1025)
    with pytest.raises(ValueError):
        rendezvous_assign(hosts, 0)


def test_domain_quota_sample_caps_and_salting(spark):
    """Subdomains collapse into one capped eTLD+1 pool; quality-desc /
    id-asc selection is exact; the phase-1 window is salted (skew
    guard) and phase-2 exact."""
    from docrawl_spark.datapipe.sampling import domain_quota_sample
    from docrawl_spark.functions.domains import suffix_dim

    rows = [
        # 6 docs across two subdomains of example.com, quality = id*10
        *[(i, f"s{i % 2}.example.com", i * 10) for i in range(6)],
        # a github.io site is its OWN registrable domain
        (100, "a.github.io", 1),
        (101, "a.github.io", 2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, host string, quality long")
    out = domain_quota_sample(df, suffix_dim(spark), k=3)
    got = {
        r["domain"]: []
        for r in out.collect()
    }
    for r in sorted(out.collect(), key=lambda r: (r["domain"], r["domain_rank"])):
        got[r["domain"]].append((r["doc_id"], r["domain_rank"]))
    # example.com keeps its 3 best by quality desc: ids 5,4,3
    assert got["example.com"] == [(5, 1), (4, 2), (3, 3)]
    assert got["a.github.io"] == [(101, 1), (100, 2)]

    plan = out._jdf.queryExecution().executedPlan().toString()
    import re as _re

    assert _re.search(r"windowspecdefinition\(domain[^)]*_salt", plan) or (
        "_salt" in plan and "domain" in plan
    )


def test_margin_bitext_is_bucket_joined(spark):
    """Margin mining must stay on the SRP candidate path: equi-join on
    the probe key, no cartesian/nested-loop cross-side join, and the
    explicit fan-out repartition present (AQE-coalesce guard)."""
    plan = plan_of(dq.q_margin_bitext(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "_probe" in plan  # the bucket equi-join key


def test_quality_classifier_broadcasts_weights(spark):
    """The model dim is bucket-count-sized — it must reach the join as
    a broadcast, and the per-doc score must be a HashAggregate."""
    plan = plan_of(dq.q_quality_classifier(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan


def test_doc_sections_single_doc_window(spark):
    """Section assignment is ONE running window partitioned by doc_id
    (page-bounded partitions) + one rollup — no joins, no cartesian."""
    plan = plan_of(dq.q_doc_sections(spark, SF))
    assert plan.count("Window") >= 1
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_triangle_family_no_cartesian(spark):
    """Oriented triangle enumeration and both peels stay equi-joined —
    a cartesian/nested-loop anywhere means the orientation broke.
    (Asserted on the operators over a plain edge frame; the driver
    query's fixture derivation adds a benign single-row count
    crossJoin that would trip the check.)"""
    from docrawl_spark.datapipe.graph import (
        host_triangles,
        kcore_members,
        ktruss_edges,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")],
        "src_host string, dst_host string",
    )
    nodes = spark.createDataFrame([(h,) for h in "abcd"], "host string")
    plans = {
        "triangles": plan_of(host_triangles(edges, nodes)),
        "ktruss": plan_of(ktruss_edges(edges, k=3, n_rounds=2)),
        "kcore": plan_of(kcore_members(edges, nodes, k=2, n_rounds=2)),
    }
    for name, plan in plans.items():
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_lsh_probe_is_band_equi_join(spark):
    plan = plan_of(dq.q_lsh_incremental_probe(spark, SF))
    assert "CartesianProduct" not in plan
    assert "band_key" in plan


def test_bucketed_band_index_probe_is_exchange_free_on_index_side(spark, tmp_path):
    """The incremental-dedup scale claim (dedup.lsh_probe_index
    docstring): a corpus band index written bucketed+sorted by
    band_key joins the batch's band rows with NO Exchange on the
    index side — the corpus-sized shuffle is paid once at index-build
    time, then every crawl wave probes for the price of shuffling its
    own batch."""
    from pyspark.sql import functions as F

    from docrawl_spark.datapipe.dedup import lsh_probe_index, minhash_band_index

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta tok{i % 7} epsilon") for i in range(60)],
        "doc_id long, text string",
    )
    corpus = docs.where(F.col("doc_id") % 3 != 0)
    batch = docs.where(F.col("doc_id") % 3 == 0)
    idx = minhash_band_index(corpus, n_hashes=8, n_bands=4, hash_mode="md5hex")
    spark.sql("DROP TABLE IF EXISTS bt_band_index")
    (
        idx.write.bucketBy(8, "band_key")
        .sortBy("band_key")
        .option("path", str(tmp_path / "bt_band_index"))
        .mode("overwrite")
        .saveAsTable("bt_band_index")
    )
    stored = spark.table("bt_band_index")
    probed = lsh_probe_index(
        batch, stored.hint("merge"), n_hashes=8, n_bands=4, hash_mode="md5hex"
    )
    plan = plan_of(probed, mode="simple")
    assert "SortMergeJoin" in plan
    # the bucketed scan must actually engage (Spark silently disables
    # it when join keys are wider than the bucket spec — the reason
    # band_idx is folded into band_key)
    assert "Bucketed: true" in plan
    # exactly THREE Exchanges, all batch-sized: the batch's signature
    # aggregation (by doc_id), its band rows into the bucket layout,
    # and the final distinct. The index side feeds the join from its
    # buckets with no shuffle.
    assert plan.count("Exchange hashpartitioning") == 3
    assert plan.count("Exchange") == 3
    # and the bucketed probe returns exactly what the in-memory one does
    live = {
        (r["new_id"], r["corpus_id"])
        for r in lsh_probe_index(
            batch, idx, n_hashes=8, n_bands=4, hash_mode="md5hex"
        ).collect()
    }
    got = {(r["new_id"], r["corpus_id"]) for r in probed.collect()}
    assert got == live and len(got) > 0
    spark.sql("DROP TABLE bt_band_index")


def test_triplet_mining_is_bucket_joined(spark):
    """Triplet candidates must come from the SRP probe equi-join —
    never an anchors x corpus cross — and the per-anchor argmax must
    stay a codegen HashAggregate (the packed-BIGINT design), not a
    struct-min SortAggregate demotion."""
    from docrawl_spark.datapipe.similarity import triplet_mining

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = plan_of(triplet_mining(emb, dim=64))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "_probe" in plan  # the bucket equi-join key
    assert "SortAggregate" not in plan


def test_kmv_mins_salted_two_phase_and_pair_join_shape(spark):
    """kmv_mins must run the salted two-phase top-k (phase-1 window
    partitioned by (g, h % 17) so a hot group spreads over salts), and
    kmv_pair_overlap's member-to-mins join must be a hash equi-join on
    g — the only nested-loop is the groups-dim pair cross (dim x dim,
    documented benign)."""
    from docrawl_spark.functions.sketches import kmv_mins, kmv_pair_overlap

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    mins = kmv_mins(docs.select("source", "text"), "source", "text", k=16)
    p1 = plan_of(mins)
    assert "pmod" in p1 or "% 17" in p1  # salted phase-1 partition key
    assert p1.count("RunningWindowFunction") >= 1 or "Window" in p1
    pairs = kmv_pair_overlap(mins, k=16)
    p2 = plan_of(pairs)
    assert "CartesianProduct" not in p2  # pair cross broadcasts (dim)
    assert "BroadcastHashJoin" in p2 or "SortMergeJoin" in p2


def test_schedule_wave_matches_compositional_path(spark):
    """The integrated hash-only wave (plans/wave.schedule_wave: gate +
    hash-keyed dedup + anti-join + budgets + rank + pack-keyed rejoin)
    must reproduce dedup_within_wave → anti_join_seen →
    schedule_candidates exactly — duplicates present, bloom on/off."""
    from docrawl_spark.operators.dedup import anti_join_seen, build_seen_bloom
    from docrawl_spark.operators.links import dedup_within_wave
    from docrawl_spark.plans.wave import schedule_candidates, schedule_wave

    # 3 occurrences of each url with distinct (parent_rank, offset) —
    # keep-first must pick the smallest — plus hot-host skew
    base = spark.range(3000).select(
        (F.col("id") % 1000).alias("uid"),
        F.col("id").alias("parent_rank"),
        (F.col("id") % 29).cast("int").alias("offset"),
    )
    from docrawl_spark.functions.canon import url_hash_col

    url = F.concat(
        F.lit("https://h"), (F.col("uid") % 13).cast("string"),
        F.lit(".test/p"), F.col("uid").cast("string"),
    )
    host = F.concat(F.lit("h"), (F.col("uid") % 13).cast("string"), F.lit(".test"))
    cands = base.select(
        url_hash_col(url).alias("url_hash"),
        url.alias("url"),
        host.alias("host"),
        url_hash_col(host).alias("host_hash"),
        F.lit(1).alias("depth"),
        "parent_rank",
        "offset",
        F.concat(F.lit("parent"), F.col("parent_rank").cast("string")).alias("discovered_by"),
    )
    hosts = spark.range(13).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".test")).alias("host"),
        F.lit(4).alias("budget"),
        F.when(F.col("id") % 3 == 0, F.lit("/p1")).otherwise(F.lit("")).alias("robots_blob"),
    )
    seen = spark.range(0, 1000, 4).select(
        url_hash_col(
            F.concat(
                F.lit("https://h"), (F.col("id") % 13).cast("string"),
                F.lit(".test/p"), F.col("id").cast("string"),
            )
        ).alias("url_hash")
    )
    # compositional reference: dedup_within_wave drops discovered_by,
    # so compare the shared columns (lineage is restored relationally
    # by run_crawl; schedule_wave carries it through directly)
    ref = {
        tuple(r)
        for r in schedule_candidates(
            dedup_within_wave(cands), hosts, seen=seen
        ).select("url_hash", "url", "host", "parent_rank", "offset", "_wave_rank").collect()
    }
    assert ref, "reference selection is empty — fixture broken"
    for blob in (None, build_seen_bloom(seen, expected_items=300)):
        got_df = schedule_wave(cands, hosts, seen=seen, bloom=blob)
        got = {
            tuple(r)
            for r in got_df.select(
                "url_hash", "url", "host", "parent_rank", "offset", "_wave_rank"
            ).collect()
        }
        assert got == ref
    # discovered_by comes back from the KEPT occurrence (its parent)
    lineage = {
        (r["parent_rank"], r["discovered_by"])
        for r in schedule_wave(cands, hosts, seen=seen).collect()
    }
    assert all(d == f"parent{p}" for p, d in lineage)
    spark.catalog.clearCache()


def test_schedule_wave_no_exchange_carries_strings(spark):
    """THE at-scale invariant of the integrated wave: no Exchange in
    the whole plan — dedup groupBy, anti-join, both politeness
    windows, the rank range-repartition — ships the url or
    discovered_by string; the payload re-enters through the ranked
    keys' broadcast only."""
    from docrawl_spark.plans.wave import schedule_wave

    cands = spark.range(2000).select(
        F.xxhash64((F.col("id") % 700).cast("string")).alias("url_hash"),
        F.concat(
            F.lit("https://h"), (F.col("id") % 7).cast("string"),
            F.lit(".test/p"), (F.col("id") % 700).cast("string"),
        ).alias("url"),
        F.concat(F.lit("h"), (F.col("id") % 7).cast("string"), F.lit(".test")).alias("host"),
        F.xxhash64(F.concat(F.lit("h"), (F.col("id") % 7).cast("string"))).alias("host_hash"),
        F.lit(1).alias("depth"),
        F.col("id").alias("parent_rank"),
        (F.col("id") % 31).cast("int").alias("offset"),
        F.lit("x").alias("discovered_by"),
    )
    hosts = spark.range(7).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".test")).alias("host"),
        F.lit(3).alias("budget"),
        F.lit("").alias("robots_blob"),
    )
    seen = spark.range(0, 700, 5).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash")
    )
    out = schedule_wave(cands, hosts, seen=seen)
    plan = plan_of(out)
    blocks = plan.split("\n\n")
    shuffles = [b for b in blocks if ") Exchange" in b]
    assert shuffles, "expected shuffle exchanges in the wave plan"
    for b in shuffles:
        assert "url#" not in b, f"url string rides an exchange:\n{b}"
        assert "discovered_by#" not in b, f"payload rides an exchange:\n{b}"
    spark.catalog.clearCache()


def test_schedule_wave_exchanges_are_hash_minimal(spark):
    """Round-4 tightening of the wave's shuffle shape (plans/wave.py):

    - NO exchange carries ``_budget`` (broadcast-joined after each
      politeness window) or the decoded ``parent_rank``/``offset``
      columns (windows and rank order on ``shiftright(_pack, 5)``);
    - the seen anti-join REUSES the dedup aggregate's url_hash
      partitioning: exactly two url_hash-keyed exchanges exist in the
      whole plan (the dedup shuffle + the seen side) — a third would
      mean the candidate side re-exchanged, the regression a
      pandas-UDF probe column in the join path causes (see
      operators/dedup.anti_join_seen)."""
    from docrawl_spark.plans.wave import schedule_wave

    # NB: host_hash MUST be xxhash64 of the FULL host string — the
    # budget dim recomputes url_hash_col(host) and joins on it
    cands = spark.range(2000).select(
        F.xxhash64((F.col("id") % 700).cast("string")).alias("url_hash"),
        F.concat(
            F.lit("https://h"), (F.col("id") % 7).cast("string"),
            F.lit(".test/p"), (F.col("id") % 700).cast("string"),
        ).alias("url"),
        F.concat(F.lit("h"), (F.col("id") % 7).cast("string"), F.lit(".test")).alias("host"),
        F.xxhash64(
            F.concat(F.lit("h"), (F.col("id") % 7).cast("string"), F.lit(".test"))
        ).alias("host_hash"),
        F.lit(1).alias("depth"),
        F.col("id").alias("parent_rank"),
        (F.col("id") % 31).cast("int").alias("offset"),
        F.lit("x").alias("discovered_by"),
    )
    hosts = spark.range(7).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".test")).alias("host"),
        F.lit(3).alias("budget"),
        F.lit("").alias("robots_blob"),
    )
    seen = spark.range(0, 700, 5).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash")
    )
    out = schedule_wave(cands, hosts, seen=seen)
    plan = plan_of(out)
    blocks = plan.split("\n\n")
    shuffles = [b for b in blocks if ") Exchange" in b]
    assert shuffles, "expected shuffle exchanges in the wave plan"
    for b in shuffles:
        assert "_budget#" not in b, f"budget rides an exchange:\n{b}"
        assert "parent_rank#" not in b, f"parent_rank rides an exchange:\n{b}"
        assert "offset#" not in b, f"offset rides an exchange:\n{b}"
    # explain("formatted") prints the AQE initial AND final plans, so
    # the same logical exchange appears twice — dedupe on the
    # (Input, partitioning) signature before counting
    url_hash_keyed = {
        re.sub(r"\(\d+\) |, \[plan_id=\d+\]|#\d+", "", b)
        for b in shuffles
        if "hashpartitioning(url_hash" in b
    }
    assert len(url_hash_keyed) == 2, (
        f"expected exactly 2 distinct url_hash exchanges (dedup + seen "
        f"side), got {len(url_hash_keyed)}:\n" + "\n---\n".join(url_hash_keyed)
    )
    # and the selection itself stays correct under the hash-only shape
    rows = out.collect()
    assert len(rows) == 7 * 3
    spark.catalog.clearCache()
