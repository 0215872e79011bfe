"""Crawl-trap detection (operators/traps), the Crawl-delay dispatch
timeline (politeness.schedule_timeline), and gap sessionization
(streaming/sessions) — unit semantics; cross-engine parity is in
test_oracle_parity (trap_signatures / trap_gate_survivors /
politeness_schedule / events_sessions)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from docrawl_spark.operators.traps import (
    flag_traps,
    path_cycle_col,
    trap_gate,
    url_signature_col,
)


def _sig(spark, url: str) -> str:
    return (
        spark.range(1)
        .select(url_signature_col(F.lit(url)).alias("s"))
        .first()["s"]
    )


def test_url_signature_templates(spark):
    # digit runs collapse per segment; query values drop, keys sort
    assert _sig(spark, "https://h.test/cal/2024/05/31?sid=abc&d=x") == (
        "/cal/#/#/#?d&sid"
    )
    # long hex tokens (session ids / uuids / hashes) -> '@'
    assert _sig(spark, "https://h.test/s/deadbeef01/page7") == "/s/@/page#"
    # short hexish token stays a digit-collapsed literal
    assert _sig(spark, "https://h.test/v/beef/x") == "/v/beef/x"
    # no query, trailing slash, mixed text+digits
    assert _sig(spark, "https://h.test/item42/") == "/item#"
    # root
    assert _sig(spark, "https://h.test/") == "/"
    # fragment never reaches the signature
    assert _sig(spark, "https://h.test/a/9#frag") == "/a/#"
    # same template, different values -> same signature
    assert _sig(spark, "https://h.test/cal/1999/1/2?d=9&sid=zz") == (
        "/cal/#/#/#?d&sid"
    )


def test_path_cycle_detection(spark):
    rows = [
        ("https://h.test/a/b/a/b/a/b/p1", True),   # 'a' and 'b' x3
        ("https://h.test/a/b/a/b/p1", False),      # only x2
        ("https://h.test/x/x/x", True),            # same segment x3
        ("https://h.test/doc/5", False),
        ("https://h.test/", False),                # empty path: no cycle
    ]
    df = spark.createDataFrame(rows, "url string, want boolean").select(
        "want", path_cycle_col(F.col("url")).alias("got")
    )
    assert all(r["got"] == r["want"] for r in df.collect())


def _cands(spark):
    rows = (
        # host A: 12 calendar urls (one template) + 3 normal pages
        [
            (f"https://a.test/cal/2024/{m}/1?sid={m}", "a.test", f"p{m % 2}", 2)
            for m in range(12)
        ]
        + [(f"https://a.test/about{i}", "a.test", "p0", 1) for i in range(3)]
        # host B: 12 genuinely distinct templates (letter-only segments —
        # digit-suffixed names would collapse into ONE '/sec#/page' sig,
        # which the detector rightly flags) — no trap
        + [
            (f"https://b.test/{seg}/page", "b.test", "p0", 1)
            for seg in (
                "alpha", "beta", "gamma", "delta", "eps", "zeta",
                "eta", "theta", "iota", "kappa", "lam", "mu",
            )
        ]
        # host C: a cycle url
        + [("https://c.test/a/b/a/b/a/b/x", "c.test", "p0", 3)]
    )
    return spark.createDataFrame(
        rows, "url string, host string, discovered_by string, depth int"
    )


def test_flag_traps_volume_and_share(spark):
    out = flag_traps(_cands(spark), max_urls_per_sig=10, max_host_share=0.5)
    rows = {(r["host"], r["sig"]): r for r in out.collect()}
    trap = rows[("a.test", "/cal/#/#/#?sid")]
    assert trap["is_trap"] and trap["n_urls"] == 12 and trap["n_parents"] == 2
    assert abs(trap["host_share"] - 12 / 15) < 1e-12
    # host B's templates are distinct: every sig n_urls=1, none flagged
    assert not any(
        r["is_trap"] for (h, _), r in rows.items() if h == "b.test"
    )
    # host A's normal pages share a sig but miss the volume bar
    assert not rows[("a.test", "/about#")]["is_trap"]


def test_trap_gate_drops_traps_and_cycles(spark):
    cands = _cands(spark)
    traps = flag_traps(cands, max_urls_per_sig=10, max_host_share=0.5)
    kept = trap_gate(cands, traps)
    urls = {r["url"] for r in kept.collect()}
    assert not any("/cal/" in u for u in urls)          # template dropped
    assert "https://c.test/a/b/a/b/a/b/x" not in urls   # cycle dropped
    assert {f"https://a.test/about{i}" for i in range(3)} <= urls
    assert len(urls) == 3 + 12                           # b.test intact


def test_schedule_timeline_hand_computed(spark):
    from docrawl_spark.operators.politeness import schedule_timeline

    rows = [
        ("h1", 10, 1.5), ("h1", 11, 1.5), ("h1", 12, 1.5),
        ("h2", 20, 0.25),
    ]
    df = spark.createDataFrame(
        rows, "host_hash string, visit_rank long, _crawl_delay double"
    )
    out = {
        (r["host_hash"], r["visit_rank"]): r
        for r in schedule_timeline(df, wave_start_ms=1000).collect()
    }
    assert out[("h1", 10)]["fetch_seq"] == 0
    assert out[("h1", 10)]["scheduled_at_ms"] == 1000
    assert out[("h1", 11)]["scheduled_at_ms"] == 1000 + 1500
    assert out[("h1", 12)]["scheduled_at_ms"] == 1000 + 3000
    assert out[("h2", 20)]["scheduled_at_ms"] == 1000


def test_sessionize_batch_semantics(spark):
    from docrawl_spark.streaming.sessions import sessionize

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1: events at 0,10,25 min (one session: gaps < 30), then
        # +31 min after 25 -> NEW session. An event at EXACTLY last+gap
        # MERGES (Spark convention: touching windows coalesce; a new
        # session needs a STRICTLY greater gap) — user 3 pins that.
        (1, t0), (1, t0 + 10 * m), (1, t0 + 25 * m), (1, t0 + 56 * m),
        # user 2: single event
        (2, t0),
        # user 3: boundary — second event exactly 30 min after the first
        (3, t0), (3, t0 + 30 * m),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = sessionize(df, ["user_id"], gap="30 minutes")
    got = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in out.collect()
    )
    assert got == [
        (1, t0, t0 + 55 * m, 3),                 # end = last(25) + 30
        (1, t0 + 56 * m, t0 + 86 * m, 1),
        (2, t0, t0 + 30 * m, 1),
        (3, t0, t0 + 60 * m, 2),                 # exactly-gap merges
    ]


def test_sessionize_streaming_plan_builds(spark, tmp_path):
    """The SAME sessionize expression must compile as a streaming
    aggregation with a watermark (state-cleanup contract)."""
    from docrawl_spark.streaming.sessions import sessionize

    src = str(tmp_path / "ev")
    spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1))], "user_id long, ts timestamp"
    ).write.parquet(src)
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    out = sessionize(stream, ["user_id"], gap="30 minutes", watermark="1 hour")
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("sess_smoke")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(60)
    finally:
        q.stop()


def test_robots_change_impact_transitions(spark):
    """Verdict-flip planning: newly-blocked and newly-allowed rows both
    surface with the right labels; unchanged rows are dropped; the plan
    is shuffle-free (two row-local gate evaluations)."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from docrawl_spark.operators.politeness import robots_change_impact

    urls = spark.createDataFrame(
        [
            ("https://h.test/a/1",),
            ("https://h.test/b/1",),
            ("https://h.test/c/1",),
        ],
        "url string",
    )
    out = robots_change_impact(
        urls, F.lit("/a"), F.lit("/b")
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    assert "Exchange" not in buf.getvalue()
    got = {r["url"].rsplit("/", 2)[-2]: r["transition"] for r in out.collect()}
    assert got == {"a": "allowed", "b": "blocked"}


def test_sitemap_coverage_counts(spark):
    from docrawl_spark.operators.sitemap import sitemap_coverage

    crawled = spark.createDataFrame(
        [("h", "u1"), ("h", "u2"), ("h", "u3"), ("g", "v1")],
        "host string, url string",
    )
    sm = spark.createDataFrame(
        [("h", "u1"), ("h", "u9"), ("g", "v1")], "host string, url string"
    )
    got = {r["host"]: r.asDict() for r in sitemap_coverage(crawled, sm).collect()}
    assert got["h"]["n_crawled"] == 3 and got["h"]["n_in_sitemap"] == 1
    assert got["h"]["n_organic_only"] == 2 and got["h"]["n_sitemap_only"] == 1
    assert got["h"]["coverage_ppm"] == 333333
    assert got["g"]["coverage_ppm"] == 1000000
