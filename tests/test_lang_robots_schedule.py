"""Unit tests for the crawl-steering language profile
(datapipe.text.host_language_profile) and RFC 9309 robots-cache
scheduling (operators/politeness.robots_cache_schedule) — the edge
cases the sf0.01 oracle pair can't guarantee to exercise: dominant-lang
ties, same-microsecond fetch ties, and the exact 24 h / grace-window
boundaries."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from docrawl_spark.datapipe.text import host_language_profile
from docrawl_spark.operators.politeness import robots_cache_schedule


def test_host_language_profile_dominance_and_tie(spark):
    rows = [
        # host a: 2 en, 1 de -> en dominant, share 666666 ppm
        ("a", "d1", "the cat and the dog of a house"),
        ("a", "d2", "that is a thing in the box"),
        ("a", "d3", "der hund ist nicht ein katze und"),
        # host b: 1 en, 1 de -> tie; lexicographic -> de
        ("b", "d4", "the and of to a in"),
        ("b", "d5", "der die das und ist"),
        # host c: marker-free -> und
        ("c", "d6", "zzz qqq xxx"),
    ]
    df = spark.createDataFrame(rows, "host string, doc_id string, text string")
    out = {
        r["host"]: r
        for r in host_language_profile(df).collect()
    }
    assert out["a"]["dominant_lang"] == "en"
    assert out["a"]["host_docs"] == 3 and out["a"]["dominant_docs"] == 2
    assert out["a"]["dominant_share_ppm"] == 666_666
    assert out["b"]["dominant_lang"] == "de"  # tie -> lexicographic min
    assert out["b"]["dominant_share_ppm"] == 500_000
    assert out["c"]["dominant_lang"] == "und"
    assert out["c"]["dominant_share_ppm"] == 1_000_000


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_robots_cache_schedule_states_and_boundaries(spark):
    as_of = F.to_timestamp(F.lit("2024-02-01 00:00:00"))
    rows = [
        # fresh 200: exactly 24h old -> due (>= boundary), state ok
        ("ok24", _ts("2024-01-31 00:00:00"), 200, 1),
        # 200 just under 24h -> NOT due
        ("fresh", _ts("2024-01-31 00:00:01"), 200, 2),
        # superseded older fetch for the same host must be ignored
        ("fresh", _ts("2024-01-01 00:00:00"), 503, 3),
        # same-microsecond tie: larger fetch_id wins (404 beats 200)
        ("tie", _ts("2024-01-31 12:00:00"), 200, 4),
        ("tie", _ts("2024-01-31 12:00:00"), 404, 5),
        # 5xx inside the grace window -> disallow_all
        ("err", _ts("2024-01-25 00:00:00"), 503, 6),
        # 5xx exactly AT the grace boundary (14d) -> still disallow_all
        ("edge", _ts("2024-01-18 00:00:00"), 500, 7),
        # 5xx past the grace window -> stale_unreachable
        ("stale", _ts("2024-01-10 00:00:00"), 503, 8),
        # 3xx -> ok (final status after redirect chain)
        ("redir", _ts("2024-01-31 18:00:00"), 301, 9),
    ]
    df = spark.createDataFrame(
        rows, "host string, fetched_at timestamp, status int, fetch_id long"
    )
    out = {
        r["host"]: r
        for r in robots_cache_schedule(
            df, as_of, cache_hours=24, unreachable_grace_days=14
        ).collect()
    }
    assert len(out) == 7  # one row per host
    assert out["ok24"]["access_state"] == "ok" and out["ok24"]["refetch_due"]
    assert out["ok24"]["age_hours"] == 24
    assert not out["fresh"]["refetch_due"]
    assert out["fresh"]["last_status"] == 200  # older 503 superseded
    assert out["fresh"]["access_state"] == "ok"
    assert out["tie"]["last_status"] == 404  # max fetch_id wins the tie
    assert out["tie"]["access_state"] == "allow_all"
    assert out["err"]["access_state"] == "disallow_all"
    assert out["edge"]["access_state"] == "disallow_all"  # <= grace
    assert out["stale"]["access_state"] == "stale_unreachable"
    assert out["redir"]["access_state"] == "ok"
    assert not out["redir"]["refetch_due"]


def test_feed_entries_rss_atom_mixed(spark):
    """Format dispatch is a coalesce of the two from_xml parses: RSS
    links come from element text, Atom links from the href attribute;
    a doc parseable as neither yields no rows; blank links drop; entry
    order is document order."""
    from docrawl_spark.operators.feeds import feed_entries

    rss = (
        '<rss version="2.0"><channel>'
        "<item><link>https://a.test/p1</link><title>P1</title>"
        "<pubDate>Mon, 15 Jan 2026 00:00:00 GMT</pubDate><guid>g1</guid></item>"
        "<item><link> https://a.test/p2 </link><title>P2</title>"
        "<pubDate>Tue, 16 Jan 2026 00:00:00 GMT</pubDate><guid>g2</guid></item>"
        "<item><link></link><title>blank</title><pubDate>x</pubDate>"
        "<guid>g3</guid></item>"
        "</channel></rss>"
    )
    atom = (
        '<feed xmlns="http://www.w3.org/2005/Atom">'
        '<entry><link href="https://b.test/e1"/><title>E1</title>'
        "<updated>2026-01-15T00:00:00Z</updated><id>i1</id></entry>"
        '<entry><link href="https://b.test/e2" rel="alternate"/>'
        "<title>E2</title><updated>2026-01-16T00:00:00Z</updated>"
        "<id>i2</id></entry></feed>"
    )
    junk = "not xml at all"
    df = spark.createDataFrame(
        [("a", rss), ("b", atom), ("j", junk)], "host string, feed_xml string"
    )
    rows = feed_entries(df, keep_cols=["host"]).collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    assert set(by_host) == {"a", "b"}  # junk host contributes nothing
    a = sorted(by_host["a"], key=lambda r: r["entry_order"])
    assert [r["link"] for r in a] == ["https://a.test/p1", "https://a.test/p2"]
    assert a[0]["feed_kind"] == "rss" and a[0]["entry_id"] == "g1"
    assert a[0]["published"].startswith("Mon, 15 Jan")
    assert a[1]["entry_order"] == 1  # blank-link item dropped, order kept
    b = sorted(by_host["b"], key=lambda r: r["entry_order"])
    assert [r["link"] for r in b] == ["https://b.test/e1", "https://b.test/e2"]
    assert b[0]["feed_kind"] == "atom" and b[0]["entry_id"] == "i1"
    assert b[1]["published"] == "2026-01-16T00:00:00Z"


def test_robots_meta_directives_and_canonical(spark):
    """Attr order/casing/quoting robustness, multi-tag restrictive
    union, none alias, decoy meta tags ignored, canonical first-match
    with either attribute order."""
    from docrawl_spark.operators.meta_directives import (
        drop_nofollow_edges,
        rel_canonical_col,
        robots_meta_directives,
    )

    pages = spark.createDataFrame(
        [
            (1, '<head><meta content="noindex , NOFOLLOW" name=ROBOTS></head>'),
            (2, "<head><meta name='robots' content='none'></head>"),
            (3, '<head><meta name="robots" content="noarchive">'
                '<meta name="robots" content="noindex"></head>'),
            (4, '<head><meta name="description" content="nofollow"></head>'),
            (5, '<head><link href="https://c.test/x" rel="canonical">'
                '<link rel="canonical" href="https://c.test/SECOND"></head>'),
            (6, "<head></head>"),
            (7, None),
        ],
        "doc_id long, html string",
    )
    flags = {
        r["doc_id"]: r for r in robots_meta_directives(pages).collect()
    }
    assert (flags[1]["noindex"], flags[1]["nofollow"]) == (True, True)
    assert (flags[2]["noindex"], flags[2]["nofollow"]) == (True, True)  # none
    assert (flags[3]["noindex"], flags[3]["noarchive"]) == (True, True)
    assert not flags[3]["nofollow"]  # union never invents directives
    assert not flags[4]["has_robots_meta"]  # decoy name=description
    assert not flags[4]["nofollow"]
    assert not flags[6]["has_robots_meta"] and not flags[7]["has_robots_meta"]

    canon = {
        r["doc_id"]: r["c"]
        for r in pages.select(
            "doc_id", rel_canonical_col(F.col("html")).alias("c")
        ).collect()
    }
    assert canon[5] == "https://c.test/x"  # first tag wins
    assert canon[1] is None and canon[7] is None

    links = spark.createDataFrame(
        [(1, "u1"), (2, "u2"), (3, "u3"), (4, "u4")],
        "src_doc long, url string",
    )
    kept = sorted(
        r["src_doc"]
        for r in drop_nofollow_edges(
            links, robots_meta_directives(pages), id_col="doc_id"
        ).collect()
    )
    assert kept == [3, 4]  # 1 and 2 carry nofollow


def test_http_cache_plan_branches(spark):
    """Every RFC 9111 lifetime branch + the action classification:
    no-store/no-cache beat an explicit max-age; s-maxage never matches
    the max-age pattern; heuristic = (fetched - last_modified)/10;
    fresh vs revalidate vs refetch at the boundary."""
    from docrawl_spark.operators.revalidate import http_cache_plan

    as_of = F.to_timestamp(F.lit("2024-01-02 00:00:00"))  # +24h from fetch
    f0 = _ts("2024-01-01 00:00:00")
    rows = [
        # max-age 2 days -> fresh at +24h
        ("fresh", f0, "max-age=172800", None, True),
        # max-age exactly 24h -> age == lifetime -> NOT fresh -> revalidate
        ("edge", f0, "max-age=86400", None, True),
        # no-cache wins over the max-age also present -> stale -> refetch
        ("nocache", f0, "no-cache, max-age=999999", None, False),
        # s-maxage must NOT match -> no explicit lifetime, no lm -> refetch
        ("smax", f0, "s-maxage=999999", None, False),
        # heuristic: lm 30 days before fetch -> lifetime 3 days -> fresh
        ("heur", f0, None, _ts("2023-12-02 00:00:00"), False),
        # heuristic too short: lm 5 days before -> 12h -> stale+validator
        ("heur2", f0, None, _ts("2023-12-27 00:00:00"), True),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, fetched_at timestamp, cache_control string,"
        " last_modified timestamp, has_validator boolean",
    )
    out = {r["url"]: r for r in http_cache_plan(df, as_of).collect()}
    assert out["fresh"]["action"] == "fresh"
    assert out["edge"]["action"] == "revalidate"  # age == lifetime is stale
    assert out["edge"]["lifetime_us"] == 86_400_000_000
    assert out["nocache"]["lifetime_us"] == 0
    assert out["nocache"]["action"] == "refetch"
    assert out["smax"]["lifetime_us"] == 0
    assert out["heur"]["lifetime_us"] == 30 * 86_400_000_000 // 10
    assert out["heur"]["action"] == "fresh"
    assert out["heur2"]["lifetime_us"] == 5 * 86_400_000_000 // 10
    assert out["heur2"]["action"] == "revalidate"


def test_charset_sniff_precedence(spark):
    """WHATWG precedence: BOM > Content-Type charset > meta charset >
    NULL; quoting/casing robustness; UTF-16 BOM variants."""
    from docrawl_spark.datapipe.multimodal import charset_sniff_col

    rows = [
        # BOM overrides a contradicting header AND meta
        (1, b"\xef\xbb\xbfx", "text/html; charset=latin-1",
         "<meta charset=koi8-r>"),
        (2, b"\xfe\xffx", None, "<p></p>"),          # utf-16be BOM
        (3, b"\xff\xfex", None, "<p></p>"),          # utf-16le BOM
        (4, b"x", 'Text/HTML; CHARSET="Windows-1252"', "<p></p>"),
        (5, b"x", "text/html", "<META CHARSET='Shift_JIS'>"),
        (6, b"x", "text/html",
         '<meta http-equiv=content-type content="text/html; charset=gb2312">'),
        (7, b"x", None, "<p>no signals</p>"),
        (8, None, None, None),                        # all NULL safe
    ]
    df = spark.createDataFrame(
        rows, "id long, body binary, ct string, html string"
    )
    out = {
        r["id"]: r["cs"]
        for r in df.select(
            "id", charset_sniff_col("body", "ct", "html").alias("cs")
        ).collect()
    }
    assert out[1] == "utf-8"
    assert out[2] == "utf-16be"
    assert out[3] == "utf-16le"
    assert out[4] == "windows-1252"
    assert out[5] == "shift_jis"
    assert out[6] == "gb2312"
    assert out[7] is None and out[8] is None


def test_failure_circuit_breaker_states(spark):
    """Streak counts only failures AFTER the last success (4xx is a
    valid answer, not a failure); no-success hosts count everything;
    open decays to half_open after the cooldown."""
    from docrawl_spark.operators.politeness import failure_circuit_breaker

    as_of = F.to_timestamp(F.lit("2024-02-01 00:00:00"))
    rows = [
        # h1: F S F F  -> streak 2 -> open (recent)
        ("h1", _ts("2024-01-31 10:00:00"), 503, 1),
        ("h1", _ts("2024-01-31 11:00:00"), 200, 2),
        ("h1", _ts("2024-01-31 12:00:00"), 500, 3),
        ("h1", _ts("2024-01-31 13:00:00"), 503, 4),
        # h2: never succeeded, long silent -> streak 3 -> half_open
        ("h2", _ts("2024-01-01 00:00:00"), 503, 5),
        ("h2", _ts("2024-01-01 01:00:00"), 503, 6),
        ("h2", _ts("2024-01-01 02:00:00"), 503, 7),
        # h3: 404s are NOT failures -> streak 0 -> closed
        ("h3", _ts("2024-01-31 00:00:00"), 404, 8),
        ("h3", _ts("2024-01-31 01:00:00"), 404, 9),
        # h4: same-microsecond success+failure, failure has larger id
        #     -> failure is AFTER the success -> streak 1 -> closed
        ("h4", _ts("2024-01-31 00:00:00"), 200, 10),
        ("h4", _ts("2024-01-31 00:00:00"), 500, 11),
    ]
    df = spark.createDataFrame(
        rows, "host string, fetched_at timestamp, status int, fetch_id long"
    )
    out = {
        r["host"]: r
        for r in failure_circuit_breaker(
            df, as_of, trip_threshold=2, cooldown_hours=240
        ).collect()
    }
    assert (out["h1"]["fail_streak"], out["h1"]["state"]) == (2, "open")
    assert (out["h2"]["fail_streak"], out["h2"]["state"]) == (3, "half_open")
    assert (out["h3"]["fail_streak"], out["h3"]["state"]) == (0, "closed")
    assert (out["h4"]["fail_streak"], out["h4"]["state"]) == (1, "closed")


def test_boilerplate_block_labels_and_main_text(spark):
    """Nav is link-dense -> bad; heading -> short; prose -> good;
    mid-stopword text -> near_good; main_text keeps good+near_good in
    original order and drops the chrome."""
    from docrawl_spark.datapipe.boilerplate import (
        classify_blocks,
        extract_main_text,
    )

    html = (
        '<div><a href="/">Home</a> <a href="/x">About</a></div>'
        "<h1>Tiny title</h1>"
        "<p>The cat sat on the mat and it was happy with the sun in the"
        " yard for a while.</p>"
        "<p>alpha beta gamma delta epsilon zeta eta theta</p>"
        '<div><a href="/terms">Terms</a> 2026</div>'
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    blocks = sorted(
        classify_blocks(df).collect(), key=lambda r: r["block_order"]
    )
    labels = [b["label"] for b in blocks]
    texts = [b["text"] for b in blocks]
    assert labels[texts.index("Home About")] == "bad"
    assert labels[texts.index("Tiny title")] == "short"
    prose_i = next(i for i, t in enumerate(texts) if t.startswith("The cat"))
    assert labels[prose_i] == "good"
    greek_i = next(i for i, t in enumerate(texts) if t.startswith("alpha"))
    assert labels[greek_i] == "near_good"  # words enough, no stopwords? ->
    # 'alpha…theta' has zero stopwords -> stop_ppm 0 -> near_good
    assert labels[texts.index("Terms 2026")] == "short"

    main = extract_main_text(df).collect()[0]
    assert main["main_text"].startswith("The cat sat")
    assert main["main_text"].endswith("theta")
    assert "Home" not in main["main_text"]
    assert main["n_kept"] == 2


def test_pmi_collocations_hand_case(spark):
    """'new york' always co-occurs (high PMI); 'the of' pairs are
    incidental (low/negative PMI); min_count prunes rare pairs.
    Factorized bits: bitlen(c12)+bitlen(N)-bitlen(c1)-bitlen(c2)."""
    from docrawl_spark.datapipe.text import pmi_collocations

    docs = spark.createDataFrame(
        [(i, "new york " + "the of " * 3) for i in range(4)]
        + [(99, "rare pair")],
        "doc_id long, text string",
    )
    out = {
        (r["w1"], r["w2"]): r
        for r in pmi_collocations(docs, min_count=2).collect()
    }
    assert ("rare", "pair") not in out  # c12 == 1 < min_count
    ny = out[("new", "york")]
    assert ny["c12"] == 4 and ny["c1"] == 4
    # N = 4 docs * 7 bigrams = 28 -> bitlen 5; bitlen(4)=3, c2('york')=4
    assert ny["pmi_bits"] == 3 + 5 - 3 - 3
    to = out[("the", "of")]
    assert to["c12"] == 12  # 3 direct 'the of' per doc... plus none across
    assert to["pmi_bits"] < ny["pmi_bits"]


def test_snapshot_change_magnitude_hand_cases(spark):
    """Identical versions -> change 0; disjoint rewrites -> change 10^6;
    a one-token append changes exactly the tail shingles; sub-k
    snapshots produce no pair row."""
    from docrawl_spark.operators.recrawl import snapshot_change_magnitude

    rows = [
        ("same", 0, "a b c d e"), ("same", 1, "a b c d e"),
        ("gone", 0, "a b c d e"), ("gone", 1, "v w x y z"),
        ("grow", 0, "a b c d"),   ("grow", 1, "a b c d e"),
        ("tiny", 0, "a b"),       ("tiny", 1, "a b"),
    ]
    df = spark.createDataFrame(rows, "url string, version int, text string")
    out = {
        r["url"]: r for r in snapshot_change_magnitude(df, k=3).collect()
    }
    assert "tiny" not in out  # < k tokens: no shingle set to compare
    assert out["same"]["change_ppm"] == 0
    assert out["same"]["jaccard_ppm"] == 1_000_000
    assert out["gone"]["n_common"] == 0
    assert out["gone"]["change_ppm"] == 1_000_000
    g = out["grow"]  # v0: {abc,bcd}; v1: adds {cde}; union 3, common 2
    assert (g["n_from"], g["n_to"], g["n_common"]) == (2, 3, 2)
    assert g["jaccard_ppm"] == 666_666 and g["change_ppm"] == 333_334


def test_robots_agent_group_selection(spark):
    """RFC 9309 §2.2.1: most-specific prefix-matching UA wins over *;
    multi-UA groups select as a unit; same-token groups MERGE; hosts
    with no matching group and no * contribute no rows."""
    from docrawl_spark.operators.politeness import select_agent_rules

    blob_specific = (
        "User-agent: googlebot\nDisallow: /g\n"
        "User-agent: docrawl\nUser-agent: other\nAllow: /a\nDisallow: /b\n"
        "User-agent: DOCRAWL\nDisallow: /second-group\n"  # same token -> merge
        "User-agent: *\nDisallow: /star"
    )
    blob_star_only = "User-agent: googlebot\nDisallow: /g\nUser-agent: *\nDisallow: /star"
    blob_no_match = "User-agent: googlebot\nDisallow: /g"
    dim = spark.createDataFrame(
        [("s.test", blob_specific), ("w.test", blob_star_only), ("n.test", blob_no_match)],
        "host string, robots_blob string",
    )
    rows = select_agent_rules(dim, agent="docrawl-spark").collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    s = sorted(by_host["s.test"], key=lambda r: r["rule_order"])
    # merged rules from BOTH docrawl groups, none from googlebot or *
    assert [(r["allow"], r["path"]) for r in s] == [
        (True, "/a"), (False, "/b"), (False, "/second-group")
    ]
    assert all(r["matched_ua"] == "docrawl" for r in s)
    w = by_host["w.test"]
    assert [(r["matched_ua"], r["path"]) for r in w] == [("*", "/star")]
    assert "n.test" not in by_host  # no group applies -> unrestricted


def test_robots_full_gate_end_to_end(spark):
    """Group selection feeds the compiled longest-match evaluator: the
    docrawl group's Allow/Disallow govern a matching agent while the *
    group's rules do NOT leak in (and vice versa for a non-matching
    agent)."""
    from docrawl_spark.operators.politeness import (
        robots_allowed_rfc_col,
        robots_compile_col,
        select_agent_rules,
    )

    blob = (
        "User-agent: docrawl\nAllow: /public\nDisallow: /private\n"
        "User-agent: *\nDisallow: /fallback"
    )
    dim = spark.createDataFrame([("h.test", blob)], "host string, robots_blob string")

    def gate(agent):
        rules = select_agent_rules(dim, agent=agent)
        compiled = (
            rules.groupBy("host")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rule_order", "allow", "path"))
                    ),
                    lambda s: F.struct(
                        s.getField("allow").alias("allow"),
                        s.getField("path").alias("path"),
                    ),
                ).alias("_rules")
            )
            .select("host", robots_compile_col(F.col("_rules")).alias("_c"))
        )
        urls = spark.createDataFrame(
            [("h.test", f"https://h.test{p}") for p in
             ("/public/x", "/private/y", "/fallback/z")],
            "host string, url string",
        )
        return {
            r["url"].split("h.test")[1]: r["ok"]
            for r in urls.join(compiled, "host")
            .select("url", robots_allowed_rfc_col(F.col("url"), F.col("_c")).alias("ok"))
            .collect()
        }

    as_docrawl = gate("docrawl-spark")
    assert as_docrawl == {"/public/x": True, "/private/y": False,
                          "/fallback/z": True}  # * rules don't leak in
    as_other = gate("randombot")
    assert as_other == {"/public/x": True, "/private/y": True,
                        "/fallback/z": False}  # only the * group governs


def test_breaker_fold_equals_batch(spark):
    """Folding (ts, id)-ordered micro-batches through breaker_fold_batch
    and classifying the final state is EXACTLY the one-shot
    failure_circuit_breaker — across uneven splits, batch-boundary
    successes, hosts absent from some batches, and same-µs ties."""
    import random

    from docrawl_spark.operators.politeness import (
        breaker_fold_batch,
        breaker_state_classify,
        failure_circuit_breaker,
    )

    rng = random.Random(42)
    rows = []
    fid = 0
    for h in ("a", "b", "c", "d"):
        for i in range(12):
            fid += 1
            status = 503 if rng.random() < 0.45 else (404 if rng.random() < 0.2 else 200)
            rows.append((h, _ts("2024-01-01 00:00:00")
                         + __import__("datetime").timedelta(hours=i), status, fid))
    # same-microsecond tie at a boundary-prone spot
    rows.append(("a", _ts("2024-01-01 05:00:00"), 200, fid + 1))
    rows.sort(key=lambda r: (r[1], r[3]))
    schema = "host string, fetched_at timestamp, status int, fetch_id long"
    full = spark.createDataFrame(rows, schema)
    as_of = F.to_timestamp(F.lit("2024-01-03 00:00:00"))

    want = sorted(
        map(tuple, failure_circuit_breaker(
            full, as_of, trip_threshold=3, cooldown_hours=30
        ).collect())
    )
    for cuts in ([15, 30], [1, 2, 40], [25]):
        state = None
        prev = 0
        for c in cuts + [len(rows)]:
            chunk = rows[prev:c]
            prev = c
            if not chunk:
                continue
            state = breaker_fold_batch(state, spark.createDataFrame(chunk, schema))
        got = sorted(
            map(tuple, breaker_state_classify(
                state, as_of, trip_threshold=3, cooldown_hours=30
            ).collect())
        )
        assert got == want, f"split {cuts} diverged"


def test_retry_after_forms(spark):
    """Delay-seconds is relative to receipt; IMF-fixdate is absolute;
    whitespace tolerated; garbage, negatives, and huge digit strings
    (> 9 digits, overflow guard) -> NULL."""
    from docrawl_spark.operators.politeness import retry_after_us_col

    rx = _ts("2024-02-01 00:00:00")
    rows = [
        (1, "0"), (2, " 3600 "), (3, "Mon, 15 Jan 2024 10:30:00 GMT"),
        (4, "tomorrow"), (5, None), (6, "-5"), (7, "99999999999"),
    ]
    df = spark.createDataFrame(rows, "id long, h string").withColumn(
        "rx", F.lit(rx)
    )
    out = {
        r["id"]: r["us"]
        for r in df.select(
            "id", retry_after_us_col(F.col("h"), F.col("rx")).alias("us")
        ).collect()
    }
    base = 1706745600000000  # 2024-02-01 00:00:00 UTC in micros
    assert out[1] == base
    assert out[2] == base + 3600 * 1_000_000
    assert out[3] == 1705314600000000  # 2024-01-15 10:30:00 UTC
    assert out[4] is None and out[5] is None
    assert out[6] is None  # negative not a valid delay-seconds
    assert out[7] is None  # 11 digits: outside the sane-delay guard


def test_html_unescape_single_pass(spark):
    """Named core set + ASCII numeric refs decode; &amp;lt; decodes
    exactly once; out-of-ASCII refs and unknown entities pass through;
    NULL-safe."""
    from docrawl_spark.datapipe.text import html_unescape_col

    cases = {
        "a &amp; b": "a & b",
        "&lt;tag&gt;": "<tag>",
        "it&#39;s": "it's",
        "it&#x27;s": "it's",
        "&amp;lt; stays": "&lt; stays",
        "&#8212; passes": "&#8212; passes",
        "&unknown; stays": "&unknown; stays",
        "tail&": "tail&",
        "&quot;q&quot;": '"q"',
        "&apos;a&apos;": "'a'",
        "no entities": "no entities",
    }
    df = spark.createDataFrame([(k,) for k in cases], "t string")
    got = {
        r["t"]: r["u"]
        for r in df.select("t", html_unescape_col(F.col("t")).alias("u")).collect()
    }
    assert got == cases


def test_hreflang_alternates_extraction(spark):
    """Attribute order/case robust; stylesheet and canonical links
    filtered; lowercased lang tags; x-default literal; blank href
    dropped."""
    from docrawl_spark.operators.meta_directives import hreflang_alternates

    html = (
        '<head><link rel="stylesheet" href="/s.css">'
        '<link rel="alternate" hreflang="EN" href="https://h/en">'
        "<link hreflang='de-AT' rel=alternate href='https://h/de'>"
        '<link rel="alternate" hreflang="x-default" href="https://h/">'
        '<link rel="alternate" hreflang="fr" href="">'
        '<link rel="canonical" href="https://h/c"></head>'
    )
    df = spark.createDataFrame([(1, html), (2, "<p>none</p>"), (3, None)],
                               "doc_id long, html string")
    rows = sorted(
        hreflang_alternates(df).collect(), key=lambda r: r["alt_order"]
    )
    assert [(r["hreflang"], r["href"]) for r in rows] == [
        ("en", "https://h/en"), ("de-at", "https://h/de"),
        ("x-default", "https://h/"),
    ]
    assert all(r["doc_id"] == 1 for r in rows)


def test_clean_param_rules_parsing(spark):
    """Directive parsing: case-insensitive key, multi-param &-split,
    default '/' prefix, CRLF blobs, non-directive lines ignored,
    charset-violating lines ignored."""
    from docrawl_spark.operators.politeness import clean_param_rules

    rows = [
        ("a.test", "User-agent: *\r\nClean-param: sid&ref /doc\r\nclean-PARAM: page"),
        ("b.test", "Disallow: /x\nClean-param: bad$name /p"),
        ("c.test", None),
    ]
    df = spark.createDataFrame(rows, "host string, robots_blob string")
    got = {
        (r["host"], r["param"], r["path_prefix"])
        for r in clean_param_rules(df).collect()
    }
    assert got == {
        ("a.test", "sid", "/doc"),
        ("a.test", "ref", "/doc"),
        ("a.test", "page", "/"),
    }


def test_apply_clean_params_cases(spark):
    """Application: prefix scoping, site-wide rules, bare flag tokens,
    query emptied -> '?' dropped, untouched URLs bit-identical, hosts
    without rules pass through."""
    from docrawl_spark.operators.politeness import (
        apply_clean_params,
        clean_param_rules,
    )

    robots = spark.createDataFrame(
        [("a.test", "Clean-param: sid&ref /doc\nClean-param: page")],
        "host string, robots_blob string",
    )
    urls = spark.createDataFrame(
        [
            # sid+page dropped (prefix + site-wide), keep stays
            ("https://a.test/doc/1?sid=1&page=2&keep=3", "a.test", "/doc/1"),
            # /other: only site-wide 'page' applies, sid survives
            ("https://a.test/other?sid=1&page=2", "a.test", "/other"),
            # whole query dropped -> no '?'
            ("https://a.test/doc/2?sid=x", "a.test", "/doc/2"),
            # bare flag named like a dropped param is dropped too
            ("https://a.test/doc/3?sid&keep=1", "a.test", "/doc/3"),
            # no query
            ("https://a.test/doc/4", "a.test", "/doc/4"),
            # no rules for this host
            ("https://z.test/doc/5?sid=1", "z.test", "/doc/5"),
        ],
        "url string, host string, path string",
    )
    out = {
        r["url"]: (r["clean_url"], r["n_params_dropped"])
        for r in apply_clean_params(urls, clean_param_rules(robots)).collect()
    }
    assert out["https://a.test/doc/1?sid=1&page=2&keep=3"] == (
        "https://a.test/doc/1?keep=3",
        2,
    )
    assert out["https://a.test/other?sid=1&page=2"] == (
        "https://a.test/other?sid=1",
        1,
    )
    assert out["https://a.test/doc/2?sid=x"] == ("https://a.test/doc/2", 1)
    assert out["https://a.test/doc/3?sid&keep=1"] == (
        "https://a.test/doc/3?keep=1",
        1,
    )
    assert out["https://a.test/doc/4"] == ("https://a.test/doc/4", 0)
    assert out["https://z.test/doc/5?sid=1"] == ("https://z.test/doc/5?sid=1", 0)


def test_shared_ip_budgets_largest_remainder(spark):
    """Exact integer splits: under-cap passes through; over-cap uses
    floor + largest fractional remainder (host-asc tie-break); grants
    sum to min(cap, sum(requested)) per IP."""
    from docrawl_spark.operators.politeness import shared_ip_budgets

    rows = [
        # ip1: 5+3+2 = 10 > cap 7 -> floors 3,2,1 (rem 1 to frac-5 host a)
        ("a", "ip1", 5), ("b", "ip1", 3), ("c", "ip1", 2),
        # ip2: under cap -> as requested
        ("d", "ip2", 4), ("e", "ip2", 2),
        # ip3: all-equal fracs -> host-asc gets the remainder units
        ("f", "ip3", 1), ("g", "ip3", 1), ("h", "ip3", 1),
    ]
    df = spark.createDataFrame(rows, "host string, ip string, budget long")
    got = {
        r["host"]: (r["requested"], r["granted"])
        for r in shared_ip_budgets(df, ip_cap=7).collect()
    }
    assert got["a"] == (5, 4) and got["b"] == (3, 2) and got["c"] == (2, 1)
    assert got["d"] == (4, 4) and got["e"] == (2, 2)
    # ip3 under cap 7 -> as requested; re-run with cap 2 for the tie case
    got2 = {
        r["host"]: r["granted"]
        for r in shared_ip_budgets(
            df.where(F.col("ip") == "ip3"), ip_cap=2
        ).collect()
    }
    assert got2 == {"f": 1, "g": 1, "h": 0}


def test_hreflang_reciprocity_edges(spark):
    """A<->B reciprocal (any language), A->C dangling, self-edges
    dropped."""
    from docrawl_spark.operators.meta_directives import hreflang_reciprocity

    rows = [
        ("A", "B", "de"),
        ("B", "A", "en"),
        ("A", "C", "fr"),   # C declares only D -> non-reciprocal
        ("C", "D", "en"),
        ("D", "D", "en"),   # self-edge dropped
    ]
    df = spark.createDataFrame(rows, "url string, href string, hreflang string")
    got = {
        (r["url"], r["href"]): r["reciprocal"]
        for r in hreflang_reciprocity(df).collect()
    }
    assert got == {
        ("A", "B"): 1,
        ("B", "A"): 1,
        ("A", "C"): 0,
        ("C", "D"): 0,
    }


def test_delay_compliance_report_exact(spark):
    """Hand log: gaps in (ts, tie) order, strict-< violation rule,
    single-fetch host reports zero gaps and NULL min."""
    from docrawl_spark.operators.politeness import delay_compliance_report

    rows = [
        # h1 policy 10: fetches at 0, 5, 20, 25 -> gaps 5, 15, 5 -> 2 violations
        ("h1", 0, 10, 1), ("h1", 5, 10, 2), ("h1", 20, 10, 3), ("h1", 25, 10, 4),
        # h2: boundary gap == policy is NOT a violation (strict <)
        ("h2", 0, 7, 1), ("h2", 7, 7, 2),
        # h3: single fetch
        ("h3", 100, 5, 1),
    ]
    df = spark.createDataFrame(
        rows, "host string, fetch_us long, policy_us long, fetch_id long"
    )
    got = {r["host"]: r for r in delay_compliance_report(df).collect()}
    h1 = got["h1"]
    assert (h1["n_fetches"], h1["n_gaps"], h1["min_gap_us"], h1["n_violations"]) == (4, 3, 5, 2)
    assert h1["violation_ppm"] == 2 * 1000000 // 3
    h2 = got["h2"]
    assert (h2["n_violations"], h2["min_gap_us"]) == (0, 7)
    h3 = got["h3"]
    assert (h3["n_fetches"], h3["n_gaps"], h3["n_violations"], h3["violation_ppm"]) == (1, 0, 0, 0)
    assert h3["min_gap_us"] is None


def test_robots_prefix_array_gate_equals_blob_gate(spark):
    """The dim-side pre-split gate (robots_prefixes_col +
    robots_allowed_prefixes_col — the integrated wave's form, splitting
    once per host instead of once per candidate row) must agree with
    robots_allowed_col on every edge: null/empty blob, CRLF line ends,
    blank lines, multi-prefix blobs, query-string paths, and a NULL
    prefix array (host absent from the dim → allow)."""
    from pyspark.sql import functions as F

    from docrawl_spark.operators.politeness import (
        robots_allowed_col,
        robots_allowed_prefixes_col,
        robots_prefixes_col,
    )

    rows = [
        ("https://h.test/p1", None),
        ("https://h.test/p1", ""),
        ("https://h.test/p1", "/p1"),
        ("https://h.test/p1x", "/p1"),          # prefix match → blocked
        ("https://h.test/q", "/p1\n/p3"),
        ("https://h.test/p3/deep", "/p1\n/p3"),
        ("https://h.test/p3", "/p1\r\n/p3"),    # CRLF split
        ("https://h.test/p2", "\n\n/p2\n\n"),   # blank lines dropped
        ("https://h.test/p1?a=1", "/p1"),
        ("https://h.test/", "/"),
    ]
    df = spark.createDataFrame(rows, "url string, blob string")
    got = df.select(
        "url",
        "blob",
        robots_allowed_col(F.col("url"), F.col("blob")).alias("a"),
        robots_allowed_prefixes_col(
            F.col("url"), robots_prefixes_col(F.col("blob"))
        ).alias("b"),
    ).collect()
    for r in got:
        assert r["a"] == r["b"], (r["url"], r["blob"], r["a"], r["b"])
    # NULL array (left-join miss) → allow, like a null blob
    miss = df.select(
        robots_allowed_prefixes_col(
            F.col("url"), F.lit(None).cast("array<string>")
        ).alias("b")
    ).collect()
    assert all(r["b"] is True for r in miss)
