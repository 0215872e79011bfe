"""HTML→spans parser (operators/htmlparse.py) — reference scan-kernel
rules on real HTML — and the full real-fetch loop: fixture web →
rendered HTML → localhost HTTP → pooled transport → parse → scan
kernel → run_crawl, with crawl results equal to the synthetic-fetch
path."""

from __future__ import annotations

import json
import threading

import pytest

from docrawl_spark.operators.htmlparse import html_to_spans, parse_fetched_html
from docrawl_spark.plans.simulator import clean_spans
from docrawl_spark.sources.fixtures import fixture_to_dfs, generate_web
from docrawl_spark.sources.htmlrender import (
    CONTEXT_CLASS,
    COOKIES_CLASS,
    spans_to_html,
)

# ---------------------------------------------------------------------------
# parser rules on handcrafted HTML
# ---------------------------------------------------------------------------


def kinds(spans):
    return [s["kind"] for s in spans]


def test_section_order_defines_offsets():
    html = """
    <body>
      <a href="/x">link first in document</a>
      <h1>Head</h1>
      <p>para</p>
      <ul><li>a</li></ul>
      <table><tr><td>1</td></tr><tr><td>2</td></tr></table>
      <input value="q">
      <img src="/i.png" alt="pic">
      <button>Go</button>
    </body>"""
    s = html_to_spans(html)
    # reference dispatch order, NOT document order (docrawl_core.py:657-712)
    assert kinds(s) == [
        "input", "table", "bullet", "text", "headline", "link", "image",
        "button",
    ]
    assert [x["offset"] for x in s] == list(range(8))


def test_div_span_need_direct_text():
    html = """
    <div><p>wrapped only</p></div>
    <div>direct text<p>child</p></div>
    <span><b>no direct</b></span>
    <span>yes</span>"""
    s = [x for x in html_to_spans(html) if x["kind"] == "text"]
    # div[normalize-space(text())] (elements.py:54): wrapper div excluded,
    # direct-text div included (with FULL descendant text), p always
    texts = [x["text"] for x in s]
    assert "wrapped only" in texts  # the <p>
    assert "direct text" in "".join(texts)
    assert all("no direct" != t for t in texts)
    assert "yes" in texts
    # the wrapper div itself contributed nothing
    assert len([t for t in texts if "wrapped only" in t]) == 1


def test_link_exclusions():
    html = """
    <a href="/ok">good</a>
    <a href="/m" id="mainMenu">menu by id</a>
    <a href="/m2" class="nav menu">menu by class</a>
    <a href="/img"><img src="/x.png"></a>
    <a href="javascript:void(0)">js</a>
    <a href="mailto:a@b.c">mail</a>
    <a>no href</a>"""
    # repo model: javascript/mailto KEPT (filtered at discovery,
    # operators/links.py); menu/img excluded (elements.py:61-71)
    refs = [x["media_ref"] for x in html_to_spans(html) if x["kind"] == "link"]
    assert refs == ["/ok", "javascript:void(0)", "mailto:a@b.c"]
    # strict mode = the full reference scan exclusion
    refs_strict = [
        x["media_ref"]
        for x in html_to_spans(html, strict_link_exclusions=True)
        if x["kind"] == "link"
    ]
    assert refs_strict == ["/ok"]


def test_image_data_src_preference_and_button_variants():
    html = """
    <img data-src="/lazy.png" src="/placeholder.gif" alt="lazy">
    <a href="/b1" role="button">A</a>
    <a href="/b2" class="btn primary">B</a>
    <a href="/plain">C</a>"""
    s = html_to_spans(html)
    img = [x for x in s if x["kind"] == "image"][0]
    assert img["media_ref"] == "/lazy.png" and img["text"] == "lazy"
    # button-ish <a> appear in BOTH link and button sections (the
    # reference's LINK_TAGS doesn't exclude them)
    assert [x["media_ref"] for x in s if x["kind"] == "button"] == ["/b1", "/b2"]
    assert [x["media_ref"] for x in s if x["kind"] == "link"] == [
        "/b1", "/b2", "/plain"
    ]


def test_real_table_th_row_yields_empty_row_and_guard_counts():
    """A th inside <tr>: the header tr contributes an EMPTY rows entry
    (the reference's .//tr iteration, docrawl_core.py:491-526) — and
    the kernel guard then counts th(1) + 2 rows >= 2."""
    html = """<table>
      <tr><th>H1</th><th>H2</th></tr>
      <tr><td>a</td><td>b<i>c</i></td></tr>
    </table>"""
    s = html_to_spans(html)
    p = json.loads(s[0]["text"])
    assert p["th"] == [["H1"], ["H2"]]
    assert p["rows"] == [[], [["a"], ["b", "c"]]]
    assert clean_spans(s)  # survives the <2-tr guard
    # a single-row, no-th table is guard-dropped
    s1 = html_to_spans("<table><tr><td>solo</td></tr></table>")
    assert clean_spans(s1) == []


def test_autoclose_li_and_td():
    html = "<ul><li>one<li>two</ul><table><tr><td>a<td>b<tr><td>c</table>"
    s = html_to_spans(html)
    bullet = [x for x in s if x["kind"] == "bullet"][0]
    assert json.loads(bullet["text"]) == [["one"], ["two"]]
    table = [x for x in s if x["kind"] == "table"][0]
    assert json.loads(table["text"])["rows"] == [[["a"], ["b"]], [["c"]]]


def test_script_style_invisible():
    html = "<p>keep<script>drop()</script><style>.x{}</style>ing</p>"
    s = html_to_spans(html)
    assert [x["text"] for x in s if x["kind"] == "text"] == ["keeping"]


# ---------------------------------------------------------------------------
# fixture render → parse → kernel roundtrip
# ---------------------------------------------------------------------------


def _ref_clean_fragments(frags):
    out = [("".join(f.strip())).replace("\\", "") for f in frags]
    return [f for f in out if f]


def _normalize(span):
    """Bullet payload empty-string fragments are unrepresentable as
    HTML text nodes (module doc, htmlrender) — compare bullets through
    the reference's fragment cleaning (docrawl_core.py:431-450)."""
    if span["kind"] == "bullet":
        lis = json.loads(span["text"])
        return ("bullet", json.dumps([_ref_clean_fragments(li) for li in lis]),
                span["media_ref"])
    return (span["kind"], span["text"], span["media_ref"])


def test_fixture_roundtrip_clean_equality():
    fx = generate_web(seed=5)
    n_pages = 0
    for url, raw in fx.documents_raw.items():
        html = spans_to_html(raw, title=url)
        parsed = html_to_spans(
            html, context_class=CONTEXT_CLASS, cookies_class=COOKIES_CLASS
        )
        got = [_normalize(s) for s in clean_spans(parsed)]
        want = [_normalize(s) for s in clean_spans(raw)]
        assert got == want, url
        n_pages += 1
    assert n_pages > 20


# ---------------------------------------------------------------------------
# the full real-fetch loop: localhost HTTP -> parse -> crawl equality
# ---------------------------------------------------------------------------


def test_crawl_over_real_http_equals_synthetic(spark, tmp_path):
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from pyspark.sql import functions as F

    from docrawl_spark.operators import transport as tr
    from docrawl_spark.operators.fetch import http_fetch
    from docrawl_spark.plans.crawl import run_crawl
    from docrawl_spark.sources.schemas import DOCUMENTS_SCHEMA
    from docrawl_spark.sources.storage import Warehouse

    fx = generate_web(seed=23)
    urls = sorted(fx.documents_raw)
    pages = {
        f"/d/{i}": spans_to_html(fx.documents_raw[u], title=u).encode()
        for i, u in enumerate(urls)
    }

    class H(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def do_GET(self):
            body = pages.get(self.path)
            if body is None:
                self.send_response(404)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        # fetch every page over REAL HTTP, parse HTML back to raw spans
        mapping = spark.createDataFrame(
            [(f"{base}/d/{i}", u) for i, u in enumerate(urls)],
            "url string, orig_url string",
        )
        fetched = http_fetch(
            mapping, timeout_s=10.0, retries=1, transport=tr.pooled_http_transport
        )
        assert fetched.where(F.col("status") != 200).count() == 0
        parsed = parse_fetched_html(
            fetched,
            context_class=CONTEXT_CLASS,
            cookies_class=COOKIES_CLASS,
        )
        docs_http = (
            parsed.join(mapping, parsed["doc_id"] == mapping["url"])
            .select(F.col("orig_url").alias("doc_id"), "spans")
        )
        # cache: the crawl loop iterates over this frame many times and
        # must not refetch per wave
        rows = [
            (r["doc_id"], [tuple(s) for s in r["spans"]])
            for r in docs_http.collect()
        ]
        docs_http_local = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)

        _, hosts_df, seeds_df = fixture_to_dfs(spark, fx)
        docs_ref, _, _ = fixture_to_dfs(spark, fx)

        res_http = run_crawl(
            spark, docs_http_local, hosts_df, seeds_df, max_waves=5,
            warehouse=Warehouse(str(tmp_path / "wh_http"), spark),
            collect_visits=True,
        )
        res_ref = run_crawl(
            spark, docs_ref, hosts_df, seeds_df, max_waves=5,
            warehouse=Warehouse(str(tmp_path / "wh_ref"), spark),
            collect_visits=True,
        )
        assert res_http.visits == res_ref.visits
        assert set(res_http.seen_urls) == set(res_ref.seen_urls)
    finally:
        srv.shutdown()
        tr.close_pool()


def test_run_crawl_with_live_http_fetcher(spark, tmp_path):
    """The deepest integration: run_crawl's wave loop fetches each
    SELECTED url over real HTTP per wave (no prefetch) through
    make_http_fetcher — url identity stays canonical, the wire request
    is hex-rewritten to the localhost server — and the crawl equals
    the synthetic-fetch crawl exactly."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from pyspark.sql import functions as F

    from docrawl_spark.operators import transport as tr
    from docrawl_spark.plans.crawl import run_crawl
    from docrawl_spark.sources.storage import Warehouse

    fx = generate_web(seed=29)
    pages = {
        u: spans_to_html(raw, title=u).encode()
        for u, raw in fx.documents_raw.items()
    }

    class H(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def do_GET(self):
            # /u/<hex(canonical url)>
            try:
                canon = bytes.fromhex(self.path[3:]).decode("utf-8")
            except ValueError:
                canon = ""
            body = pages.get(canon)
            if body is None:
                self.send_response(404)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Set-Cookie", "sid=abc123; Path=/")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        fetcher = tr.make_http_fetcher(
            transport=tr.pooled_http_transport,
            url_rewrite=lambda url: F.concat(
                F.lit(f"{base}/u/"), F.lower(F.hex(F.encode(url, "utf-8")))
            ),
            context_class=CONTEXT_CLASS,
            cookies_class=COOKIES_CLASS,
            retries=1,
        )
        docs_ref, hosts_df, seeds_df = fixture_to_dfs(spark, fx)
        res_live = run_crawl(
            spark, None, hosts_df, seeds_df, max_waves=4,
            warehouse=Warehouse(str(tmp_path / "wh_live"), spark),
            collect_visits=True, fetcher=fetcher,
        )
        res_ref = run_crawl(
            spark, docs_ref, hosts_df, seeds_df, max_waves=4,
            warehouse=Warehouse(str(tmp_path / "wh_ref2"), spark),
            collect_visits=True,
        )
        assert res_live.visits == res_ref.visits
        assert set(res_live.seen_urls) == set(res_ref.seen_urls)
        # the real Set-Cookie header landed in the fetch log's jar
        jar = (
            res_live.fetch_log.where(F.col("status") == 200)
            .select(F.explode("cookies").alias("c"))
            .select("c.name", "c.value")
            .distinct()
            .collect()
        )
        assert ("sid", "abc123") in {(r["name"], r["value"]) for r in jar}
    finally:
        srv.shutdown()
        tr.close_pool()


def test_parse_fetched_html_honors_charset(spark):
    """Per-row charset: BOM beats header, header beats default, broken
    labels fall back with replacement."""
    latin = "<p>café page</p>".encode("latin-1")
    bom = "﻿<p>bom page</p>".encode("utf-8")
    broken = b"<p>plain</p>"
    df = spark.createDataFrame(
        [
            ("u1", bytearray(latin), "text/html; charset=ISO-8859-1"),
            ("u2", bytearray(bom), "text/html; charset=ISO-8859-1"),
            ("u3", bytearray(broken), "text/html; charset=no-such-enc"),
        ],
        "url string, content binary, content_type string",
    )
    got = {
        r["doc_id"]: r["spans"]
        for r in parse_fetched_html(df, content_type_col="content_type").collect()
    }
    assert got["u1"][0]["text"] == "café page"
    assert got["u2"][0]["text"] == "bom page"  # BOM overrode the header
    assert got["u3"][0]["text"] == "plain"  # unknown charset fell back


def test_parser_survives_nesting_bomb_and_fuzz():
    """Adversarial pages: 50k-deep nesting, unclosed tags, stray
    closers, binary soup — the parser must never raise and must keep
    the offset invariant (0..n-1 in order)."""
    bomb = "<div>" * 50_000 + "deep" + "</div>" * 50_000
    s = html_to_spans(bomb)
    assert any(x["text"] == "deep" for x in s if x["kind"] == "text")

    deep_table = "<table><tr><td>" + "<b>" * 30_000 + "x" + "</table>"
    s2 = html_to_spans(deep_table)
    assert json.loads(s2[0]["text"])["rows"] == [[["x"]]]

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=150, deadline=None)
    @given(
        st.text(
            alphabet="<>/abp ulih13\"'=&;\x00é",
            min_size=0,
            max_size=200,
        )
    )
    def fuzz(html):
        spans = html_to_spans(html)
        assert [x["offset"] for x in spans] == list(range(len(spans)))
        for x in spans:
            assert x["kind"] in (
                "input", "table", "bullet", "text", "headline", "link",
                "image", "button",
            )

    fuzz()
