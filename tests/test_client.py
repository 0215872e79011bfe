"""SparkCrawlClient — the reference DocrawlClient command surface
(docrawl_client.py:182-375) driven as a sequential script over both
navigation modes (synthetic corpus join; real localhost HTTP), with
file outputs byte-identical to the reference's write loops."""

from __future__ import annotations

import json
import threading

import pytest

from docrawl_spark.client import SparkCrawlClient, classify_xpath
from docrawl_spark.plans.simulator import clean_spans
from docrawl_spark.sources.fixtures import fixture_to_dfs, generate_web
from docrawl_spark.sources.htmlrender import spans_to_html


def test_classify_xpath_vocabulary():
    assert classify_xpath("//table") == "table"
    assert classify_xpath("//div[@id='x']/ul") == "bullet"
    assert classify_xpath("//div[@class='c']/p/text()") == "text"
    assert classify_xpath("//h2") == "headline"
    assert classify_xpath("//a[@href]") == "link"
    assert classify_xpath("//section") == "element"


@pytest.fixture(scope="module")
def corpus(spark):
    fx = generate_web(seed=31)
    docs, hosts, seeds = fixture_to_dfs(spark, fx)
    return fx, docs


def test_corpus_mode_script(spark, corpus, tmp_path):
    fx, docs = corpus
    url = sorted(fx.documents_raw)[0]
    c = SparkCrawlClient(spark, documents=docs, out_dir=str(tmp_path))

    with pytest.raises(RuntimeError):
        c.load_website(url)  # browser not active yet
    c.run_spider()
    c.load_website(url)
    assert c.get_current_url() == url and c.status == 200

    # scan: kind flags select kernel-cleaned spans
    els = c.scan_web_page(incl_texts=True, incl_headlines=True)
    want = [
        s for s in clean_spans(fx.documents_raw[url])
        if s["kind"] in ("text", "headline")
    ]
    assert els == want

    # O4 txt: byte-identical to the reference write loop
    c.extract_xpath("//p", "out.txt")
    expected = "".join(
        s["text"].strip() + "\n"
        for s in clean_spans(fx.documents_raw[url])
        if s["kind"] == "text" and s["text"].strip()
    ) or "None\n"
    assert (tmp_path / "out.txt").read_bytes().decode() == expected
    # append mode doubles it (docrawl_core.py:903-905 knob)
    c.extract_xpath("//p", "out.txt", write_in_file_mode="a+")
    assert (tmp_path / "out.txt").read_bytes().decode() == expected * 2

    # O5 txt: blocks newline-joined, no trailing newline
    c.extract_multiple_xpath(["//h1", "//p"], filename="multi.xlsx")
    multi = (tmp_path / "multi.txt").read_bytes().decode()
    assert not multi.endswith("\n") and "\n" in multi

    # O8: url file
    c.get_current_url(filename="cur.txt")
    assert (tmp_path / "cur.txt").read_text() == url

    # O7: page source dump is the spans JSON
    c.extract_page_source("src.json")
    assert json.loads((tmp_path / "src.json").read_text())

    # 404 navigation: still "loaded", no spans
    c.load_website("http://site0.test/definitely-missing")
    assert c.status == 404 and c.scan_web_page(incl_texts=True) == []

    # dropped commands raise with rationale, not silently no-op
    with pytest.raises(NotImplementedError, match="browser-only"):
        c.take_screenshot()
    with pytest.raises(NotImplementedError):
        c.send_text("//input", "hi")
    c.close_browser()
    assert not c.is_browser_active()


def test_corpus_mode_click_navigation(spark, corpus, tmp_path):
    fx, docs = corpus
    # find a page with a same-host relative link that resolves
    start = None
    for url, raw in sorted(fx.documents_raw.items()):
        links = [
            s for s in clean_spans(raw)
            if s["kind"] == "link"
            and "javascript" not in s["media_ref"]
            and "mailto" not in s["media_ref"]
        ]
        if links:
            start = url
            break
    assert start is not None
    c = SparkCrawlClient(spark, documents=docs, out_dir=str(tmp_path))
    c.run_spider()
    c.load_website(start)
    c.click_xpath("//a")
    assert c.current_url != start and c.current_url.startswith("http")

    with pytest.raises(LookupError):
        c.click_name("no link has this exact text, surely")


def test_seed_quirk_applied(spark, corpus, tmp_path):
    fx, docs = corpus
    url = sorted(fx.documents_raw)[0]
    bare = url.split("://", 1)[1]
    c = SparkCrawlClient(spark, documents=docs, out_dir=str(tmp_path))
    c.run_spider()
    if "http" not in bare:  # quirk prepends http:// only then
        c.load_website(bare)
        assert c.current_url == "http://" + bare


def test_transport_mode_over_real_http(spark, tmp_path):
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from docrawl_spark.operators import transport as tr

    fx = generate_web(seed=37)
    urls = sorted(fx.documents_raw)
    pages = {
        f"/{i}": spans_to_html(fx.documents_raw[u]).encode()
        for i, u in enumerate(urls)
    }
    png = bytes.fromhex("89504e470d0a1a0a") + b"rest-not-fetched"

    class H(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def do_GET(self):
            if self.path.startswith("/static/"):
                body = png
                ct = "image/png"
            else:
                body = pages.get(self.path)
                ct = "text/html"
            if body is None:
                self.send_response(404)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", ct)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        c = SparkCrawlClient(
            spark, transport=tr.pooled_http_transport, out_dir=str(tmp_path)
        )
        c.run_spider()
        c.load_website(f"{base}/0")
        assert c.status == 200
        assert c.get_browser_headers().get("content-type") == "text/html"
        els = c.scan_web_page(incl_texts=True, incl_links=True)
        assert els  # real HTML parsed into spans
        c.extract_xpath("//p", "page.txt")
        assert (tmp_path / "page.txt").read_text()

        # image download over HTTP: bytes land on disk, ?query stripped
        # for the extension (docrawl_core.py:809,829)
        img_page = next(
            i for i, u in enumerate(urls)
            if any(s["kind"] == "image" for s in fx.documents_raw[u])
        )
        c.load_website(f"{base}/{img_page}")
        saved = c.download_images("//img", "img")
        assert saved, "page was chosen to carry an image span"
        for p in saved:
            assert p.endswith(".png")
            with open(p, "rb") as f:
                assert f.read() == png
        c.close_browser()
    finally:
        srv.shutdown()
        tr.close_pool()
