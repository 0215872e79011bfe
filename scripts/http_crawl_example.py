"""End-to-end REAL-HTTP crawl demo: render the deterministic fixture
web to HTML, serve it from an in-process localhost server, fetch it
with the pooled stdlib transport, parse HTML back to span documents,
and run the full wave-loop crawl — then verify the result equals the
synthetic-fetch crawl (the engine's correctness twin).

Run: python scripts/http_crawl_example.py
"""
from __future__ import annotations

import os
import sys
import tempfile
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from pyspark.sql import functions as F

    from docrawl_spark.operators import transport as tr
    from docrawl_spark.operators.fetch import http_fetch
    from docrawl_spark.operators.htmlparse import parse_fetched_html
    from docrawl_spark.plans.crawl import run_crawl
    from docrawl_spark.session import get_spark
    from docrawl_spark.sources.fixtures import fixture_to_dfs, generate_web
    from docrawl_spark.sources.htmlrender import (
        CONTEXT_CLASS,
        COOKIES_CLASS,
        spans_to_html,
    )
    from docrawl_spark.sources.schemas import DOCUMENTS_SCHEMA
    from docrawl_spark.sources.storage import Warehouse

    spark = get_spark(cpus=8)
    fx = generate_web(seed=77)
    urls = sorted(fx.documents_raw)
    pages = {
        f"/d/{i}": spans_to_html(fx.documents_raw[u], title=u).encode()
        for i, u in enumerate(urls)
    }

    class Handler(BaseHTTPRequestHandler):
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

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    print(f"serving {len(pages)} fixture pages at {base}")

    # 1. fetch the whole web over real HTTP, parse to span documents
    mapping = spark.createDataFrame(
        [(f"{base}/d/{i}", u) for i, u in enumerate(urls)],
        "url string, orig_url string",
    )
    fetched = http_fetch(mapping, retries=1, transport=tr.pooled_http_transport)
    parsed = parse_fetched_html(
        fetched, context_class=CONTEXT_CLASS, cookies_class=COOKIES_CLASS
    )
    docs_http = parsed.join(mapping, parsed["doc_id"] == mapping["url"]).select(
        F.col("orig_url").alias("doc_id"), "spans"
    )
    rows = [(r["doc_id"], [tuple(s) for s in r["spans"]]) for r in docs_http.collect()]
    docs_http = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    print("fetched+parsed docs:", docs_http.count())

    # 2. full crawl over the HTTP-derived corpus vs the synthetic one
    docs_ref, hosts_df, seeds_df = fixture_to_dfs(spark, fx)
    res_http = run_crawl(
        spark, docs_http, hosts_df, seeds_df, max_waves=6,
        warehouse=Warehouse(tempfile.mkdtemp(), spark), collect_visits=True,
    )
    res_ref = run_crawl(
        spark, docs_ref, hosts_df, seeds_df, max_waves=6,
        warehouse=Warehouse(tempfile.mkdtemp(), spark), collect_visits=True,
    )
    print("visits over HTTP :", len(res_http.visits))
    print("visits synthetic :", len(res_ref.visits))
    print("crawl order equal:", res_http.visits == res_ref.visits)
    print("seen sets equal  :", set(res_http.seen_urls) == set(res_ref.seen_urls))
    srv.shutdown()
    tr.close_pool()


if __name__ == "__main__":
    main()
