"""WARC sink/source roundtrip (sources/warc.py) and robots.txt-over-
HTTP fetching (operators/transport.fetch_robots_blobs) against a
localhost server."""

from __future__ import annotations

import glob
import gzip
import threading

import pytest
from pyspark.sql import functions as F

from docrawl_spark.sources import warc


# -- scalar record layer ----------------------------------------------------


def test_record_render_parse_roundtrip():
    body = b"\x89PNG\r\n\x1a\nbinary \x00 body"
    rec = warc._render_record(
        "https://h.test/a?x=1", 200,
        {"Content-Type": "image/png", "X-Probe": "v"},
        body, "2026-01-02T03:04:05Z",
    )
    parsed = warc._parse_record(rec)
    assert parsed["url"] == "https://h.test/a?x=1"
    assert parsed["status"] == 200
    assert parsed["content"] == body
    assert parsed["headers"]["x-probe"] == "v"
    assert parsed["content_type"] == "image/png"
    assert parsed["warc_date"] == "2026-01-02T03:04:05Z"


def test_multi_member_gzip_parse():
    recs = [
        warc._render_record(f"https://h.test/{i}", 200, {}, f"b{i}".encode(),
                            "2026-01-01T00:00:00Z")
        for i in range(3)
    ]
    blob = b"".join(gzip.compress(r, 6, mtime=0) for r in recs)
    got = [warc._parse_record(m) for m in warc._parse_members(blob)]
    assert [g["content"] for g in got] == [b"b0", b"b1", b"b2"]
    # torn tail: valid members still parse
    got2 = list(warc._parse_members(blob + b"\x1f\x8b\x08garbage"))
    assert len(got2) == 3


# -- Spark roundtrip --------------------------------------------------------


@pytest.fixture()
def fetched(spark):
    rows = [
        ("https://a.test/page", 200, bytearray(b"<html>A</html>"),
         {"content-type": "text/html", "set-cookie": "s=1"}),
        ("https://b.test/bin", 404, bytearray(b"\x00\x01\x02"),
         {"content-type": "application/octet-stream"}),
        ("https://c.test/dead", 0, None, None),
    ]
    return spark.createDataFrame(
        rows,
        "url string, status int, content binary, headers map<string,string>",
    )


def test_warc_spark_roundtrip(spark, fetched, tmp_path):
    out = str(tmp_path / "warc")
    warc.write_warc(fetched, out)
    files = glob.glob(out + "/*.warc.gz")
    assert files and not glob.glob(out + "/*.tmp")
    back = {r["url"]: r for r in warc.read_warc(spark, out).collect()}
    assert len(back) == 3
    assert bytes(back["https://a.test/page"]["content"]) == b"<html>A</html>"
    assert back["https://a.test/page"]["headers"]["set-cookie"] == "s=1"
    assert back["https://b.test/bin"]["status"] == 404
    assert bytes(back["https://b.test/bin"]["content"]) == b"\x00\x01\x02"
    assert back["https://c.test/dead"]["status"] == 0
    assert bytes(back["https://c.test/dead"]["content"]) == b""
    assert all(r["warc_date"] == "2000-01-01T00:00:00Z" for r in back.values())


def test_warc_deterministic_bytes(spark, fetched, tmp_path):
    a, b = str(tmp_path / "w1"), str(tmp_path / "w2")
    one_part = fetched.repartition(1)
    warc.write_warc(one_part, a)
    warc.write_warc(one_part, b)
    fa, fb = sorted(glob.glob(a + "/*")), sorted(glob.glob(b + "/*"))
    assert [f.split("/")[-1] for f in fa] == [f.split("/")[-1] for f in fb]
    for x, y in zip(fa, fb):
        with open(x, "rb") as fx, open(y, "rb") as fy:
            assert fx.read() == fy.read()


def test_warc_date_column(spark, tmp_path):
    df = spark.createDataFrame(
        [("https://a.test/x", 200, bytearray(b"z"),
          {"content-type": "text/plain"}, "2026-08-22T10:00:00Z")],
        "url string, status int, content binary, "
        "headers map<string,string>, fetched_iso string",
    )
    out = str(tmp_path / "warc")
    warc.write_warc(df, out, date_col="fetched_iso")
    r = warc.read_warc(spark, out).first()
    assert r["warc_date"] == "2026-08-22T10:00:00Z"


# -- robots over HTTP -------------------------------------------------------


def test_fetch_robots_blobs_over_http(spark, tmp_path):
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from docrawl_spark.operators import transport as tr

    bodies = {
        "/hostA.test/robots.txt": (200, b"User-agent: *\nDisallow: /private\nCrawl-delay: 2\n"),
        "/hostB.test/robots.txt": (404, b"nope"),
        "/hostC.test/robots.txt": (503, b"down"),
        # latin-1 bytes: ANSI decode would throw; the sweep must not
        "/hostD.test/robots.txt": (200, b"User-agent: *\nDisallow: /caf\xe9\n"),
    }

    class H(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def do_GET(self):
            status, body = bodies.get(self.path, (404, b""))
            self.send_response(status)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        hosts = spark.createDataFrame(
            [("hostA.test",), ("hostB.test",), ("hostC.test",), ("hostD.test",)],
            "host string",
        )
        got = {
            r["host"]: r
            for r in tr.fetch_robots_blobs(
                hosts,
                transport=tr.pooled_http_transport,
                url_rewrite=lambda u: F.regexp_replace(
                    u, r"^http://", f"{base}/"
                ),
            ).collect()
        }
        assert "Disallow: /private" in got["hostA.test"]["robots_blob"]
        assert not got["hostA.test"]["robots_unreachable"]
        # 4xx -> unrestricted empty blob (RFC 9309 2.3.1.3)
        assert got["hostB.test"]["robots_blob"] == ""
        assert not got["hostB.test"]["robots_unreachable"]
        # 5xx -> MUST NOT crawl (2.3.1.4), surfaced as the flag
        assert got["hostC.test"]["robots_unreachable"]
        # malformed bytes decode with U+FFFD instead of killing the job
        assert "Disallow: /caf�" in got["hostD.test"]["robots_blob"]
        assert not got["hostD.test"]["robots_unreachable"]

        # the live blob feeds the existing RFC evaluator + crawl-delay
        from docrawl_spark.operators.politeness import crawl_delay_col

        d = (
            spark.createDataFrame(
                [(got["hostA.test"]["robots_blob"],)], "robots_blob string"
            )
            .select(crawl_delay_col(F.col("robots_blob")).alias("d"))
            .first()["d"]
        )
        assert d == 2.0
    finally:
        srv.shutdown()
        tr.close_pool()
