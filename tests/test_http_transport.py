"""Real HTTP transport (operators/transport.py) against an in-process
localhost server: capture, pooling, retries, error rows, and
schedule_timeline dispatch honoring — the production fetch legs the
fake-transport contract tests could not cover."""

from __future__ import annotations

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pandas as pd
import pytest

from docrawl_spark.operators import transport as tr
from docrawl_spark.operators.fetch import http_fetch


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"  # keep-alive, so pooling is observable
    flaky_hits: dict[str, int] = {}

    def do_GET(self):  # noqa: N802 (stdlib naming)
        if self.path.startswith("/ok"):
            body = f"<html><body>page {self.path}</body></html>".encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("X-Probe", "yes")
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/flaky":
            n = self.flaky_hits.get("n", 0)
            self.flaky_hits["n"] = n + 1
            if n == 0:
                # kill the socket mid-request -> transport must raise,
                # evict the pooled conn, and succeed on retry
                self.connection.close()
                return
            body = b"recovered"
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            body = b"nope"
            self.send_response(404)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    tr.close_pool()


def test_transport_captures_response(server):
    tr.close_pool()
    r = tr.pooled_http_transport(f"{server}/ok/1", 5.0, 0)
    assert r["status"] == 200
    assert b"page /ok/1" in r["content"]
    assert r["content_type"].startswith("text/html")
    assert r["headers"]["x-probe"] == "yes"
    assert r["error"] is None and r["elapsed_ms"] >= 0
    assert r["fetched_at"] is not None


def test_transport_404_is_a_row_not_an_error(server):
    r = tr.pooled_http_transport(f"{server}/missing", 5.0, 0)
    assert r["status"] == 404 and r["content"] == b"nope"


def test_connection_pool_reuses_socket(server):
    tr.close_pool()
    tr.pooled_http_transport(f"{server}/ok/1", 5.0, 0)
    conn1 = next(iter(tr._POOL.values()))
    sock1 = conn1.sock
    tr.pooled_http_transport(f"{server}/ok/2", 5.0, 0)
    assert len(tr._POOL) == 1
    assert next(iter(tr._POOL.values())).sock is sock1  # same live socket


def test_transport_raises_on_dead_socket_then_recovers(server):
    _Handler.flaky_hits.clear()
    tr.close_pool()
    with pytest.raises(Exception):
        tr.pooled_http_transport(f"{server}/flaky", 5.0, 0)
    assert not tr._POOL  # evicted
    r = tr.pooled_http_transport(f"{server}/flaky", 5.0, 1)
    assert r["status"] == 200 and r["content"] == b"recovered"


def test_transport_rejects_non_http_scheme():
    with pytest.raises(ValueError, match="unsupported scheme"):
        tr.pooled_http_transport("ftp://x.test/a", 1.0, 0)


def test_http_fetch_end_to_end_over_real_server(spark, server):
    """The full Spark mapInPandas path with the REAL transport: 200,
    404, and a refused port as an error row (one dead url never kills
    the stage)."""
    refused = "http://127.0.0.1:9/refused"  # port 9 (discard) -> refused
    urls = spark.createDataFrame(
        [(f"{server}/ok/a",), (f"{server}/missing",), (refused,)], "url string"
    )
    out = http_fetch(
        urls, timeout_s=5.0, retries=1, transport=tr.pooled_http_transport
    )
    rows = {r["url"]: r for r in out.collect()}
    assert rows[f"{server}/ok/a"]["status"] == 200
    assert bytes(rows[f"{server}/ok/a"]["content"]).startswith(b"<html>")
    assert rows[f"{server}/missing"]["status"] == 404
    assert rows[refused]["status"] == 0 and rows[refused]["error"]


def test_scheduled_batches_honor_dispatch_times():
    """Fake clock/sleeper: rows must be processed in scheduled order
    with a sleep to each instant that is still in the future."""
    now = {"t": 1000.0}
    sleeps: list[float] = []

    def clock():
        return now["t"]

    def sleeper(s):
        sleeps.append(round(s, 6))
        now["t"] += s

    fetched: list[str] = []

    def transport(url, timeout_s, attempt):
        fetched.append(url)
        return {"url": url, "status": 200}

    gen = tr.make_scheduled_fetch_batches(
        transport, wave_start_epoch_s=1000.0, clock=clock, sleeper=sleeper
    )
    pdf = pd.DataFrame(
        {
            "url": ["u3", "u1", "u2"],
            "scheduled_at_ms": [2000, 0, 500],
        }
    )
    out = pd.concat(list(gen(iter([pdf]))), ignore_index=True)
    assert fetched == ["u1", "u2", "u3"]  # timeline order, not input order
    assert sleeps == [0.5, 1.5]  # u1 due immediately; then +0.5s; then +1.5s
    assert list(out["status"]) == [200, 200, 200]


def test_scheduled_http_fetch_end_to_end(spark, server):
    """Distributed scheduled fetch over the real server: tiny real
    delays, asserting per-host serialization and spacing actually
    happened (coarse wall check)."""
    rows = [
        (f"{server}/ok/{i}", 7, i * 120) for i in range(3)  # one host, 120ms apart
    ]
    df = spark.createDataFrame(rows, "url string, host_hash long, scheduled_at_ms long")
    t0 = time.time()
    out = tr.scheduled_http_fetch(
        df, wave_start_epoch_s=t0, timeout_s=5.0, n_partitions=2
    ).collect()
    elapsed = time.time() - t0
    assert sorted(r["status"] for r in out) == [200, 200, 200]
    assert elapsed >= 0.24  # the last dispatch was scheduled at +240ms
