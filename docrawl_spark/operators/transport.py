"""Real HTTP transport for the production fetch stage.

`operators/fetch.http_fetch` ships the Spark-side plumbing (mapInPandas
batching, retries, error rows) with a transport injection point; the
sandbox default raises because there is no external network. This
module supplies the REAL client legs, stdlib-only so they run on any
cluster with no extra wheels (reference network stack:
docrawl_core.py:1050-1088 — selenium page loads + selenium-wire request
capture; here a direct HTTP/1.1 client):

- :func:`pooled_http_transport` — a keep-alive ``http.client``
  connection pool PER EXECUTOR PROCESS (module global: Python workers
  are forked per executor, so each holds its own pool and sockets are
  never pickled). One host's requests on a worker reuse one socket —
  the per-host connection pooling a polite crawler wants, for free.
- :func:`make_scheduled_fetch_batches` /
  :func:`scheduled_http_fetch` — the dispatch leg that honors
  `operators/politeness.schedule_timeline`'s ``scheduled_at_ms``: rows
  are host-partitioned and time-sorted, and the worker sleeps until
  each URL's scheduled instant before issuing the request — the
  reference's ``time.sleep`` politeness (docrawl_core.py:1088,1105)
  re-expressed as data the executors obey. Clock and sleeper are
  injectable, so the timing contract is unit-tested with a fake clock
  and integration-tested against a real localhost server.

Scale shape: politeness correctness needs each host's timeline to be
executed by ONE task in time order — exactly the
``repartition(host_hash) + sortWithinPartitions(scheduled_at_ms)``
layout `scheduled_http_fetch` builds. Sleeping happens on executors
(bounded by the wave horizon), never on the driver; a straggler host
with a long Crawl-delay stretches only its own task, and AQE cannot
coalesce the layout away because the count is user-specified.

Tested end-to-end against an in-process ``http.server`` in
tests/test_http_transport.py (localhost needs no external network) —
status/header/content capture, 404s, connection reuse, retry-then-
success, connection-refused error rows, and dispatch-time honoring.
"""

from __future__ import annotations

import email.utils
import http.client
import time
from collections.abc import Iterator
from datetime import datetime, timezone
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from docrawl_spark.operators.fetch import FETCHED_SCHEMA_DDL, _FETCHED_COLUMNS

__all__ = [
    "pooled_http_transport",
    "make_scheduled_fetch_batches",
    "scheduled_http_fetch",
    "make_http_fetcher",
    "close_pool",
]

# one pool per Python worker process (never pickled, never shared)
_POOL: dict[tuple[str, str, int], http.client.HTTPConnection] = {}

_MAX_BODY_BYTES = 16 * 1024 * 1024  # cap runaway bodies; crawler pages are small
_USER_AGENT = "docrawl-spark/1.0"


def _connect(scheme: str, host: str, port: int, timeout_s: float):
    key = (scheme, host, port)
    conn = _POOL.get(key)
    if conn is None:
        cls = (
            http.client.HTTPSConnection
            if scheme == "https"
            else http.client.HTTPConnection
        )
        conn = cls(host, port, timeout=timeout_s)
        _POOL[key] = conn
    return conn


def close_pool() -> None:
    """Close every pooled connection in this process (test teardown /
    executor shutdown hook)."""
    for conn in _POOL.values():
        try:
            conn.close()
        except Exception:
            pass
    _POOL.clear()


def pooled_http_transport(url: str, timeout_s: float, attempt: int) -> dict:
    """One GET through the per-process keep-alive pool; raises on
    transport failure (the fetch wrapper's retry loop catches). On a
    retry (attempt > 0) the host's pooled socket is discarded first —
    a dead keep-alive connection must not poison every retry — and an
    exponential pre-request backoff applies (50 ms · 2^(attempt-1),
    capped at 2 s)."""
    parts = urlsplit(url)
    if parts.scheme not in ("http", "https"):
        raise ValueError(f"unsupported scheme: {url!r}")
    host = parts.hostname or ""
    port = parts.port or (443 if parts.scheme == "https" else 80)
    path = parts.path or "/"
    if parts.query:
        path += "?" + parts.query

    if attempt > 0:
        _POOL.pop((parts.scheme, host, port), None)
        time.sleep(min(0.05 * (2 ** (attempt - 1)), 2.0))

    conn = _connect(parts.scheme, host, port, timeout_s)
    started = time.monotonic()
    try:
        conn.request(
            "GET", path, headers={"User-Agent": _USER_AGENT, "Accept": "*/*"}
        )
        resp = conn.getresponse()
        body = resp.read(_MAX_BODY_BYTES + 1)
        if len(body) > _MAX_BODY_BYTES:
            body = body[:_MAX_BODY_BYTES]
            # an over-cap body leaves unread bytes on the socket —
            # drop the connection rather than desync keep-alive framing
            _POOL.pop((parts.scheme, host, port), None)
            conn.close()
    except Exception:
        # broken socket: evict so the next attempt reconnects
        _POOL.pop((parts.scheme, host, port), None)
        try:
            conn.close()
        except Exception:
            pass
        raise
    elapsed_ms = (time.monotonic() - started) * 1000.0
    headers = {k.lower(): v for k, v in resp.getheaders()}
    fetched_at = datetime.now(timezone.utc)
    if "date" in headers:
        try:
            fetched_at = email.utils.parsedate_to_datetime(headers["date"])
        except Exception:
            pass
    return {
        "url": url,
        "status": int(resp.status),
        "content": bytes(body),
        "content_type": headers.get("content-type"),
        "headers": headers,
        "fetched_at": fetched_at,
        "elapsed_ms": elapsed_ms,
        "error": None,
    }


def make_scheduled_fetch_batches(
    transport,
    wave_start_epoch_s: float,
    timeout_s: float = 10.0,
    batch_size: int = 64,
    retries: int = 2,
    clock=time.time,
    sleeper=time.sleep,
):
    """mapInPandas generator over (url, scheduled_at_ms) rows: process
    rows in scheduled order, sleeping until ``wave_start_epoch_s +
    scheduled_at_ms/1000`` before each request. Retry/error shaping is
    `fetch.make_fetch_batches`'s, reused verbatim on one-row frames
    (per-url retries, status=0 error rows, typed-null fill), so the
    two fetch paths cannot drift. ``clock``/``sleeper`` injection
    makes the timing contract testable without wall-clock waits."""
    from docrawl_spark.operators.fetch import make_fetch_batches

    inner = make_fetch_batches(transport, timeout_s, batch_size, retries)

    def fetch_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.sort_values("scheduled_at_ms", kind="mergesort")
            sched = pdf["scheduled_at_ms"].tolist()
            urls = pdf["url"].tolist()
            # walk the timeline: sleep to each row's instant, fetch one
            for i in range(0, len(urls), batch_size):
                rows = []
                for j in range(i, min(i + batch_size, len(urls))):
                    target = wave_start_epoch_s + sched[j] / 1000.0
                    wait = target - clock()
                    if wait > 0:
                        sleeper(wait)
                    one = pd.DataFrame({"url": [urls[j]]})
                    rows.extend(df for df in inner(iter([one])))
                if rows:
                    yield pd.concat(rows, ignore_index=True)

    return fetch_batches


def scheduled_http_fetch(
    selected: DataFrame,
    wave_start_epoch_s: float,
    timeout_s: float = 10.0,
    batch_size: int = 64,
    retries: int = 2,
    transport=None,
    n_partitions: int | None = None,
) -> DataFrame:
    """Politeness-honoring distributed fetch: host-partitioned,
    time-sorted, dispatched at ``schedule_timeline``'s instants.

    Input needs (url, host_hash, scheduled_at_ms) — the exact output
    of the politeness stage. The explicit user-specified repartition
    count keeps AQE from coalescing the host layout (CLAUDE.md AQE
    fan-out note); sortWithinPartitions orders each host's timeline,
    and mapInPandas consumes rows in partition order, so per-host
    requests are serial and spaced."""
    n = n_partitions or int(
        selected.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    laid_out = (
        selected.select("url", "host_hash", "scheduled_at_ms")
        .repartition(n, "host_hash")
        .sortWithinPartitions("scheduled_at_ms")
        .select("url", "scheduled_at_ms")
    )
    batches = make_scheduled_fetch_batches(
        transport or pooled_http_transport,
        wave_start_epoch_s,
        timeout_s,
        batch_size,
        retries,
    )
    return laid_out.mapInPandas(batches, FETCHED_SCHEMA_DDL)


def make_http_fetcher(
    transport=None,
    url_rewrite=None,
    timeout_s: float = 10.0,
    batch_size: int = 64,
    retries: int = 2,
    context_class: str | None = None,
    cookies_class: str | None = None,
    encoding: str = "utf-8",
):
    """Build a ``run_crawl(fetcher=...)`` wave-fetch stage that goes
    over REAL HTTP: batched GETs (`fetch.make_fetch_batches` plumbing,
    this module's pooled transport by default) + HTML→spans parse
    (`htmlparse.parse_fetched_html`) + the scan kernel
    (`scan.clean_spans_col`), producing exactly the synthetic_fetch
    output contract — the wave loop, seen-set, discovery, checkpoints
    and resume run unmodified on live pages.

    ``url_rewrite``: optional Column→Column mapping from the crawl's
    canonical URL to the URL actually requested (test harnesses route
    fixture hosts to a localhost server this way; a production proxy
    fleet can route through a gateway the same way). The crawl's
    identity (dedup, seen-set, discovery base) stays the CANONICAL
    url — only the wire request is rewritten.

    D7 capture mapping for plain HTTP (no browser): headers = the real
    response headers; cookies = parsed ``Set-Cookie`` (name/value +
    the response host as domain); json_requests = empty (XHR capture
    needs a JS engine — documented drop). A non-200/failed URL is
    still a visited fetch row with empty spans, exactly like the
    synthetic 404 leg; transport-dead URLs surface as status=0 rows
    (the reference raises PageDidNotLoadError and moves on,
    docrawl_client.py:126-154 — here they are data, not exceptions).

    Politeness note: per-wave spacing can additionally route through
    `scheduled_http_fetch` when the selected frame carries
    ``scheduled_at_ms``; this default fetcher relies on the wave
    loop's per-host budget selection for rate control."""
    from docrawl_spark.operators.fetch import http_fetch
    from docrawl_spark.operators.htmlparse import parse_fetched_html
    from docrawl_spark.operators.scan import clean_spans_col

    tp = transport or pooled_http_transport

    def fetcher(selected: DataFrame) -> DataFrame:
        fetch_url = (
            url_rewrite(F.col("url")) if url_rewrite is not None else F.col("url")
        )
        to_fetch = selected.select(
            F.col("url").alias("canon_url"), fetch_url.alias("url")
        )
        resp = http_fetch(
            to_fetch,
            timeout_s=timeout_s,
            batch_size=batch_size,
            retries=retries,
            transport=tp,
        )
        parsed = parse_fetched_html(
            resp.where(F.col("status") == 200),
            content_type_col="content_type",
            encoding=encoding,
            context_class=context_class,
            cookies_class=cookies_class,
        )
        resp_keyed = (
            resp.withColumnRenamed("url", "fetch_url")
            .join(
                parsed.withColumnRenamed("doc_id", "fetch_url"),
                "fetch_url",
                "left",
            )
            .join(
                to_fetch.withColumnRenamed("url", "fetch_url"),
                "fetch_url",
            )
        )
        spans_type = (
            "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
        )
        raw_spans = F.coalesce(F.col("spans"), F.expr(f"CAST(array() AS {spans_type})"))
        clean = clean_spans_col(raw_spans)
        set_cookie = F.element_at(F.col("headers"), F.lit("set-cookie"))
        cookie = F.struct(
            F.regexp_extract(set_cookie, r"^\s*([^=;]+)=", 1).alias("name"),
            F.regexp_extract(set_cookie, r"^\s*[^=;]+=([^;]*)", 1).alias("value"),
            F.coalesce(
                F.regexp_extract(F.col("canon_url"), r"^[a-z]+://([^/]+)", 1),
                F.lit(""),
            ).alias("domain"),
        )
        cookies = F.when(
            set_cookie.isNotNull(), F.array(cookie)
        ).otherwise(
            F.expr(
                "CAST(array() AS array<struct<name:string,value:string,domain:string>>)"
            )
        )
        empty_reqs = F.expr(
            "CAST(array() AS array<struct<url:string,status:int,content_type:string>>)"
        )
        enriched = resp_keyed.select(
            F.col("canon_url"),
            F.coalesce(F.col("status"), F.lit(0)).alias("status"),
            clean.alias("spans"),
            F.coalesce(
                F.col("headers"), F.expr("CAST(map() AS map<string,string>)")
            ).alias("headers"),
            cookies.alias("cookies"),
            empty_reqs.alias("json_requests"),
        ).withColumn("n_spans", F.size("spans"))
        return selected.join(
            enriched, selected["url"] == enriched["canon_url"]
        ).drop("canon_url")

    return fetcher


def fetch_robots_blobs(
    hosts: DataFrame,
    transport=None,
    url_rewrite=None,
    timeout_s: float = 10.0,
    retries: int = 1,
    scheme: str = "http",
) -> DataFrame:
    """Fetch ``/robots.txt`` for every host over real HTTP → a hosts
    dimension with live ``robots_blob`` + ``robots_status`` columns,
    drop-in for the crawl's broadcast hosts dim (the reference relies
    on Scrapy/Selenium defaults; a real frontier must fetch policy
    itself — RFC 9309 §2.3: unreachable robots (5xx/network) means
    CRAWL NOTHING (blob '/'), while 4xx means no restrictions (empty
    blob)).

    The blob is the RAW robots.txt body, feeding the existing
    evaluators untouched (`politeness.robots_allowed_rfc_col` RFC
    engine, `select_agent_rules` UA groups, `crawl_delay_col`).
    Unreachability is an EXPLICIT column, not smuggled into the blob
    (a synthetic "Disallow: /" body would read correctly only under
    one of the two blob dialects this repo supports — the fixture
    prefix-gate vs the RFC file): ``robots_unreachable`` = True on
    5xx / transport-dead, and RFC 9309 §2.3.1.4 says such hosts MUST
    NOT be crawled — gate on it before the per-path evaluator. 4xx =
    no restrictions (empty blob, §2.3.1.3). ``url_rewrite`` routes
    the wire request (test harness → localhost; production → proxy
    gateway) exactly like `make_http_fetcher`.

    Scale shape: the hosts dim is bounded (unique hosts, not URLs), so
    this is one small mapInPandas sweep per robots-cache refresh
    cycle; pair with `politeness.robots_cache_schedule` for staleness.
    """
    from docrawl_spark.operators.fetch import http_fetch

    tp = transport or pooled_http_transport
    robots_url = F.concat(F.lit(f"{scheme}://"), F.col("host"), F.lit("/robots.txt"))
    fetch_url = url_rewrite(robots_url) if url_rewrite is not None else robots_url
    to_fetch = hosts.select(F.col("host"), fetch_url.alias("url"))
    resp = http_fetch(
        to_fetch, timeout_s=timeout_s, retries=retries, transport=tp
    ).withColumnRenamed("url", "fetch_url")
    keyed = to_fetch.withColumnRenamed("url", "fetch_url").join(resp, "fetch_url")
    # make_valid_utf8 (Spark 4): replacement-char decode — wild robots
    # bodies carry malformed bytes, and ANSI `decode` THROWS on them
    # (MALFORMED_CHARACTER_CODING), which would kill the whole sweep
    blob = F.when(
        F.col("status") == 200,
        F.expr("make_valid_utf8(coalesce(content, CAST('' AS BINARY)))"),
    ).otherwise(F.lit(""))
    unreachable = (F.col("status") == 0) | (F.col("status") >= 500)
    return keyed.select(
        "host",
        blob.alias("robots_blob"),
        F.col("status").alias("robots_status"),
        unreachable.alias("robots_unreachable"),
    )
