"""The fetch stage (reference O2 ``load_website``, SURVEY.md §3.1).

In this engine "fetching" a wave is a JOIN, not a side effect: the
selected frontier joins the documents corpus on canonical URL. For
tests/bench the corpus is the deterministic synthetic web (TESTDATA /
fixtures) — a *synthetic fetch*; in production the same stage is an
Arrow-batched HTTP fetch over ``mapInPandas`` (stubbed here: the
sandbox has no network and no HTTP client beyond requests' absence),
followed by the HTML→spans parser. Either way the output schema is
identical, so everything downstream is oblivious.

Scale notes: the join key is the canonical url string; at cluster scale
both sides are bucketed by xxhash64(url/doc_id) so this is co-located.
A miss (no document) is a 404: still visited, still seen, no spans.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def synthetic_headers_col(url, host, status, n_spans) -> "F.Column":
    """Deterministic response-header map for the synthetic fetch —
    the D7 side-channel the reference captures on every page load via
    selenium-wire (docrawl_core.py:1064-1083, stored
    docrawl_client.py:54-71). A real fetch stage fills this from the
    HTTP response; the synthetic twin derives the same shape from the
    corpus so header queries are testable offline. All values are
    codegen-cheap JVM expressions (no HOF, no UDF) — this runs inside
    the wave hot loop."""
    return F.create_map(
        F.lit("content-type"),
        F.when(status == 200, F.lit("text/html; charset=utf-8")).otherwise(
            F.lit("text/plain")
        ),
        F.lit("content-length"),
        n_spans.cast("string"),
        F.lit("server"),
        F.concat(F.lit("synth/"), F.coalesce(host, F.lit("unknown"))),
        F.lit("etag"),
        F.lower(F.hex(F.xxhash64(url))),
    )


def synthetic_cookies_col(url, host, status, visit_rank) -> "F.Column":
    """Deterministic cookie jar for the synthetic fetch — the second
    D7 side-channel (reference: ``get_browser_cookies()`` returns the
    selenium driver's cookie list after every load, docrawl_core.py:
    1064-1083, stored docrawl_client.py:54-71). Shape:
    array<struct<name,value,domain>>. A 200 page sets a session cookie
    (md5-derived, DuckDB-reproducible) plus a last_visit counter; a 404
    carries only the session cookie (the jar persists across misses).
    Pure JVM exprs — wave-hot-loop safe."""
    session = F.struct(
        F.lit("session_id").alias("name"),
        F.substring(F.md5(F.concat(F.lit("sess|"), F.coalesce(host, F.lit("")))), 1, 16)
        .alias("value"),
        F.coalesce(host, F.lit("unknown")).alias("domain"),
    )
    last_visit = F.struct(
        F.lit("last_visit").alias("name"),
        visit_rank.cast("string").alias("value"),
        F.coalesce(host, F.lit("unknown")).alias("domain"),
    )
    return F.when(status == 200, F.array(session, last_visit)).otherwise(
        F.array(session)
    )


def synthetic_json_requests_col(url, host, status, n_spans) -> "F.Column":
    """Deterministic XHR sub-request capture — the third D7 side-channel
    (reference: every JSON sub-request's {url, status_code, headers,
    content} is kept per page load, docrawl_core.py:1064-1083; replayed
    by ``get_browser_json_requests()``). Shape:
    array<struct<url,status,content_type>>. A 200 page with n spans
    issues min(n, 3) API calls against its own host; a 404 issues none.
    NOTE: sequence(1, 0) DESCENDS in Spark — the n >= 1 guard is
    load-bearing."""
    n = F.least(n_spans, F.lit(3))
    reqs = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.struct(
            F.concat(
                F.lit("https://"),
                F.coalesce(host, F.lit("unknown")),
                F.lit("/api/v"),
                i.cast("string"),
                F.lit("?page="),
                F.substring(F.md5(url), 1, 12),
            ).alias("url"),
            F.lit(200).alias("status"),
            F.lit("application/json").alias("content_type"),
        ),
    )
    empty = F.array().cast("array<struct<url:string,status:int,content_type:string>>")
    return F.when((status == 200) & (n >= 1), reqs).otherwise(empty)


def synthetic_fetch(selected: DataFrame, documents: DataFrame) -> DataFrame:
    """selected frontier (url, visit_rank, wave, depth, ...) × documents
    (doc_id, spans) → fetched rows with status + spans + the full D7
    side-channel capture (headers map, cookie jar, JSON sub-requests).

    Left join: frontier rows without a document become 404s (still
    visited, still seen, empty spans, text/plain headers)."""
    docs = documents.select(F.col("doc_id"), F.col("spans"))
    spans_type = docs.schema["spans"].dataType
    joined = selected.join(docs, selected["url"] == docs["doc_id"], "left")
    spans_filled = F.coalesce(F.col("spans"), F.array().cast(spans_type))
    status = (
        F.when(F.col("doc_id").isNotNull(), F.lit(200)).otherwise(F.lit(404))
    )
    n_spans = F.size(spans_filled)
    return joined.select(
        selected["*"],
        status.alias("status"),
        spans_filled.alias("spans"),
        n_spans.alias("n_spans"),
        synthetic_headers_col(
            selected["url"], selected["host"], status, n_spans
        ).alias("headers"),
        synthetic_cookies_col(
            selected["url"], selected["host"], status, selected["visit_rank"]
        ).alias("cookies"),
        synthetic_json_requests_col(
            selected["url"], selected["host"], status, n_spans
        ).alias("json_requests"),
    )


# --------------------------------------------------------------------------
# Production fetch shape (stub): Arrow-batched HTTP over mapInPandas.
# --------------------------------------------------------------------------

FETCHED_SCHEMA_DDL = (
    "url string, status int, content binary, content_type string, "
    "headers map<string,string>, fetched_at timestamp, elapsed_ms double, "
    "error string"
)

_FETCHED_COLUMNS = [
    "url", "status", "content", "content_type",
    "headers", "fetched_at", "elapsed_ms", "error",
]


def make_fetch_batches(
    transport,
    timeout_s: float,
    batch_size: int,
    retries: int = 2,
):
    """Build the mapInPandas generator for the production fetch stage.

    ``transport(url, timeout_s, attempt) -> dict`` performs ONE request
    (attempt is 0-based, so a client can back off); it must be a
    module-level callable (pickled to executors). Contract enforced
    here, independent of any real client (tested with a fake —
    tests/test_streaming_and_commands.py):

    - batching: each yielded frame holds at most ``batch_size`` rows,
      bounding per-task response memory regardless of partition size;
    - retries: a transport exception retries up to ``retries`` times;
      success on a later attempt is a normal row;
    - error shaping: a url failing every attempt becomes a
      status=0 row with the exception text in ``error`` — one dead url
      never kills the batch, the task, or the stage;
    - schema: missing response keys are filled with typed nulls so the
      Arrow batch always matches FETCHED_SCHEMA_DDL.
    """

    def _fetch_one(url: str) -> dict:
        last_err: Exception | None = None
        for attempt in range(retries + 1):
            try:
                resp = dict(transport(url, timeout_s, attempt))
                break
            except Exception as e:  # noqa: BLE001 — error rows, not crashes
                last_err = e
        else:
            return {
                "url": url, "status": 0, "content": None, "content_type": None,
                "headers": None, "fetched_at": None, "elapsed_ms": None,
                "error": f"{type(last_err).__name__}: {last_err}",
            }
        resp.setdefault("url", url)
        resp.setdefault("error", None)
        for k in _FETCHED_COLUMNS:
            resp.setdefault(k, None)
        return {k: resp[k] for k in _FETCHED_COLUMNS}

    def fetch_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for start in range(0, len(pdf), batch_size):
                urls = pdf["url"].iloc[start : start + batch_size].tolist()
                yield pd.DataFrame(
                    [_fetch_one(u) for u in urls], columns=_FETCHED_COLUMNS
                )

    return fetch_batches


def http_fetch(
    selected: DataFrame,
    timeout_s: float = 10.0,
    batch_size: int = 64,
    retries: int = 2,
    transport=None,
) -> DataFrame:
    """Distributed batched HTTP fetch (production path).

    The Spark-side plumbing is real and contract-tested with a fake
    transport (mapInPandas over url batches, stable output schema,
    per-partition batching, per-url retry + error rows); the DEFAULT
    transport raises, because this sandbox is offline. Pass a real
    client (requests/httpx with per-host connection pools) as
    ``transport`` on a cluster."""
    fetch_batches = make_fetch_batches(
        transport or _offline_transport, timeout_s, batch_size, retries
    )
    return selected.select("url").mapInPandas(fetch_batches, FETCHED_SCHEMA_DDL)


def _offline_transport(url: str, timeout_s: float, attempt: int) -> dict:
    raise NotImplementedError(
        "offline sandbox: plug an HTTP client here on a real cluster; "
        "tests use synthetic_fetch (a join against the corpus)"
    )


_LINK_SEG_RE = r"<[^>]*>[^,]*"
_LINK_TARGET_RE = r"<([^>]*)>"
_LINK_REL_RE = r"""(?i)rel\s*=\s*"?([a-zA-Z-]+)"?"""


def link_header_relations(
    fetch_log: "DataFrame",
    url_col: str = "url",
    headers_col: str = "headers",
) -> "DataFrame":
    """RFC 8288 ``Link`` response-header parsing: one row per link
    relation — ``(url, link_order, target, rel lowercase)``. The
    header-level discovery channel for pagination (``rel=next/prev``,
    feeding the same chains as operators/links pagination mining),
    canonical URLs (``rel=canonical``, merging with the in-page
    declaration), and alternates — servers emit these even on
    non-HTML responses where in-page extraction sees nothing.

    Segments split at commas outside ``<>`` (URLs carry no raw comma
    per RFC 3986); two-stage lookahead-free regexes, identical on
    Java regex and RE2. Pure scan pipeline over the fetch log.
    """
    segs = fetch_log.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(
                F.coalesce(
                    F.element_at(F.col(headers_col), F.lit("link")), F.lit("")
                ),
                F.lit(_LINK_SEG_RE),
                0,
            )
        ).alias("link_order", "_seg"),
    )
    target = F.regexp_extract("_seg", _LINK_TARGET_RE, 1)
    rel = F.lower(F.regexp_extract("_seg", _LINK_REL_RE, 1))
    return segs.select(
        "url", "link_order", target.alias("target"), rel.alias("rel")
    ).where((F.col("target") != "") & (F.col("rel") != ""))
