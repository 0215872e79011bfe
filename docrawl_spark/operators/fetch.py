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


def synthetic_fetch(selected: DataFrame, documents: DataFrame) -> DataFrame:
    """selected frontier (url, visit_rank, wave, depth, ...) × documents
    (doc_id, spans) → fetched rows with status + spans + headers map.

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
    )


# --------------------------------------------------------------------------
# Production fetch shape (stub): Arrow-batched HTTP over mapInPandas.
# --------------------------------------------------------------------------

FETCHED_SCHEMA_DDL = (
    "url string, status int, content binary, content_type string, "
    "headers map<string,string>, fetched_at timestamp, elapsed_ms double"
)


def http_fetch(selected: DataFrame, timeout_s: float = 10.0, batch_size: int = 64) -> DataFrame:
    """Distributed batched HTTP fetch (production path) — STUB.

    The Spark-side plumbing is real (mapInPandas over url batches,
    stable output schema, per-partition batching so each task holds at
    most ``batch_size`` responses in memory); the network call itself
    raises, because this sandbox is offline. Swap ``_do_fetch`` for a
    real client (requests/httpx with per-host connection pools) on a
    cluster."""

    def fetch_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                yield _do_fetch(chunk, timeout_s)

    return selected.select("url").mapInPandas(fetch_batches, FETCHED_SCHEMA_DDL)


def _do_fetch(chunk: pd.DataFrame, timeout_s: float) -> pd.DataFrame:
    raise NotImplementedError(
        "offline sandbox: plug an HTTP client here on a real cluster; "
        "tests use synthetic_fetch (a join against the corpus)"
    )
