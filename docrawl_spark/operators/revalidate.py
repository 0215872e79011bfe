"""Conditional-GET revalidation: ETag / If-None-Match planning for
recrawl waves.

A recrawl wave should not re-download bytes that have not changed.
HTTP's contract: send the stored validator (``If-None-Match: <etag>``);
the server answers 304 (no body — cheap) when content is unchanged,
200 with a fresh body otherwise. The reference re-fetches every page
unconditionally (Selenium driver.get has no validator plumbing); at a
10^10-URL frontier, revalidation is the difference between shipping
the whole corpus every wave and shipping the delta.

Two batch stages, both plain DataFrame ops:

- :func:`revalidation_plan` — join recrawl candidates against the
  fetch log's newest etag per URL: candidates with a stored validator
  become conditional requests (``if_none_match`` set), the rest are
  unconditional. The fetch log is aggregated to one row per url
  (max fetched_at, its etag) before the join — a shrink-then-join,
  never a log-sized fan-out.
- :func:`classify_revalidated` — after the (synthetic or real) fetch
  produces the CURRENT etag, classify each row 304 (validator matches)
  vs 200, and account saved vs transferred bytes per host. The saved
  column is the wave's bandwidth-delta metric, exposed alongside the
  crawl_state metrics (plans/crawl.py).

The etag itself is content-derived (md5 hex — cross-engine, same
convention as operators/mirrors) wrapped in the RFC 9110 quoted form
``"<hex>"``; real servers' opaque etags work identically since both
sides of the comparison come from the same server.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def etag_col(text: Column) -> Column:
    """RFC 9110 strong entity-tag of a content body: '"' md5-hex '"'."""
    return F.concat(F.lit('"'), F.md5(text.cast("string")), F.lit('"'))


def newest_etag_per_url(
    fetch_log: DataFrame,
    url_col: str = "url",
    etag_col_name: str = "etag",
    ts_col: str = "fetched_at",
) -> DataFrame:
    """One row per URL: the validator of the NEWEST fetch. max_by rides
    a single HashAggregate (no window over the log)."""
    return fetch_log.groupBy(F.col(url_col).alias("url")).agg(
        F.max_by(F.col(etag_col_name), F.col(ts_col)).alias("stored_etag"),
        F.max(F.col(ts_col)).alias("last_fetch"),
    )


def revalidation_plan(
    candidates: DataFrame,
    fetch_log: DataFrame,
    url_col: str = "url",
    etag_col_name: str = "etag",
    ts_col: str = "fetched_at",
) -> DataFrame:
    """Annotate recrawl candidates with ``if_none_match`` (the stored
    validator, NULL → unconditional fetch) and ``conditional``."""
    newest = newest_etag_per_url(fetch_log, url_col, etag_col_name, ts_col)
    out = candidates.join(
        newest.select(F.col("url").alias(url_col), "stored_etag"),
        url_col,
        "left",
    )
    return out.withColumn("if_none_match", F.col("stored_etag")).withColumn(
        "conditional", F.col("stored_etag").isNotNull()
    ).drop("stored_etag")


def classify_revalidated(
    planned: DataFrame,
    current_etag: Column,
    size_col: str = "n_bytes",
) -> DataFrame:
    """Post-fetch classification: status_code 304 when the conditional
    validator matches the current entity, else 200; ``bytes_saved`` =
    body size for 304 rows (not transferred), ``bytes_fetched`` for 200
    rows. Row-local — no shuffle."""
    is_304 = F.col("if_none_match").isNotNull() & (
        F.col("if_none_match") == current_etag
    )
    return (
        planned.withColumn("current_etag", current_etag)
        .withColumn(
            "status_code", F.when(is_304, F.lit(304)).otherwise(F.lit(200))
        )
        .withColumn(
            "bytes_saved",
            F.when(is_304, F.col(size_col).cast("long")).otherwise(F.lit(0)),
        )
        .withColumn(
            "bytes_fetched",
            F.when(is_304, F.lit(0)).otherwise(F.col(size_col).cast("long")),
        )
    )


# ---------------------------------------------------------------------------
# RFC 9111 freshness: Cache-Control lifetimes → fetch-plan actions.
# The ETag plan above answers "HOW to refetch cheaply" (conditional GET);
# this answers "WHETHER to refetch at all".
# ---------------------------------------------------------------------------

# max-age must not also match s-maxage: anchor on start-of-string or a
# delimiter (RE2-safe — no lookbehind), mirrored in the DuckDB oracle.
_MAX_AGE_RE = r"(?i)(?:^|[,\s])max-age\s*=\s*([0-9]+)"
_NO_STORE_RE = r"(?i)(?:^|[,\s])no-(?:store|cache)\s*(?:$|[,\s=])"


def http_cache_plan(
    df: DataFrame,
    as_of: Column,
    url_col: str = "url",
    fetched_col: str = "fetched_at",
    cc_col: str = "cache_control",
    lm_col: str = "last_modified",
    validator_col: str = "has_validator",
) -> DataFrame:
    """Per-URL fetch-plan from HTTP caching metadata (RFC 9111):
    compute the freshness lifetime (explicit max-age > heuristic
    Last-Modified/10 > zero), the current age at ``as_of``, and the
    action — ``fresh`` (skip this wave), ``revalidate`` (stale with a
    stored validator → cheap conditional GET, pairs with
    :func:`revalidation_plan`), ``refetch`` (stale, no validator).
    Returns (url, lifetime_us, age_us, action). Pure JVM column
    exprs over the fetch-log scan — no shuffle, no UDF."""
    from docrawl_spark.operators.recrawl import _micros

    cc = F.coalesce(F.col(cc_col), F.lit(""))
    max_age = F.regexp_extract(cc, _MAX_AGE_RE, 1)
    fetched_us = _micros(F.col(fetched_col))
    lifetime = (
        F.when(F.regexp_like(cc, F.lit(_NO_STORE_RE)), F.lit(0).cast("long"))
        .when(max_age != "", (max_age.cast("long") * F.lit(1_000_000)).cast("long"))
        .when(
            F.col(lm_col).isNotNull(),
            F.expr(
                f"greatest(unix_micros(cast({fetched_col} as timestamp_ltz)) - "
                f"unix_micros(cast({lm_col} as timestamp_ltz)), 0L) div 10L"
            ),
        )
        .otherwise(F.lit(0).cast("long"))
    )
    age = _micros(as_of) - fetched_us
    action = (
        F.when(age < lifetime, F.lit("fresh"))
        .when(F.col(validator_col), F.lit("revalidate"))
        .otherwise(F.lit("refetch"))
    )
    return df.select(
        F.col(url_col).alias("url"),
        lifetime.cast("long").alias("lifetime_us"),
        age.cast("long").alias("age_us"),
        action.alias("action"),
    )
