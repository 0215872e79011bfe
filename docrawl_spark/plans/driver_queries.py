"""Driver-harness queries: each SQL-expressible sub-operator of the
engine as a (spark, sf_dir) → DataFrame callable plus a DuckDB oracle
(SURVEY.md §5.2 item 7).

The driver's testdata has no span-document table (its documents.parquet
is flat: doc_id,text,lang,source,n_chars — TESTDATA.md), so the crawl
family derives a deterministic URL universe from it:
url = 'https://' || source || '.test/doc/' || doc_id. Both sides derive
identically, making every operator comparable value-for-value.

Naming contract: every computed column is aliased IDENTICALLY in the
Spark plan and the oracle SQL (the driver hashes values after sorting
columns by name). Floating aggregates are rounded to 4 decimals on both
sides to keep the value-hash stable across summation orders.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from docrawl_spark.functions.canon import normalize_seed_url_col
from docrawl_spark.operators.politeness import robots_allowed_col


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Oracle side tables for the xxhash64 scale paths
# ---------------------------------------------------------------------------
# DuckDB cannot evaluate Spark's xxhash64, so the xxhash-mode queries
# (minhash_lsh_pairs, simhash_neardup, winnow_fingerprints) materialize
# tiny Spark-computed hash-lookup parquets; their oracles recompute the
# shingle/token/minima/banding ALGEBRA in SQL and only JOIN here for
# the hash values (which stay pinned by the md5 twins + property
# tests). The writes are idempotent (skipped when the table already
# exists — the testdata for a given sf dir is immutable), so bench can
# pre-materialize once and time the pure operator. Version-suffix the
# file names when parameters change.

_ORACLE_AUX_ROOT = "/tmp/docrawl_spark_oracle_aux"


def _oracle_aux_dir(sf_dir: str) -> str:
    import os

    return f"{_ORACLE_AUX_ROOT}/{os.path.basename(os.path.normpath(sf_dir))}"


def _build_tokhash(docs: DataFrame) -> DataFrame:
    from docrawl_spark.datapipe.dedup import token_hash_map

    return token_hash_map(docs)


def _build_mh_tokhash(docs: DataFrame) -> DataFrame:
    from docrawl_spark.datapipe.dedup import minhash_token_hash_map

    return minhash_token_hash_map(docs, n_hashes=32, shingle_k=3)


def _build_mh_bandkey(docs: DataFrame) -> DataFrame:
    from docrawl_spark.datapipe.dedup import minhash_band_key_map

    return minhash_band_key_map(docs, n_hashes=32, n_bands=16, shingle_k=3)


_AUX_TABLES: dict[str, Callable[[DataFrame], DataFrame]] = {
    "tokhash_v1": _build_tokhash,
    "mh_tokhash_v1_h32k3": _build_mh_tokhash,
    "mh_bandkey_v1_h32b16k3": _build_mh_bandkey,
}


def _ensure_oracle_aux(
    spark: SparkSession, sf_dir: str, names: list[str]
) -> None:
    import os

    aux = _oracle_aux_dir(sf_dir)
    docs = None
    for name in names:
        path = f"{aux}/{name}.parquet"
        if os.path.exists(f"{path}/_SUCCESS"):
            continue
        if docs is None:
            docs = _docs_par(spark, sf_dir)
        _AUX_TABLES[name](docs).write.mode("overwrite").parquet(path)


def materialize_oracle_aux(spark: SparkSession, sf_dir: str) -> None:
    """Build every oracle side table (idempotent). bench.py calls this
    BEFORE the timing loop so registry callables time the operator,
    not the one-time aux write."""
    _ensure_oracle_aux(spark, sf_dir, list(_AUX_TABLES))


def _docs_par(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents, spread across the cluster for CPU-heavy per-doc work.

    The local testdata is one small parquet file (a single row group =
    one input split), so hash/shingle-heavy stages would otherwise run
    on ONE core. At 100 TB the scan has thousands of splits and this
    repartition is a no-op (guarded on partition count); locally it is
    the honest equivalent of those splits."""
    df = _t(spark, sf_dir, "documents")
    target = spark.sparkContext.defaultParallelism
    # probe the scan's spread via the file listing (cheap metadata;
    # df.rdd would force an InternalRow->Row conversion plan just to
    # read a partition count)
    if len(df.inputFiles()) < target:
        df = df.repartition(target)
    return df


def _doc_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived URL universe over the flat documents table."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".test/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.concat(F.col("source"), F.lit(".test")).alias("host"),
        F.concat(F.lit("/doc/"), F.col("doc_id").cast("string")).alias("path"),
    )


_DOC_URLS_SQL = """
  SELECT doc_id, source, lang, n_chars,
         'https://' || source || '.test/doc/' || CAST(doc_id AS VARCHAR) AS url,
         source || '.test' AS host,
         '/doc/' || CAST(doc_id AS VARCHAR) AS path
  FROM documents
"""

# Shared prep for the host-template oracle pair (mirrors
# _docs_with_host_footer + the line table both operators consume):
# lp = every positioned trimmed line, l0 = distinct non-empty
# (host, doc, line), pl = per-(host, line) doc counts, hd = hosts with
# >= 5 docs. COUNTs cast to BIGINT (DuckDB HUGEINT trap).
_HOST_TEMPLATE_PREP_SQL = r"""
    WITH d AS (
      SELECT doc_id, source || '.test' AS host,
             regexp_replace(trim(text), '(\S+ \S+) ', '\1' || chr(10), 'g')
               || chr(10) || 'footer nav ' || source AS text
      FROM documents),
    parts AS (SELECT doc_id, host, string_split(text, chr(10)) AS p FROM d),
    lp AS (
      SELECT doc_id, host, CAST(i AS INT) AS pos, trim(p[i]) AS line
      FROM parts, UNNEST(range(1, len(p) + 1)) AS t(i)),
    l0 AS (
      SELECT DISTINCT host, doc_id, line FROM lp WHERE line <> ''),
    pl AS (
      SELECT host, line, CAST(COUNT(*) AS BIGINT) AS docs_with_line
      FROM l0 GROUP BY host, line),
    hd AS (
      SELECT host, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS host_docs
      FROM d GROUP BY host HAVING COUNT(DISTINCT doc_id) >= 5)
"""

# Shared CTE prefix for the link-analysis oracles (host_pagerank's edge
# derivation, factored): deterministic host graph — 3 md5-hashed
# out-links per doc onto the host index, self-loops dropped, weighted
# edges + ppm out-shares.
_HOST_GRAPH_PREP_SQL = """
    WITH u AS (
      SELECT source || '.test' AS host, CAST(doc_id AS VARCHAR) AS did
      FROM documents),
    hosts AS (SELECT DISTINCT host FROM u),
    cnt AS (SELECT COUNT(*) AS n_hosts FROM hosts),
    idx AS (
      SELECT host, ROW_NUMBER() OVER (ORDER BY host) - 1 AS host_idx
      FROM hosts),
    raw AS (
      SELECT u.host AS src_host,
             ('0x' || substr(md5(u.did || ':' || CAST(k AS VARCHAR)), 1, 15))::BIGINT
               % (SELECT n_hosts FROM cnt) AS dst_idx
      FROM u, UNNEST([0, 1, 2]) AS t(k)),
    e0 AS (
      SELECT r.src_host, i.host AS dst_host
      FROM raw r JOIN idx i ON r.dst_idx = i.host_idx
      WHERE r.src_host <> i.host),
    edges AS (
      SELECT src_host, dst_host, COUNT(*) AS weight FROM e0 GROUP BY 1, 2),
    outw AS (SELECT src_host, SUM(weight) AS out_w FROM edges GROUP BY 1),
    ew AS (
      SELECT e.src_host, e.dst_host,
             (CAST(e.weight AS BIGINT) * 1000000) // CAST(o.out_w AS BIGINT)
               AS share_ppm
      FROM edges e JOIN outw o USING (src_host))
"""

# Shared CTE prefix for the boilerplate-classifier oracles: the
# synthetic page (mirrors _docs_as_pages), RE2 block split, tag strip,
# anchor-text capture, integer ppm densities, JusText labels.
_BLOCKS_PREP_SQL = r"""
    WITH pg AS (
      SELECT doc_id,
             '<div class="nav"><ul><li><a href="/">Home</a></li>'
             || '<li><a href="/about">About us</a></li>'
             || '<li><a href="/contact">Contact page</a></li></ul></div>'
             || '<h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1><p>' || text
             || '</p><div class="footer"><a href="/terms">Terms</a>'
             || ' (c) example site</div>' AS html
      FROM documents),
    sp AS (
      SELECT doc_id, string_split_regex(html,
        '(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|section|article|header|footer|nav|aside|blockquote|br)\b[^>]*>')
        AS parts
      FROM pg),
    bl AS (
      SELECT doc_id, CAST(i - 1 AS INT) AS block_order, parts[i] AS raw
      FROM sp, UNNEST(range(1, len(parts) + 1)) AS t(i)),
    tx AS (
      SELECT doc_id, block_order,
             trim(regexp_replace(regexp_replace(raw, '<[^>]*>', ' ', 'g'),
                                 '\s+', ' ', 'g')) AS text,
             CAST(length(COALESCE(array_to_string(
               regexp_extract_all(raw, '(?i)<a\b[^>]*>([^<]*)</a>', 1), ''),
               '')) AS BIGINT) AS a_chars
      FROM bl),
    ft AS (
      SELECT doc_id, block_order, text,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             least(a_chars * 1000000
                     // greatest(CAST(length(text) AS BIGINT), 1), 1000000)
               AS link_ppm,
             CAST(len(list_filter(string_split(text, ' '),
               x -> list_contains(['the','a','an','and','or','of','to','in',
                 'on','at','is','are','was','were','be','that','this','it',
                 'for','with','as','by','from','but','not'], lower(x))))
               AS BIGINT) * 1000000
               // greatest(CAST(len(string_split(text, ' ')) AS BIGINT), 1)
               AS stop_ppm
      FROM tx WHERE text <> ''),
    lb AS (
      SELECT doc_id, block_order, text, n_words, link_ppm, stop_ppm,
             CASE WHEN link_ppm > 500000 THEN 'bad'
                  WHEN n_words < 5 THEN 'short'
                  WHEN stop_ppm >= 300000 THEN 'good'
                  ELSE 'near_good' END AS label
      FROM ft)
"""

# Shared CTE prefix for the RFC 9309 group-selection oracles: the
# multi-group blob synthesis, line numbering, lag/running-sum group
# ids, UA prefix-specificity choice, and the per-group rule rows.
_ROBOTS_GROUPS_PREP_SQL = r"""

            WITH h AS (SELECT DISTINCT source || '.test' AS host FROM documents),
            b AS (
              SELECT host,
                     'User-agent: googlebot' || chr(10) || 'Disallow: /g1'
                     || chr(10) ||
                     CASE WHEN ('0x' || substr(md5(host), 1, 1))::BIGINT % 2 = 0
                          THEN 'User-agent: docrawl' || chr(10)
                               || 'User-agent: docrawl-img' || chr(10)
                               || 'Allow: /public' || chr(10)
                               || 'Disallow: /private/' || host || chr(10)
                          ELSE '' END
                     || 'User-agent: *' || chr(10) || 'Disallow: /fallback'
                       AS blob
              FROM h),
            sp AS (SELECT host, string_split(blob, chr(10)) AS parts FROM b),
            lines AS (
              SELECT host, CAST(i - 1 AS INT) AS idx, parts[i] AS line
              FROM sp, UNNEST(range(1, len(parts) + 1)) AS t(i)),
            f AS (
              SELECT host, idx, line,
                     regexp_matches(line, '(?i)^user-agent:\s*\S') AS is_ua
              FROM lines),
            f2 AS (
              SELECT host, idx, line, is_ua,
                     CASE WHEN is_ua AND NOT COALESCE(
                            lag(is_ua) OVER (PARTITION BY host ORDER BY idx),
                            false) THEN 1 ELSE 0 END AS gs
              FROM f),
            g AS (
              SELECT host, idx, line, is_ua,
                     SUM(gs) OVER (PARTITION BY host ORDER BY idx) AS gid
              FROM f2),
            uas AS (
              SELECT host, gid,
                     lower(trim(regexp_extract(line,
                       '(?i)^user-agent:\s*(\S+)', 1))) AS ua_tok
              FROM g WHERE is_ua),
            cand AS (
              SELECT host, gid, ua_tok,
                     CASE WHEN ua_tok = '*' THEN 0
                          ELSE length(ua_tok) END AS spec
              FROM uas
              WHERE ua_tok = '*'
                 OR substr('docrawl-spark', 1, length(ua_tok)) = ua_tok),
            best AS (SELECT host, MAX(spec) AS best FROM cand GROUP BY host),
            chosen AS (
              SELECT DISTINCT c.host, c.gid, c.ua_tok
              FROM cand c JOIN best b2 ON c.host = b2.host AND c.spec = b2.best),
            rules AS (
              SELECT host, gid, idx AS rule_order,
                     regexp_matches(line, '(?i)^allow:') AS allow,
                     trim(regexp_replace(line,
                       '(?i)^(allow|disallow):\s*', '')) AS path
              FROM g WHERE regexp_matches(line, '(?i)^(allow|disallow):\s*\S'))
"""


# --------------------------------------------------------------------------
# Crawl-engine relational sub-operators
# --------------------------------------------------------------------------


def q_frontier_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + derivation: the candidate universe (scan shape)."""
    return _doc_urls(spark, sf_dir).select("doc_id", "url", "host", "path")


def q_frontier_seen_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seen-set dedup: left_anti join of candidates vs an already-seen
    subset (operators/dedup.py semantics; seen = doc_id % 3 == 0)."""
    urls = _doc_urls(spark, sf_dir)
    seen = urls.where(F.col("doc_id") % 3 == 0).select("url")
    return urls.join(seen, "url", "left_anti").select("doc_id", "url", "host")


def q_frontier_politeness_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host budget selection: top-3 per host by (n_chars DESC,
    doc_id ASC) — the politeness window (operators/politeness.py)."""
    urls = _doc_urls(spark, sf_dir)
    w = Window.partitionBy("host").orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    return (
        urls.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("host", "doc_id", "n_chars", "rn")
    )


def q_frontier_host_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawl metrics: the groupBy(host) aggregation family."""
    return (
        _doc_urls(spark, sf_dir)
        .groupBy("host")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.countDistinct("lang").alias("n_langs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


def q_fetch_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7 side-channel parity (reference: headers captured on every
    page load, docrawl_core.py:1064-1083 → SURVEY §1.2 fetch_log
    headers map): build the headers map with the engine's own
    synthetic_headers_col, then query INTO the map (element_at) and
    aggregate per server — exercising map construction, map key
    extraction, and the typed round-trip. The etag entry (xxhash64) is
    engine-side only; the oracle checks the DuckDB-reproducible keys."""
    from docrawl_spark.operators.fetch import synthetic_headers_col

    urls = _doc_urls(spark, sf_dir)
    status = F.when(F.col("n_chars") > 0, F.lit(200)).otherwise(F.lit(404))
    h = urls.select(
        "doc_id",
        synthetic_headers_col(
            F.col("url"), F.col("host"), status, F.col("n_chars")
        ).alias("headers"),
    )
    return (
        h.select(
            "doc_id",
            F.element_at("headers", F.lit("server")).alias("server"),
            F.element_at("headers", F.lit("content-type")).alias("content_type"),
            F.element_at("headers", F.lit("content-length"))
            .cast("long")
            .alias("content_length"),
        )
        .groupBy("server", "content_type")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum("content_length").alias("sum_len"),
            F.min("doc_id").alias("min_doc"),
        )
    )


def q_fetch_cookies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7 side-channel #2 (reference: the selenium cookie jar is
    captured after every page load, docrawl_core.py:1064-1083, replayed
    by get_browser_cookies(), docrawl_client.py:54-71): build the
    cookie array with the engine's synthetic_cookies_col, explode, and
    aggregate per (domain, name) — exercising typed-struct-array
    construction, the 200-vs-404 jar shape, and string min/max over
    cookie values cross-engine."""
    from docrawl_spark.operators.fetch import synthetic_cookies_col

    u = _doc_urls(spark, sf_dir)
    status = F.when(F.col("n_chars") > 0, F.lit(200)).otherwise(F.lit(404))
    jar = u.select(
        "doc_id",
        synthetic_cookies_col(
            F.col("url"), F.col("host"), status, F.col("doc_id")
        ).alias("cookies"),
    )
    c = jar.select(F.explode("cookies").alias("c")).select(
        F.col("c.name").alias("name"),
        F.col("c.value").alias("value"),
        F.col("c.domain").alias("domain"),
    )
    return c.groupBy("domain", "name").agg(
        F.count("*").alias("n_cookies"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def q_fetch_json_requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7 side-channel #3 (reference: every JSON sub-request's
    {url, status_code, headers, content} is captured per page load and
    replayed by get_browser_json_requests()): build the sub-request
    array with synthetic_json_requests_col (n_spans analog =
    doc_id % 5, so the 0-request and the capped-at-3 branches are both
    exercised), then per host: docs, total sub-requests, silent docs,
    and the lexicographic-min first request url (try_element_at —
    null-safe on empty arrays under ANSI)."""
    from docrawl_spark.operators.fetch import synthetic_json_requests_col

    u = _doc_urls(spark, sf_dir)
    status = F.when(F.col("n_chars") > 0, F.lit(200)).otherwise(F.lit(404))
    reqs = u.select(
        "doc_id",
        "host",
        synthetic_json_requests_col(
            F.col("url"),
            F.col("host"),
            status,
            F.pmod(F.col("doc_id"), F.lit(5)).cast("int"),
        ).alias("json_requests"),
    )
    return reqs.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size("json_requests").cast("long")).alias("sum_reqs"),
        F.sum((F.size("json_requests") == 0).cast("long")).alias("n_silent"),
        F.min(
            F.try_element_at(F.col("json_requests"), F.lit(1)).getField("url")
        ).alias("min_first_req"),
    )


def q_extract_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 matrix form (extract_multiple_xpaths → row-per-xpath matrix,
    docrawl_core.py:920-947) through the REAL operator pipeline:
    synthesize a span document per row of the flat documents table,
    run extract_multiple_kinds (O4 per kind: strip, drop empties,
    absolutize links, 'None' marker) and pivot to the positional
    matrix. Exercises: empty-line close-up (doc_id%5 docs lose their
    first text line), link absolutization against the doc url, and the
    'None' row for a kind with no spans (bullet)."""
    from docrawl_spark.operators.commands import extract_multiple_kinds_matrix

    docs = _synth_span_docs(spark, sf_dir)
    return extract_multiple_kinds_matrix(
        docs, ["headline", "text", "link", "bullet"], max_cols=2
    )


def _synth_span_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The extract_matrix span synthesis, shared by the artifact-render
    queries: headline / two text lines (first blanked on doc_id%5==0) /
    a root-relative link / no bullet spans, per documents row."""
    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".test/doc/"),
        F.col("doc_id").cast("string"),
    )
    toks = F.split(F.lower(F.regexp_replace(F.trim("text"), r"\s+", " ")), " ")
    t1 = F.when(F.col("doc_id") % 5 == 0, F.lit("")).otherwise(
        F.concat_ws(" ", F.slice(toks, 1, 3))
    )
    t2 = F.concat_ws(" ", F.slice(toks, 4, 2))

    def span(kind, text, ref, off):
        return F.struct(
            F.lit(kind).alias("kind"),
            text.alias("text"),
            ref.alias("media_ref"),
            F.lit(off).cast("int").alias("offset"),
        )

    spans = F.array(
        span("headline", F.concat(F.lit("Doc "), F.col("doc_id").cast("string")), F.lit(""), 0),
        span("text", t1, F.lit(""), 1),
        span("text", t2, F.lit(""), 2),
        span(
            "link",
            F.lit("rel"),
            F.concat(F.lit("/rel/"), (F.col("doc_id") % 7).cast("string")),
            3,
        ),
    )
    return d.select(url.alias("doc_id"), spans.alias("spans"))


def q_o4_txt_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 txt artifact content (docrawl_core.py:910-918): extract_kind
    'text' through render_kind_txt — per-doc file bytes (each stripped
    non-empty line + newline; the literal 'None' line for docs whose
    text spans all strip empty)."""
    from docrawl_spark.operators.artifacts import render_kind_txt
    from docrawl_spark.operators.extract import extract_kind

    docs = _synth_span_docs(spark, sf_dir)
    return render_kind_txt(extract_kind(docs, "text"))


def q_o5_txt_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 txt artifact content (docrawl_core.py:944-947): the four-kind
    extract_multiple_kinds long form through render_multi_txt —
    newline-joined per-kind blocks, no trailing newline, 'None' block
    for the span-less bullet kind, links absolutized."""
    from docrawl_spark.operators.artifacts import render_multi_txt
    from docrawl_spark.operators.commands import extract_multiple_kinds

    docs = _synth_span_docs(spark, sf_dir)
    long = extract_multiple_kinds(docs, ["headline", "text", "link", "bullet"])
    return render_multi_txt(long)


def q_seed_normalize_quirk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's 'http' substring prepend quirk
    (docrawl_client.py:200-201) over a mixed seed list: odd doc_ids are
    scheme-less."""
    urls = _doc_urls(spark, sf_dir).select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.col("url"))
        .otherwise(F.concat(F.col("host"), F.lit("/doc/"), F.col("doc_id").cast("string")))
        .alias("raw_url"),
    )
    return urls.select(
        "doc_id", "raw_url", normalize_seed_url_col("raw_url").alias("seed_url")
    )


def q_robots_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robots prefix gating (operators/politeness.robots_allowed_col):
    hosts whose source ends in an even digit disallow '/doc/1'."""
    urls = _doc_urls(spark, sf_dir)
    blob = F.when(
        F.substring(F.col("source"), -1, 1).cast("int") % 2 == 0,
        F.lit("/doc/1\n/doc/3"),
    ).otherwise(F.lit(""))
    with_blob = urls.withColumn("robots_blob", blob)
    return with_blob.where(
        robots_allowed_col(F.col("url"), F.col("robots_blob"))
    ).select("doc_id", "url", "host")


def q_robots_change_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robots-refetch impact planning: URLs whose verdict flips when a
    host ships a new robots.txt (operators/politeness.
    robots_change_impact — two row-local prefix-gate evaluations,
    shuffle-free). v1 = the robots_gate rule (even-digit hosts block
    /doc/1,/doc/3); v2 swaps /doc/3 for /doc/2 on those hosts and adds
    /doc/5 on the odd-digit ones — so both newly-blocked AND
    newly-allowed transitions occur."""
    from docrawl_spark.operators.politeness import robots_change_impact

    urls = _doc_urls(spark, sf_dir)
    even = F.substring(F.col("source"), -1, 1).cast("int") % 2 == 0
    old_blob = F.when(even, F.lit("/doc/1\n/doc/3")).otherwise(F.lit(""))
    new_blob = F.when(even, F.lit("/doc/1\n/doc/2")).otherwise(F.lit("/doc/5"))
    return robots_change_impact(urls, old_blob, new_blob).select(
        "doc_id", "url", "host", "was_allowed", "now_allowed", "transition"
    )


def q_sitemap_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-vs-sitemap audit per host (operators/sitemap.
    sitemap_coverage): hosts declare 3/4 of their crawled URLs
    (doc_id % 4 != 0) plus a sitemap-only page per doc_id % 10 == 0 —
    coverage, organic-only, and sitemap-only gap in one pass."""
    from docrawl_spark.operators.sitemap import sitemap_coverage

    urls = _doc_urls(spark, sf_dir)
    crawled = urls.select("host", "url")
    sm = urls.where(F.col("doc_id") % 4 != 0).select("host", "url")
    extra = urls.where(F.col("doc_id") % 10 == 0).select(
        "host", F.concat(F.col("url"), F.lit("/x")).alias("url")
    )
    return sitemap_coverage(crawled, sm.union(extra))


def q_within_wave_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup (operators/links.dedup_within_wave shape): one
    row per url keeping the smallest (parent_rank, offset). Candidates
    are synthesized: each doc discovered by (doc_id % 7) with offset
    doc_id % 5, duplicated per (doc_id % 50) target url."""
    urls = _doc_urls(spark, sf_dir).select(
        F.concat(F.lit("https://t.test/p"), (F.col("doc_id") % 50).cast("string")).alias("url"),
        (F.col("doc_id") % 7).cast("long").alias("parent_rank"),
        (F.col("doc_id") % 5).cast("int").alias("offset"),
    )
    first = F.min(F.struct("parent_rank", "offset")).alias("f")
    return (
        urls.groupBy("url")
        .agg(first)
        .select(
            "url",
            F.col("f.parent_rank").alias("parent_rank"),
            F.col("f.offset").alias("offset"),
        )
    )


# --------------------------------------------------------------------------
# Relational breadth (TPC-H-style shapes over the star schema)
# --------------------------------------------------------------------------


def _dec(col: str) -> "F.Column":
    """Exact decimal view of a money/quantity double: large SUMs of
    doubles drift with summation order across engines (error envelope
    ~n·eps·sum exceeds any rounding), so cross-engine-comparable sums
    run in decimal and convert back after rounding."""
    return F.col(col).cast("decimal(18,6)")


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: big scan + groupBy + many aggregates."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,6)") - _dec("l_discount")
    )
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(_dec("l_quantity")), 4).cast("double").alias("sum_qty"),
            F.round(F.sum(_dec("l_extendedprice")), 4)
            .cast("double")
            .alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).cast("double").alias("sum_disc_price"),
            F.round(F.avg(_dec("l_quantity")), 4).cast("double").alias("avg_qty"),
            F.round(F.avg(_dec("l_discount")), 4).cast("double").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg: customer ⋈ orders ⋈ lineitem ⋈ nation, with
    the small dims broadcast."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(
                    _dec("l_extendedprice")
                    * (F.lit(1).cast("decimal(18,6)") - _dec("l_discount"))
                ),
                4,
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via window (the politeness pattern, reused)."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return (
        p.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select("p_brand", "p_partkey", "p_retailprice", "rn")
    )


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation over the event stream table (batch
    form of the streaming rollup)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


# --------------------------------------------------------------------------
# Training-data pipeline operators (datapipe/)
# --------------------------------------------------------------------------

_QUERY_VEC = [1.0] + [0.0] * 63  # embeddings are 64-dim


def _srp_bucket_sql(dim: int = 64, n_planes: int = 8, seed: int = 42) -> str:
    """DuckDB expression for the SRP bucket of CAST(embedding AS
    DOUBLE[]), with the SAME deterministic hyperplanes the Spark side
    uses (similarity._hyperplanes) inlined as literals — repr(float)
    round-trips exactly, so both engines compute identical sign bits."""
    from docrawl_spark.datapipe.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_planes, seed)
    terms = " + ".join(
        f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), {p!r}) > 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"CAST({terms} AS BIGINT)"


def q_exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup survivors (datapipe/dedup.exact_dedup)."""
    from docrawl_spark.datapipe.dedup import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "documents")).select("doc_id")


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from docrawl_spark.datapipe.text import subword_estimate_col, token_count_col

    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        token_count_col(F.col("text")).alias("n_tokens"),
        subword_estimate_col(F.col("text")).alias("n_subword_est"),
    )


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from docrawl_spark.datapipe.text import langid_col

    return _t(spark, sf_dir, "documents").select(
        "doc_id", langid_col(F.col("text")).alias("lang_pred")
    )


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from docrawl_spark.datapipe.text import quality_score_col

    return _t(spark, sf_dir, "documents").select(
        "doc_id", quality_score_col(F.col("text")).alias("quality")
    )


def q_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/RefinedWeb repetition quality filters (datapipe.text
    .repetition_signals): dup-token fraction + top-bigram share —
    the standard pre-training boilerplate/spam signals."""
    from docrawl_spark.datapipe.text import repetition_signals

    return repetition_signals(_docs_par(spark, sf_dir))


def q_decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination (test-set leakage) check: corpus docs sharing
    ≥1 word 5-gram with a synthetic benchmark split (doc_id % 97 == 0),
    with shared-distinct-gram counts (datapipe.text.ngram_overlap —
    n-gram equi-join, never corpus × benchmark)."""
    from docrawl_spark.datapipe.text import ngram_overlap

    docs = _docs_par(spark, sf_dir)
    bench = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    return ngram_overlap(corpus, bench, n=5)


def q_vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: top-100 tokens by frequency,
    lexicographic tie-break (datapipe.text.vocab_top_tokens)."""
    from docrawl_spark.datapipe.text import vocab_top_tokens

    return vocab_top_tokens(_docs_par(spark, sf_dir), k=100)


def q_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF keyword extraction (top-3 tokens per doc)
    in the float-free integer-idf basis — idf_bits = bit_length(
    N div df), score = tf * idf_bits (datapipe.text.doc_keywords)."""
    from docrawl_spark.datapipe.text import doc_keywords

    return doc_keywords(_docs_par(spark, sf_dir), k=3, min_len=2)


def q_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode script detection under language ID: per-doc counts of
    Latin / Han / digit / space codepoints + dominant script + integer
    Han ppm (datapipe.text.script_profile — shuffle-free row exprs).
    The flat testdata is ASCII, so both engines append the same
    deterministic per-lang multilingual suffix before profiling."""
    from docrawl_spark.datapipe.text import script_profile

    docs = _docs_par(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("lang") == "zh", F.lit(" 你好世界"))
            .when(F.col("lang") == "de", F.lit(" straße groß"))
            .when(F.col("lang") == "fr", F.lit(" café déjà vu"))
            .when(F.col("lang") == "es", F.lit(" mañana niño"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return script_profile(docs)


def q_soft404_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft-404 detection: 200-status pages whose body matches the
    host's real-404 error template (operators.traps.soft404_flags —
    broadcast template-signature lookup, no page-table shuffle).
    Status + error bodies derive deterministically from the doc
    universe: doc_id % 19 → real 404 (template body), doc_id % 23 →
    an error body served with a 200 (the soft 404 to catch)."""
    from docrawl_spark.operators.traps import soft404_flags

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.col("source"), F.lit(".test")).alias("host"),
        F.when(F.col("doc_id") % 19 == 0, F.lit(404))
        .otherwise(F.lit(200))
        .alias("status"),
        F.when(
            (F.col("doc_id") % 19 == 0) | (F.col("doc_id") % 23 == 0),
            F.concat(F.lit("Page Not Found - "), F.col("source"), F.lit(".test")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return soft404_flags(d)


def q_host_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over a sparse slice of the deterministic
    host graph (docs with doc_id % 37 == 0 contribute one hashed
    out-link each; self-loops dropped — sparse enough that the result
    is a real multi-component partition, 5 components over 16 hosts at
    sf0.01) — the mirror-site / link-farm grouping pass next to
    PageRank/HITS/TrustRank. Iterative min-label propagation
    (datapipe.dedup.connected_components, 1 shuffle/round) vs a
    recursive-CTE transitive closure in the oracle."""
    from docrawl_spark.datapipe.dedup import connected_components
    from docrawl_spark.operators.ranking import with_global_rank

    urls = _doc_urls(spark, sf_dir)
    hosts = urls.select("host").distinct()
    idx = with_global_rank(hosts, ["host"], rank_col="host_idx")
    cnt = hosts.agg(F.count("*").alias("n_hosts"))
    links = (
        urls.where(F.col("doc_id") % 37 == 0)
        .select(
            "host",
            F.col("doc_id").cast("string").alias("did"),
            F.lit(0).alias("k"),
        )
        .crossJoin(F.broadcast(cnt))
        .select(
            F.col("host").alias("src_host"),
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(F.col("did"), F.lit(":"), F.col("k").cast("string"))
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.col("n_hosts"),
            ).alias("dst_idx"),
        )
    )
    pairs = (
        links.join(F.broadcast(idx), links.dst_idx == idx.host_idx)
        .where(F.col("src_host") != F.col("host"))
        .select(F.col("src_host").alias("id_a"), F.col("host").alias("id_b"))
        .distinct()
    )
    comp = connected_components(pairs, "id_a", "id_b")
    return comp.select(F.col("id").alias("host"), "component")


def _host_link_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic directed host-link universe shared by the
    graph-family oracles (same derivation as q_host_pagerank: 3
    md5-hashed out-links per doc onto the global host index,
    self-loops dropped)."""
    from docrawl_spark.operators.ranking import with_global_rank

    urls = _doc_urls(spark, sf_dir)
    hosts = urls.select("host").distinct()
    idx = with_global_rank(hosts, ["host"], rank_col="host_idx")
    cnt = hosts.agg(F.count("*").alias("n_hosts"))
    links = (
        urls.select(
            "host",
            F.col("doc_id").cast("string").alias("did"),
            F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("k"),
        )
        .crossJoin(F.broadcast(cnt))
        .select(
            F.col("host").alias("src_host"),
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("did"), F.lit(":"), F.col("k").cast("string"))),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.col("n_hosts"),
            ).alias("dst_idx"),
        )
    )
    return (
        links.join(F.broadcast(idx), links.dst_idx == idx.host_idx)
        .where(F.col("src_host") != F.col("host"))
        .select("src_host", F.col("host").alias("dst_host"))
    )


def q_host_seed_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distance from the seed-host set over the directed host
    graph — the seed-proximity metric behind crawl-depth budgeting
    (datapipe.graph.bfs_distances: iterative min-distance relaxation,
    early-stop at the graph diameter). Seeds: hosts whose md5 leading
    nibble ≡ 0 (mod 5) — the same deterministic seed notion the
    TrustRank query uses."""
    from docrawl_spark.datapipe.graph import bfs_distances

    urls = _doc_urls(spark, sf_dir)
    hosts = urls.select("host").distinct()
    seeds = hosts.where(
        F.conv(F.substring(F.md5("host"), 1, 1), 16, 10).cast("long") % 5 == 0
    )
    edges = _host_link_edges(spark, sf_dir)
    return bfs_distances(edges, seeds)


def q_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering keys over the (source-rank,
    lang-rank) plane — the warehouse write-layout key that makes
    parquet min/max stats prunable on BOTH dimensions
    (datapipe.export.zorder_key_col; ranks come from the broadcast
    dimension tables, never a global window over the corpus)."""
    from docrawl_spark.datapipe.export import zorder_key_col
    from docrawl_spark.operators.ranking import with_global_rank

    d = _t(spark, sf_dir, "documents")
    sx = with_global_rank(d.select("source").distinct(), ["source"], rank_col="x")
    sy = with_global_rank(d.select("lang").distinct(), ["lang"], rank_col="y")
    j = d.select("doc_id", "source", "lang").join(F.broadcast(sx), "source").join(
        F.broadcast(sy), "lang"
    )
    out = j.select(
        "doc_id",
        F.col("x").cast("long").alias("x"),
        F.col("y").cast("long").alias("y"),
        zorder_key_col(F.col("x"), F.col("y"), bits=8).alias("zkey"),
    )
    return out.withColumn("zbucket", F.expr("zkey div 16"))


def q_pagination_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination-chain detection: ``?page=N`` URLs grouped into their
    listing series (page param stripped → series key), with chain
    length and position (operators.links.pagination_chains). The
    paginated URL universe derives deterministically: docs with
    doc_id % 3 < 2 become pages of listing doc_id div 7 (the listing's
    host derives from the SERIES id so a chain's pages co-locate) —
    with the page param leading in one layout and trailing in the
    other, so the param-strip normalization must actually unify them
    for chains to form."""
    from docrawl_spark.operators.links import pagination_chains

    d = _t(spark, sf_dir, "documents")
    series = F.expr("doc_id div 7")
    base = F.concat(
        F.lit("https://src"),
        (series % 7).cast("string"),
        F.lit(".test/list/"),
        series.cast("string"),
    )
    pn = (F.col("doc_id") % 7).cast("string")
    url = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(base, F.lit("?page="), pn, F.lit("&sort=asc")),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(base, F.lit("?sort=asc&page="), pn),
        )
        .otherwise(base)
    )
    return pagination_chains(d.select("doc_id", url.alias("url")))


def q_minhash_band_minima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature rows (doc_id, seed, minhash_hex) in the
    md5-hex mode both engines can compute bit-for-bit.

    Uses the explode→groupBy minhash_signatures shape (codegen +
    map-side combine; the transform-in-transform equivalent ran
    interpreted and 30-40x slower at sf0.1)."""
    from docrawl_spark.datapipe.dedup import minhash_signatures

    sigs = minhash_signatures(
        _docs_par(spark, sf_dir), n_hashes=8, hash_mode="md5hex"
    )
    return sigs.select(
        "doc_id", F.posexplode("signature").alias("seed", "minhash_hex")
    )


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from docrawl_spark.datapipe.similarity import cosine_topk

    return cosine_topk(_t(spark, sf_dir, "embeddings"), _QUERY_VEC, k=10)


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN near-dup pairs on the SCALE path: SRP-bucket candidates
    (hamming-1 multi-probe, equi-join on the probe key — never a
    corpus self-join) + exact-cosine verify. The oracle mirrors the
    same LSH semantics (identical hyperplanes inlined as literals), so
    the whole sign→bucket→probe-join→verify pipeline is hash-checked.
    The brute all-pairs form (embedding_neardup_pairs) remains the
    bounded-candidate verify stage only."""
    from docrawl_spark.datapipe.dedup import embedding_neardup_bucketed

    return embedding_neardup_bucketed(
        _t(spark, sf_dir, "embeddings"),
        threshold=0.4,
        n_planes=8,
        seed=42,
        probe_hamming=1,
        dim=64,
    )


def _semantic_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic coarse centroids for the SemDeDup oracle pair: the
    8 lowest-vec_id embeddings, re-labelled 0..7. (Production uses
    ``similarity.ivf_train``'s Lloyd's-iterated centroids — the fixed
    pick keeps both engines bit-comparable; assignment math is
    identical either way.)"""
    emb = _t(spark, sf_dir, "embeddings")
    w = Window.orderBy("vec_id")
    return (
        emb.orderBy("vec_id")
        .limit(8)
        .select(
            (F.row_number().over(w) - 1).cast("long").alias("cent_id"),
            F.col("embedding").alias("cent_vec"),
        )
    )


def q_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup stage 1 — coarse cluster assignment: nearest of 8 fixed
    centroids by cosine (rounded to 6 dp before the argmax, ties to the
    lowest centroid id). Broadcast k-row centroid join + integer-packed
    HashAggregate argmax (similarity.centroid_assign_exact)."""
    from docrawl_spark.datapipe.similarity import centroid_assign_exact

    emb = _t(spark, sf_dir, "embeddings")
    out = centroid_assign_exact(emb, _semantic_centroids(spark, sf_dir))
    return out.select(
        "vec_id", "cluster_id", F.round("cosine", 6).alias("cosine")
    )


def q_semantic_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup stage 2 — within-cluster semantic dedup (Abbas et al.
    2023): drop vector j when some i < j in the SAME coarse cluster has
    cosine(i,j) ≥ 0.4. The pair join is an equi-join on cluster_id —
    the cluster bound is what keeps the similarity matrix off the
    corpus self-join (datapipe.dedup.semantic_dedup)."""
    from docrawl_spark.datapipe.dedup import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, _semantic_centroids(spark, sf_dir), threshold=0.4
    )


def q_oov_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocab-coverage audit: per-doc OOV rate against the
    corpus's own top-12 vocabulary head (datapipe.text.oov_rates —
    broadcast vocab probe, map-side-combinable per-doc aggregate)."""
    from docrawl_spark.datapipe.text import oov_rates, vocab_top_tokens

    docs = _docs_par(spark, sf_dir)
    vocab = vocab_top_tokens(docs, k=12)
    return oov_rates(docs, vocab)


def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding (similarity.pq_encode): 64-dim
    vectors → 8 blocks × 16-entry codebooks, nearest sub-centroid per
    block by squared L2 (rounded 6 dp before the argmin, ties to the
    lowest code) — the memory-compression leg of the ANN family."""
    from docrawl_spark.datapipe.similarity import pq_codebooks, pq_encode

    emb = _t(spark, sf_dir, "embeddings")
    cb = pq_codebooks(emb, n_blocks=8, n_codes=16)
    return pq_encode(emb, cb, n_blocks=8, n_codes=16)


def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs — xxhash64 scale path. hamming ≤ 3 with
    4 blocks of 16 bits (the Manku/Google parameterization): 16-bit
    chunk keys keep bucket collisions ≈ true near-dups instead of
    flooding the join. The oracle brute-forces all pairs over the
    token-hash side table — reproducing the bit-vote/pack/hamming
    algebra in SQL and validating the block-permutation trick
    end-to-end against it."""
    from docrawl_spark.datapipe.dedup import simhash_neardup_pairs

    _ensure_oracle_aux(spark, sf_dir, ["tokhash_v1"])
    return simhash_neardup_pairs(
        _docs_par(spark, sf_dir), max_hamming=3, n_blocks=4
    )


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs — xxhash64 scale path. The oracle
    recomputes shingles/minima/band strings itself and joins the two
    Spark-materialized hash maps (shingle×seed hashes, band-key fold)
    — the full banding/bucket-join/dedup algebra is hash-matched, only
    the hash function values come from the side tables."""
    from docrawl_spark.datapipe.dedup import minhash_lsh_pairs

    _ensure_oracle_aux(
        spark, sf_dir, ["mh_tokhash_v1_h32k3", "mh_bandkey_v1_h32b16k3"]
    )
    return minhash_lsh_pairs(
        _docs_par(spark, sf_dir), n_hashes=32, n_bands=16
    )


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 2-gram Jaccard VERIFY over MinHash-LSH candidates — the
    real mine→verify near-dup pipeline (dedup.minhash_lsh_pairs →
    dedup.ngram_jaccard_pairs): shingle sets join onto the bounded LSH
    candidate set, the corpus never self-joins (the round-1 doc_id%25
    blocked self-join was O(n²/25) — this is the at-scale shape)."""
    from docrawl_spark.datapipe.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    docs = _docs_par(spark, sf_dir)
    cands = minhash_lsh_pairs(docs, n_hashes=8, n_bands=4, hash_mode="md5hex")
    return ngram_jaccard_pairs(docs, cands, shingle_k=2, threshold=0.05)


def q_ngram_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional n-gram containment over the same MinHash-LSH
    candidates as the Jaccard verify — syndication/quotation detection
    in integer ppm (dedup.ngram_containment_pairs)."""
    from docrawl_spark.datapipe.dedup import (
        minhash_lsh_pairs,
        ngram_containment_pairs,
    )

    docs = _docs_par(spark, sf_dir)
    cands = minhash_lsh_pairs(docs, n_hashes=8, n_bands=4, hash_mode="md5hex")
    return ngram_containment_pairs(
        docs, cands, shingle_k=2, min_containment_ppm=50000
    )


def q_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE merge iteration: top-20 adjacent character pairs by
    corpus frequency over the distinct-word table
    (datapipe.text.bpe_pair_stats)."""
    from docrawl_spark.datapipe.text import bpe_pair_stats

    return bpe_pair_stats(_docs_par(spark, sf_dir), k=20)


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint sets — xxhash64 scale path. The oracle
    re-derives positions/window-minima/distinct in SQL over the
    token-hash side table (window function MIN over 4-token frames),
    so the winnowing algebra itself is hash-matched."""
    from docrawl_spark.datapipe.text import winnow_fingerprints_col

    _ensure_oracle_aux(spark, sf_dir, ["tokhash_v1"])
    return _docs_par(spark, sf_dir).select(
        "doc_id",
        F.explode(winnow_fingerprints_col(F.col("text"))).alias("fingerprint"),
    )


def q_minhash_lsh_pairs_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs in the md5hex oracle mode (8 hashes,
    4 bands × 2 rows) — the full LSH shape (sign → band → bucket-join)
    hash-matched against DuckDB, validating the banding itself."""
    from docrawl_spark.datapipe.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _docs_par(spark, sf_dir), n_hashes=8, n_bands=4, hash_mode="md5hex"
    )


def q_simhash_neardup_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs in the 60-bit md5hex oracle mode. The
    engine runs the block-permutation join (4 blocks of 15 bits,
    hamming ≤ 3); the oracle brute-forces all pairs — equality
    validates the block trick end-to-end, not just the hash."""
    from docrawl_spark.datapipe.dedup import simhash_neardup_pairs

    return simhash_neardup_pairs(
        _docs_par(spark, sf_dir),
        max_hamming=3,
        n_blocks=4,
        hash_mode="md5hex",
    )


def q_neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the md5-mode LSH
    candidate pairs (component = min reachable doc_id — the canonical
    representative). Spark side iterates min-label propagation; the
    oracle computes the transitive closure with a recursive CTE —
    an iterative algorithm still hash-checked value-for-value."""
    from docrawl_spark.datapipe.dedup import connected_components, minhash_lsh_pairs

    pairs = minhash_lsh_pairs(
        _docs_par(spark, sf_dir), n_hashes=8, n_bands=4, hash_mode="md5hex"
    )
    return connected_components(pairs).select(
        F.col("id").alias("doc_id"), "component"
    )


def q_neardup_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup corpus dedup: keep the min-id representative per LSH
    component (datapipe/dedup.near_dedup in md5 oracle mode)."""
    from docrawl_spark.datapipe.dedup import near_dedup

    return near_dedup(
        _docs_par(spark, sf_dir), n_hashes=8, n_bands=4, hash_mode="md5hex"
    ).select("doc_id")


def q_neardup_best_reps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dup dedup (md5 oracle mode): keep the
    HIGHEST-quality member per LSH component (min doc_id on ties) via
    the packed-BIGINT argmax — datapipe/dedup.near_dedup_best — instead
    of the blind min-id rule. Output carries the kept docs' integer
    quality so the oracle validates the ranking, not just the drops."""
    from docrawl_spark.datapipe.dedup import near_dedup_best
    from docrawl_spark.datapipe.text import quality_score_col

    kept = near_dedup_best(
        _docs_par(spark, sf_dir), n_hashes=8, n_bands=4, hash_mode="md5hex"
    )
    return kept.select(
        "doc_id", quality_score_col(F.col("text")).alias("quality")
    )


def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth over contiguous 64-doc ingest
    batches (datapipe/text.vocab_growth_curve): new token types per
    batch + running vocabulary/instance totals — integer-exact,
    window over #batches rows only."""
    from docrawl_spark.datapipe.text import vocab_growth_curve

    return vocab_growth_curve(_t(spark, sf_dir, "documents"), batch_size=64)


def q_char_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level quality audit (datapipe/text.char_run_stats):
    longest same-char run via a per-row array fold (zero shuffle) +
    char-class mix in exact ppm. The oracle computes max_run the
    orthodox way (per-char rows → lag → run windows) — equality
    validates the fold against the window semantics."""
    from docrawl_spark.datapipe.text import char_run_stats

    return char_run_stats(_t(spark, sf_dir, "documents"))


def q_winnow_fingerprints_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints in md5hex oracle mode (window=4 rolling
    minima over token hashes, Schleimer et al. SIGMOD'03)."""
    from docrawl_spark.datapipe.text import winnow_fingerprints_col

    return _docs_par(spark, sf_dir).select(
        "doc_id",
        F.explode(
            winnow_fingerprints_col(F.col("text"), window=4, hash_mode="md5hex")
        ).alias("fingerprint"),
    )


def q_events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over (day, event_type) — decimal sums for
    cross-engine-exact totals (the grand-total row sums every value)."""
    ev = _t(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        "event_type",
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    return ev.cube("day", "event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("v"), 4).cast("double").alias("sum_value"),
    )


def q_source_lang_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType round-trip: per-source lang→count map built with
    map_from_entries, then exploded back to rows (fetch_log
    headers-map shape, SURVEY.md §1.2 D7)."""
    docs = _t(spark, sf_dir, "documents")
    counts = docs.groupBy("source", "lang").agg(F.count("*").alias("n"))
    maps = counts.groupBy("source").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("lang", "n")))
        ).alias("m")
    )
    return maps.select("source", F.explode("m").alias("lang", "n_docs"))


def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction: pull props.$.k out of the events JSON column
    and aggregate it per event_type."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(k).alias("n_with_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


def q_orders_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date function family over o_orderdate (year/quarter/month/day +
    formatted month bucket)."""
    d = F.col("o_orderdate")
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.quarter(d).alias("qtr"),
        F.month(d).alias("mon"),
        F.dayofmonth(d).alias("dom"),
        F.date_format(d, "yyyy-MM").alias("ym"),
    )


def q_order_ship_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic family: per-priority shipping-lag stats
    (datediff) plus a due date (date_add) checked value-for-value."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderpriority",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("lag_days"),
    )
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        F.min("lag_days").alias("min_lag"),
        F.max("lag_days").alias("max_lag"),
        F.round(F.avg("lag_days"), 4).alias("avg_lag"),
    )


def _with_session_ids(ev: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Append ``session_id``: per-user 30-min-gap sessions (lag +
    cumulative sum of session-start flags under the deterministic
    (ts, event_id) order). The ONE definition every session-level
    query shares — gap constant and ordering live here and in the
    oracle mirrors only."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    prev = F.lag(epoch).over(w)
    new_sess = F.when(prev.isNull() | ((epoch - prev) > gap_s), 1).otherwise(0)
    return ev.withColumn("new_sess", new_sess).withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min-gap sessions per user (lag + cumulative
    sum of session-start flags), then session stats."""
    sess = _with_session_ids(_t(spark, sf_dir, "events"))
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def q_events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in session_window (30-min gap) in batch mode — the same
    sessions as q_events_sessionize, shaped as (user, start, n)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n_events"
        )
    )


def q_events_asof_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): for each event, the total price
    of the user's latest order at or before the event time."""
    from docrawl_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_totalprice").alias("last_price"))
    )
    joined = asof_join(
        ev, orders,
        on_left="ts", on_right="o_orderdate",
        by_left="user_id", by_right="o_custkey",
        value_cols=["last_price"],
    )
    return joined.select(
        "event_id", "user_id", F.round("last_price", 4).alias("last_price")
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: daily event counts, one column per event_type."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .na.fill(0, _EVENT_TYPES)
    )


def q_customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set ops: customers with open orders EXCEPT those with any
    finished order."""
    o = _t(spark, sf_dir, "orders")
    open_c = o.where(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    done_c = o.where(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    return open_c.exceptAll(done_c).select(F.col("o_custkey").alias("custkey"))


def q_customer_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set ops (intersect): customers with BOTH an open and a finished
    order."""
    o = _t(spark, sf_dir, "orders")
    open_c = o.where(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    done_c = o.where(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    return open_c.intersect(done_c).select(F.col("o_custkey").alias("custkey"))


def q_customer_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi join (the seen-set probe shape, EXISTS in SQL):
    customers having at least one urgent order."""
    c = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(
        urgent, c["c_custkey"] == urgent["o_custkey"], "left_semi"
    ).select("c_custkey", "c_name")


def q_events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous quantiles per event_type (p50/p90)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
    )


def q_doc_length_ntiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-count length deciles over the corpus via the SCALABLE
    NTILE (operators/ranking.with_ntile: distributed range-sort rank +
    the closed-form bucket rule) — a plain ntile().over(Window.orderBy)
    collapses to ONE partition. The oracle runs DuckDB's native
    NTILE(10); hash equality proves the distributed derivation
    reproduces SQL NTILE semantics exactly."""
    from docrawl_spark.operators.ranking import with_ntile

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    tiled = with_ntile(docs, ["n_chars", "doc_id"], k=10)
    return tiled.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )


def q_events_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reshape round-trip: user-bucket × event_type counts pivoted WIDE
    (groupBy().pivot()) then melted back to long form with
    DataFrame.unpivot — the §2.5 unpivot/melt primitive. Absent
    combinations surface as NULL cells in the wide frame and are
    dropped after the melt, so the round-trip reproduces the plain
    long-form aggregate the oracle computes directly."""
    ev = _t(spark, sf_dir, "events").select(
        F.pmod(F.col("user_id"), F.lit(10)).cast("int").alias("bucket"),
        "event_type",
    )
    wide = ev.groupBy("bucket").pivot("event_type", _EVENT_TYPES).count()
    return (
        wide.unpivot("bucket", _EVENT_TYPES, "event_type", "n_events")
        .where(F.col("n_events").isNotNull())
    )


def q_source_sample_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced exact-k per-source sample (datapipe/sampling.
    sample_k_per_group, k=3): the k smallest md5('sample|'||id) keys
    per source via the salted two-phase window — exactly k rows per
    source (fewer only if the source is smaller), bit-reproducible."""
    from docrawl_spark.datapipe.sampling import sample_k_per_group

    return sample_k_per_group(
        _t(spark, sf_dir, "documents"), "source", k=3, id_col="doc_id"
    ).select("source", "doc_id")


def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 session paths: 30-min-gap sessions (the events_sessionize
    derivation), each session's event types joined in (ts, event_id)
    order into a '>'-path string, ranked by session count (path asc
    tiebreak — a total order, so the LIMIT is deterministic). Sequence
    mining over the per-session bounded collect."""
    sess = _with_session_ids(_t(spark, sf_dir, "events"))
    paths = sess.groupBy("user_id", "session_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(20)
    )


def q_session_associations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over sessions (market-basket mining): for each
    ordered event-type pair a→b, sessions containing both vs each
    alone — support / confidence / lift in EXACT ppm (lift_ppm =
    n_ab·N·10^6 div (n_a·n_b); all BIGINT, no float division). Lift >
    10^6 means a and b co-occur beyond independence — the
    which-signals-travel-together diagnostic.

    Scale shape: distinct (session, type) is a HashAggregate; the pair
    join fans out per session only over its ≤ |type| distinct types
    (bounded), never a session-count self-join."""
    sess = _with_session_ids(_t(spark, sf_dir, "events")).withColumnRenamed(
        "session_id", "sid"
    )
    st = sess.select("user_id", "sid", "event_type").distinct()
    n_sessions = st.select("user_id", "sid").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )
    singles = st.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_single")
    )
    a, b = st.alias("a"), st.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.sid") == F.col("b.sid"))
            & (F.col("a.event_type") != F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("antecedent"),
            F.col("b.event_type").alias("consequent"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    j = (
        pairs.join(
            F.broadcast(singles.withColumnRenamed("event_type", "antecedent")
                        .withColumnRenamed("n_single", "n_ante")),
            "antecedent",
        )
        .join(
            F.broadcast(singles.withColumnRenamed("event_type", "consequent")
                        .withColumnRenamed("n_single", "n_cons")),
            "consequent",
        )
        .crossJoin(F.broadcast(n_sessions))
    )
    return j.select(
        "antecedent",
        "consequent",
        "n_both",
        F.expr("1000000 * n_both div n_sessions").alias("support_ppm"),
        F.expr("1000000 * n_both div n_ante").alias("confidence_ppm"),
        # BIGINT-exact while n_both * n_sessions <= 9.2e12; at a
        # 10^10-session corpus promote the product to DECIMAL(38,0)
        # (Spark) / HUGEINT (DuckDB) before the div
        F.expr("(1000000 * n_both * n_sessions) div (n_ante * n_cons)").alias(
            "lift_ppm"
        ),
    )


def q_label_centroid_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between per-label embedding CENTROIDS
    — the corpus-mixing / cluster-overlap diagnostic (two labels whose
    centroids cosine ≈ 1 are candidates for merging; a low-cosine
    outlier label is a distinct mode).

    Cross-engine exact: embeddings quantize to integer MICRO-units
    (CAST(ROUND(e·10^6) AS BIGINT) — the MAD-query pattern), per-label
    per-dimension sums and all dot/norm products stay in exact BIGINT
    (64 dims · ~10^6-unit sums: ≤ ~10^17 < 2^63), and only the final
    cosine divides in DOUBLE — both engines cast the SAME integers and
    run the same IEEE mult/sqrt/divide, so ROUND(...,6) is
    bit-identical. Centroid table is labels×64 rows — tiny; the pair
    join never touches the corpus."""
    emb = _t(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label",
        F.posexplode("embedding").alias("pos", "e"),
    ).select(
        "label",
        "pos",
        F.round(F.col("e").cast("double") * 1_000_000)
        .cast("long")
        .alias("v"),
    )
    cent = dims.groupBy("label", "pos").agg(F.sum("v").alias("c"))
    norms = cent.groupBy("label").agg(
        F.sum(F.col("c") * F.col("c")).alias("norm2")
    )
    a, b = cent.alias("a"), cent.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.label") < F.col("b.label")),
        )
        .groupBy(
            F.col("a.label").alias("label_a"),
            F.col("b.label").alias("label_b"),
        )
        .agg(F.sum(F.col("a.c") * F.col("b.c")).alias("dot"))
    )
    na = norms.select(
        F.col("label").alias("label_a"), F.col("norm2").alias("na")
    )
    nb = norms.select(
        F.col("label").alias("label_b"), F.col("norm2").alias("nb")
    )
    return (
        dots.join(F.broadcast(na), "label_a")
        .join(F.broadcast(nb), "label_b")
        .select(
            "label_a",
            "label_b",
            F.round(
                F.col("dot").cast("double")
                / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double")),
                6,
            ).alias("cosine"),
        )
    )


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day, activity
    counted per whole-day offset from that cohort day — the
    returning-visitor / recrawl-revisit audit. (cohort_day, offset_days,
    n_active_users), integer-exact datediff.

    Scale shape: the cohort dim (one row per user) comes from a MIN
    HashAggregate and joins back on user_id; the matrix aggregate is a
    two-key HashAggregate over (day, user) distincts."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    )
    cohort = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", "cohort_day").cast("long").alias("offset_days"),
        )
        .distinct()
        .groupBy("cohort_day", "offset_days")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


def q_events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((day), (event_type), ()) with
    grouping_id — the §2.5 grouping-sets primitive beyond cube/rollup
    (exactly the three summary grains, not the full 2^n lattice)."""
    ev = _t(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    )
    return ev.groupingSets(
        [[F.col("day")], [F.col("event_type")], []], "day", "event_type"
    ).agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q_events_moving_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-frame window: per event_type, the 7-day-ending-here
    moving event count over the daily series (ROWS BETWEEN 6 PRECEDING
    AND CURRENT ROW on the aggregated per-day frame — the frame slides
    over ~days rows per type, never raw events)."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    return daily.select(
        "event_type",
        "day",
        "n",
        F.sum("n").over(w).cast("long").alias("n_7d"),
    )


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel: users reaching view → click → purchase
    with each step STRICTLY after the previous one (t2 = min click ts
    > t1, t3 = min purchase ts > t2) — the classic conversion audit,
    and on crawl telemetry the discover→fetch→extract progression.

    Scale shape: one filtered MIN HashAggregate per step + an equi-join
    on user_id back to the previous step's frontier — each stage only
    carries users still in the funnel (monotonically shrinking), no
    windows, no self-join on the full stream."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def _step(prev: DataFrame | None, etype: str, col: str) -> DataFrame:
        s = ev.where(F.col("event_type") == etype)
        if prev is not None:
            pcol = prev.columns[-1]
            s = s.join(prev, "user_id").where(F.col("ts") > F.col(pcol))
        return s.groupBy("user_id").agg(F.min("ts").alias(col))

    s1 = _step(None, "view", "t1")
    s2 = _step(s1, "click", "t2")
    s3 = _step(s2, "purchase", "t3")
    rows = [
        (s1, 1, "view"), (s2, 2, "click"), (s3, 3, "purchase"),
    ]
    out = None
    for frame, step, name in rows:
        agg = frame.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(step).cast("int").alias("step"),
            F.lit(name).alias("step_name"),
            "n_users",
        )
        out = agg if out is None else out.unionByName(agg)
    return out


def q_events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (first-order Markov
    counts): consecutive (prev_type → type) pairs under the
    deterministic (ts, event_id) order, with transition counts and
    distinct-user support. Path mining over sessions — on crawl
    telemetry, the fetch-outcome transition structure.

    Scale shape: one per-user lag window (bounded by a user's own
    events, never corpus-wide) → HashAggregate."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        "user_id",
        F.lag("event_type").over(w).alias("src_type"),
        F.col("event_type").alias("dst_type"),
    ).where(F.col("src_type").isNotNull())
    return pairs.groupBy("src_type", "dst_type").agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.countDistinct("user_id").alias("n_users"),
    )


def q_events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly stats per event_type: median / MAD (median
    absolute deviation) and the count of |x − med| > 3·MAD outliers —
    the telemetry-anomaly audit (fetch-latency spikes, bot bursts)
    where mean/stddev would be dragged by the outliers themselves.

    INTEGER-EXACT cross-engine: values are 2-decimal quantized, so a
    float MAD comparison sits on a 0.005 lattice where 1-ulp
    interpolation differences between engines flip counts. Instead:
    centi-unit BIGINTs, medians over a DOUBLED domain (even-n midpoints
    land on exact integers: percentile interpolation at 0.5 of two
    exact doubles is exact), and the outlier test 2·dev2c > 3·mad4c in
    pure BIGINT. Output units are exact micro-units.

    Scale note: exact percentile buffers one group in memory (same
    bound as events_value_quantiles) — per-event-type groups; for
    heavy-tailed 100 TB telemetry use the log-histogram quantile path.
    The median dim (one row per event_type) broadcasts back."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    med = ev.groupBy("event_type").agg(
        F.percentile(F.col("vc") * 2, F.lit(0.5)).cast("long").alias("med2c")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med2c",
        F.abs(F.col("vc") * 2 - F.col("med2c")).alias("dev2c"),
    )
    stats = dev.groupBy("event_type", "med2c").agg(
        F.percentile(F.col("dev2c") * 2, F.lit(0.5)).cast("long").alias(
            "mad4c"
        ),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        dev.join(
            F.broadcast(stats.select("event_type", "mad4c", "n_events")),
            "event_type",
        )
        .groupBy("event_type", "n_events", "med2c", "mad4c")
        .agg(
            F.sum(
                F.when(F.col("dev2c") * 2 > F.col("mad4c") * 3, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers")
        )
        .select(
            "event_type",
            "n_events",
            (F.col("med2c") * 5000).cast("long").alias("med_micro"),
            (F.col("mad4c") * 2500).cast("long").alias("mad_micro"),
            "n_outliers",
        )
    )


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective 3-way join + agg + top-10 by revenue
    (deterministic tie-break on orderkey)."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1998-01-01"))
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1996-01-01"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(
                    _dec("l_extendedprice")
                    * (F.lit(1).cast("decimal(18,6)") - _dec("l_discount"))
                ),
                4,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets over lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(
                F.sum(
                    _dec("l_extendedprice")
                    * (F.lit(1).cast("decimal(18,6)") - _dec("l_discount"))
                ),
                4,
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


def q_host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-graph PageRank (3 iterations, integer fixed-point) — the
    crawl-priority signal over the link graph. Edges derive
    deterministically from the doc universe (3 md5-hashed out-links per
    doc onto the host index), the host index comes from the scalable
    range-partitioned rank (operators/ranking — no single-partition
    window), and the rank arithmetic is BIGINT micro-units with
    truncating division, so the oracle (same 3 unrolled iterations in
    DuckDB) matches bit-for-bit regardless of summation order."""
    from docrawl_spark.datapipe.graph import host_edges, pagerank_hosts
    from docrawl_spark.operators.ranking import with_global_rank

    urls = _doc_urls(spark, sf_dir)
    hosts = urls.select("host").distinct()
    idx = with_global_rank(hosts, ["host"], rank_col="host_idx")
    cnt = hosts.agg(F.count("*").alias("n_hosts"))
    links = (
        urls.select(
            "host",
            F.col("doc_id").cast("string").alias("did"),
            F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("k"),
        )
        .crossJoin(F.broadcast(cnt))
        .select(
            F.col("host").alias("src_host"),
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("did"), F.lit(":"), F.col("k").cast("string"))),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.col("n_hosts"),
            ).alias("dst_idx"),
        )
    )
    raw = links.join(
        F.broadcast(idx), links.dst_idx == idx.host_idx
    ).select("src_host", F.col("host").alias("dst_host"))
    return pagerank_hosts(host_edges(raw), hosts, n_iter=3)


def q_line_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style line-level boilerplate removal: lines repeated
    verbatim ≥20 times corpus-wide are dropped per-line, docs
    re-assembled in order. The flat testdata text has no newlines, so
    both sides inject one every 2 tokens (regexp_replace) before the
    operator runs — the operator itself is split(\\n)-native."""
    from docrawl_spark.datapipe.dedup import drop_duplicate_lines

    docs = _docs_par(spark, sf_dir).select(
        "doc_id",
        F.regexp_replace(F.trim(F.col("text")), r"(\S+ \S+) ", "$1\n").alias("text"),
    )
    return drop_duplicate_lines(docs, min_count=20)


def q_url_dedup_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL normalization for the dedup/seen key: fragment drop,
    tracking-param strip (utm_*, fbclid, …), param sort, lowercase
    scheme+host. Three of the four synthesized variants collapse to
    the same normalized url (the tracking noise differs), the fourth
    keeps its path-only form — the frontier-key collapse in miniature."""
    from docrawl_spark.functions.canon import dedup_normalize_url_col

    u = _doc_urls(spark, sf_dir)
    raw = F.concat(
        F.col("url"),
        F.when(F.col("doc_id") % 4 == 0, F.lit("?utm_source=feed&b=2&a=1#frag"))
        .when(F.col("doc_id") % 4 == 1, F.lit("?b=2&utm_medium=email&a=1"))
        .when(F.col("doc_id") % 4 == 2, F.lit("?a=1&b=2"))
        .otherwise(F.lit("#section")),
    )
    return u.select(
        "doc_id",
        raw.alias("url_raw"),
        dedup_normalize_url_col(raw).alias("url_norm"),
    )


def q_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode canonicalization (the pre-tokenizer cleanup stage) via
    the Arrow-native clean_text operator: NFC normalize, strip control
    chars, collapse whitespace, trim. Both sides wrap the clean ASCII
    testdata in deterministic mess — tabs, control bytes, and a
    combining acute (e + U+0301) that NFC must compose to 'é'."""
    from docrawl_spark.datapipe.text import clean_text

    messy = _docs_par(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("\t "), F.col("text"), F.lit(" \x01\x01 caf"), F.lit("é")
        ).alias("text"),
    )
    return clean_text(messy).select("doc_id", "text_clean")


def q_doc_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-host document-length percentile filter (the Gopher-style
    length outlier cut): percent_rank over (n_chars, doc_id) per host,
    keep the central 5th-95th percentile band."""
    w = Window.partitionBy("host").orderBy(F.col("n_chars").asc(), F.col("doc_id").asc())
    return (
        _doc_urls(spark, sf_dir)
        .withColumn("len_pr", F.round(F.percent_rank().over(w), 6))
        .where((F.col("len_pr") >= 0.05) & (F.col("len_pr") <= 0.95))
        .select("host", "doc_id", "n_chars", "len_pr")
    )


def q_corpus_sample_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix construction: per-source deterministic hash
    sampling (stratified_sample, md5 oracle mode) — src0 kept fully,
    src1 half, src2 quarter, everything else 10% — then per-source
    sampled counts. The selection is a pure function of doc_id, so the
    oracle checks the exact sampled set, not a statistical property."""
    from docrawl_spark.datapipe.sampling import stratified_sample

    s = stratified_sample(
        _t(spark, sf_dir, "documents"),
        fractions={"src0": 1.0, "src1": 0.5, "src2": 0.25},
        default_fraction=0.1,
    )
    return s.groupBy("source").agg(
        F.count("*").alias("n_sampled"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


def q_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (hash_split): assignment is a
    pure function of doc_id (stable as the corpus grows). Output: docs
    and chars per (split, lang)."""
    from docrawl_spark.datapipe.sampling import hash_split

    s = hash_split(
        _t(spark, sf_dir, "documents"),
        weights={"train": 0.8, "val": 0.1, "test": 0.1},
    )
    return s.groupBy("split", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


def q_robots_rfc_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 robots evaluation (wildcards, $ anchors, longest-match,
    Allow-beats-Disallow on spec ties): hosts carry synthesized rule
    blobs (3 flavors incl. a wildcard-vs-anchor precedence fight and an
    exact tie), every doc url is decided. Parse → compile-to-regex →
    longest-match all happen in pure built-in array exprs; the oracle
    reimplements the same algebra in DuckDB list lambdas."""
    from docrawl_spark.operators.politeness import (
        robots_allowed_rfc_col,
        robots_compile_col,
        robots_rules_col,
    )

    u = _doc_urls(spark, sf_dir)
    g = F.pmod(F.regexp_extract(F.col("source"), r"(\d+)", 1).cast("int"), F.lit(3))
    nl = "\n"
    blob = (
        F.when(
            g == 0,
            F.lit(
                "User-agent: *" + nl + "Disallow: /doc/1*" + nl
                + "Allow: /doc/1$" + nl + "Allow: /doc/12*"
            ),
        )
        .when(
            g == 1,
            F.lit(
                "Disallow: /doc/*3$" + nl + "Allow: /doc/3$" + nl
                + "Disallow: /doc/4*" + nl + "Allow: /doc/4*"
            ),
        )
        .otherwise(F.lit(""))
    )
    compiled = robots_compile_col(robots_rules_col(blob))
    return u.select(
        "doc_id",
        "host",
        robots_allowed_rfc_col(F.col("url"), compiled).alias("allowed"),
    )


def q_sitemap_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap ingestion: per-host <urlset> XML synthesized from the
    doc universe (deterministic entry order), parsed back into frontier
    seed rows with Spark 4's native from_xml (operators/sitemap). The
    oracle builds the identical XML and extracts with regexes — so the
    XML PARSER itself is what's being cross-checked."""
    from docrawl_spark.operators.sitemap import sitemap_entries

    u = _doc_urls(spark, sf_dir)
    entry = F.concat(
        F.lit("<url><loc>"), F.col("url"),
        F.lit("</loc><lastmod>2026-0"),
        (F.col("doc_id") % 9 + 1).cast("string"),
        F.lit("-15</lastmod><priority>0."),
        (F.col("doc_id") % 9).cast("string"),
        F.lit("</priority></url>"),
    )
    sm = (
        u.select("host", "doc_id", entry.alias("entry"))
        .groupBy("host")
        .agg(
            F.concat(
                F.lit("<urlset>"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("doc_id", "entry"))),
                        lambda s: s.getField("entry"),
                    ),
                    "",
                ),
                F.lit("</urlset>"),
            ).alias("sitemap_xml")
        )
    )
    return sitemap_entries(sm, keep_cols=["host"])


def q_sitemap_index_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-sitemap ingestion: each host publishes a <sitemapindex>
    referencing two child <urlset> sitemaps (docs split by parity);
    operators/sitemap.expand_sitemap_index resolves the one-hop
    indirection (index parse → child-loc equi-join → entry parse).
    The oracle computes the expected entry rows directly, so the whole
    index→join→parse pipeline is what's hash-checked."""
    from docrawl_spark.operators.sitemap import expand_sitemap_index

    u = _doc_urls(spark, sf_dir)
    entry = F.concat(
        F.lit("<url><loc>"), F.col("url"),
        F.lit("</loc><lastmod>2026-0"),
        (F.col("doc_id") % 9 + 1).cast("string"),
        F.lit("-15</lastmod><priority>0."),
        (F.col("doc_id") % 9).cast("string"),
        F.lit("</priority></url>"),
    )
    child_url = F.concat(
        F.lit("https://"), F.col("host"), F.lit("/sitemap-"),
        (F.col("doc_id") % 2).cast("string"), F.lit(".xml"),
    )
    children = (
        u.select(
            "host",
            "doc_id",
            child_url.alias("sitemap_url"),
            entry.alias("entry"),
        )
        .groupBy("host", "sitemap_url")
        .agg(
            F.concat(
                F.lit("<urlset>"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("doc_id", "entry"))),
                        lambda s: s.getField("entry"),
                    ),
                    "",
                ),
                F.lit("</urlset>"),
            ).alias("sitemap_xml")
        )
    )
    indexes = (
        u.select("host")
        .distinct()
        .select(
            "host",
            F.concat(
                F.lit("<sitemapindex><sitemap><loc>https://"),
                F.col("host"),
                F.lit("/sitemap-0.xml</loc></sitemap><sitemap><loc>https://"),
                F.col("host"),
                F.lit("/sitemap-1.xml</loc></sitemap></sitemapindex>"),
            ).alias("sitemap_xml"),
        )
    )
    return expand_sitemap_index(indexes, children, keep_cols=["host"])


def q_crawl_delay_budgets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-delay directive → per-host wave budget: hosts carry
    synthesized robots blobs with/without 'Crawl-delay: <s>' lines
    (incl. fractional); budget = floor(wave_seconds/delay), min 1,
    default when absent. The politeness knob derived from the site's
    own policy (operators/politeness.budget_from_crawl_delay)."""
    from docrawl_spark.operators.politeness import budget_from_crawl_delay, crawl_delay_col

    u = _doc_urls(spark, sf_dir).select("host").distinct()
    g = F.pmod(F.regexp_extract(F.col("host"), r"(\d+)", 1).cast("int"), F.lit(4))
    blob = (
        F.when(g == 0, F.lit("User-agent: *\nCrawl-delay: 10\nDisallow: /x"))
        .when(g == 1, F.lit("crawl-Delay: 0.5"))
        .when(g == 2, F.lit("Disallow: /y"))
        .otherwise(F.lit("CRAWL-DELAY: 7200"))
    )
    return u.select(
        "host",
        F.round(crawl_delay_col(blob), 4).alias("crawl_delay"),
        budget_from_crawl_delay(blob, wave_seconds=3600, default_budget=100).alias(
            "budget"
        ),
    )


def q_anchor_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text index (operators/links.anchor_term_index): docs link
    to bucketed targets with their leading tokens as anchor text; per
    target, the top-3 anchor terms by count (term-asc ties)."""
    from docrawl_spark.operators.links import anchor_term_index

    u = _t(spark, sf_dir, "documents")
    links = u.select(
        F.concat(
            F.lit("https://t.test/p"), (F.col("doc_id") % 20).cast("string")
        ).alias("url"),
        F.concat_ws(
            " ",
            F.slice(
                F.split(F.lower(F.regexp_replace(F.trim("text"), r"\s+", " ")), " "),
                1,
                3,
            ),
        ).alias("anchor_text"),
    )
    return anchor_term_index(links, k=3)


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (datapipe/text.pii_scrub): deterministic PII is
    grafted onto each doc's text (emails on doc_id%3==0, dotted-quad
    IPs on %4==1, +-format phones on %5==2 — every pattern and the
    none-present case all exercised), then scrubbed and counted. The
    md5 of the scrubbed text pins the FULL replacement (order included)
    value-for-value cross-engine; counts are computed pre-redaction."""
    from docrawl_spark.datapipe.text import pii_counts_cols, pii_scrub_col

    d = _t(spark, sf_dir, "documents")
    ds = F.col("doc_id").cast("string")
    email = F.when(
        F.pmod(F.col("doc_id"), F.lit(3)) == 0,
        F.concat(
            F.lit(" mail "), F.col("source"), F.lit("_"), ds, F.lit("@ex"),
            F.pmod(F.col("doc_id"), F.lit(7)).cast("string"), F.lit(".org"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        F.pmod(F.col("doc_id"), F.lit(4)) == 1,
        F.concat(
            F.lit(" from 10."), F.pmod(F.col("doc_id"), F.lit(200)).cast("string"),
            F.lit(".3."), F.pmod(F.col("doc_id"), F.lit(250)).cast("string"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        F.pmod(F.col("doc_id"), F.lit(5)) == 2,
        F.concat(
            F.lit(" call +1 (202) 555-01"),
            F.lpad(F.pmod(F.col("doc_id"), F.lit(100)).cast("string"), 2, "0"),
        ),
    ).otherwise(F.lit(""))
    t = F.concat(F.substring(F.col("text"), 1, 40), email, ip, phone)
    return d.select(
        "doc_id",
        *[c.cast("long").alias(n) for c, n in zip(
            pii_counts_cols(t), ["n_email", "n_ipv4", "n_phone"]
        )],
        F.md5(pii_scrub_col(t)).alias("scrub_md5"),
    )


def q_sitemap_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap discovery from robots.txt (operators/sitemap.
    discover_sitemaps, RFC 9309 §2.3): per-host synthetic blobs cover
    a canonical directive, mixed-case + CRLF + tab + multiple
    directives, no directive, and a leading-whitespace directive;
    output is (host, sitemap_url, sitemap_order) in file order."""
    from docrawl_spark.operators.sitemap import discover_sitemaps

    u = _doc_urls(spark, sf_dir).select("host").distinct()
    g = F.pmod(F.regexp_extract(F.col("host"), r"(\d+)", 1).cast("int"), F.lit(4))
    blob = (
        F.when(g == 0, F.concat(
            F.lit("User-agent: *\nSitemap: https://"), F.col("host"),
            F.lit("/sitemap.xml\nDisallow: /x"),
        ))
        .when(g == 1, F.concat(
            F.lit("sitemap: https://"), F.col("host"),
            F.lit("/sm1.xml\r\nSITEMAP:\thttps://"), F.col("host"), F.lit("/sm2.xml"),
        ))
        .when(g == 2, F.lit("Disallow: /y"))
        .otherwise(F.concat(
            F.lit("  Sitemap: https://"), F.col("host"), F.lit("/a.xml#frag"),
        ))
    )
    out = discover_sitemaps(u.withColumn("robots_blob", blob))
    return out.withColumn("sitemap_order", F.col("sitemap_order").cast("long"))


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened source mixing weights (datapipe/sampling.
    temperature_weights, alpha=1/2): weight ∝ sqrt(n_docs), fixed-point
    BIGINT arithmetic end-to-end (IEEE sqrt is correctly rounded, so
    the ppm weights are bit-identical cross-engine)."""
    from docrawl_spark.datapipe.sampling import temperature_weights

    return temperature_weights(_t(spark, sf_dir, "documents"), "source")


def q_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature resampling applied (datapipe/sampling.
    temperature_resample): downsample to ≈2000 docs at alpha=1/2 via
    the deterministic md5 ppm predicate, then per-source audit counts —
    the exact SELECTION is pinned by min/max doc_id per source."""
    from docrawl_spark.datapipe.sampling import temperature_resample

    kept = temperature_resample(
        _t(spark, sf_dir, "documents"), target_total=2000, key_col="source"
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


def q_change_rate_recrawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness-driven recrawl (operators/recrawl.change_rate_estimates,
    Cho & Garcia-Molina TOIT 2003): the events stream doubles as a
    multi-fetch history (user→url, ts→fetched_at, event_type→content
    hash); per url the bias-corrected Poisson change rate and the
    staleness probability at a fixed as_of. Gaps accumulate as exact
    BIGINT microseconds; the two float outputs round to 6 on both
    engines."""
    from docrawl_spark.operators.recrawl import (
        change_rate_estimates,
        stale_prob_col,
    )

    ev = _t(spark, sf_dir, "events")
    hist = ev.select(
        F.col("user_id").alias("url_hash"),
        F.col("ts").alias("fetched_at"),
        F.col("event_type").alias("content_hash"),
        "event_id",
    )
    est = change_rate_estimates(hist, order_cols=["fetched_at", "event_id"])
    as_of = F.to_timestamp(F.lit("2024-01-31 06:00:00"))
    p = stale_prob_col(F.col("change_rate_per_day"), F.col("last_fetch"), as_of)
    return est.select(
        "url_hash",
        "n_fetches",
        "n_intervals",
        "n_changes",
        "total_gap_us",
        F.round("change_rate_per_day", 6).alias("rate_per_day"),
        F.round(p, 6).alias("stale_prob"),
    )


def q_corpus_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4/Gopher-style END-TO-END document filter as one composed
    plan: token floor → quality floor → language gate, first failing
    rule recorded as drop_reason (NULL = keep). Composition of
    datapipe/text's oracle-verified primitives — one scan, all
    JVM-side, no shuffle; what a real corpus build runs per document."""
    from docrawl_spark.datapipe.text import (
        langid_col,
        quality_score_col,
        token_count_col,
    )

    d = _docs_par(spark, sf_dir)
    t = F.col("text")
    n_tok = token_count_col(t)
    q = quality_score_col(t)
    lang = langid_col(t)
    staged = d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        q.alias("quality"),
        lang.alias("lang_id"),
    )
    reason = (
        F.when(F.col("n_tokens") < 5, F.lit("too_short"))
        .when(F.col("quality") < 300, F.lit("low_quality"))
        .when(F.col("lang_id") == "und", F.lit("unknown_lang"))
        .otherwise(F.lit(None).cast("string"))
    )
    return staged.select(
        "doc_id",
        "n_tokens",
        "quality",
        "lang_id",
        reason.alias("drop_reason"),
        reason.isNull().alias("keep"),
    )


# DuckDB mirror of _trap_candidates + operators/traps.url_signature_col:
# an OPEN WITH-clause prefix (ends with a comma) that downstream oracle
# fragments extend. sig3 carries (host, url, discovered_by, depth, path,
# sig). Dialect notes: DuckDB regexp_replace needs the 'g' flag for the
# digit collapse (Spark replaces all matches by default); empty
# array_to_string returns NULL (COALESCE) — CLAUDE.md env facts.
_TRAP_CAND_SQL = """
            WITH d AS (SELECT doc_id, source FROM documents),
            cand AS (
              SELECT 'https://' || source || '.test/doc/'
                       || CAST(doc_id AS VARCHAR) AS url,
                     source || '.test' AS host,
                     'd' || CAST(doc_id AS VARCHAR) AS discovered_by,
                     1 AS depth
              FROM d
              UNION ALL
              SELECT 'https://' || source || '.test/cal/2024/'
                       || CAST((doc_id + k) % 12 + 1 AS VARCHAR) || '/'
                       || CAST((doc_id * k) % 28 + 1 AS VARCHAR)
                       || '?sid=' || CAST(doc_id * 10 + k AS VARCHAR) || '&d=1',
                     source || '.test',
                     'd' || CAST(doc_id AS VARCHAR),
                     2
              FROM d, UNNEST([1, 2, 3]) AS t(k)
              WHERE doc_id % 2 = 0
              UNION ALL
              SELECT 'https://' || source || '.test/a/b/a/b/a/b/p'
                       || CAST(doc_id AS VARCHAR),
                     source || '.test',
                     'd' || CAST(doc_id AS VARCHAR),
                     3
              FROM d WHERE doc_id % 97 = 0),
            sigd AS (
              SELECT host, url, discovered_by, depth,
                     regexp_extract(regexp_replace(url,
                       '^[a-z][a-z0-9+.-]*://[^/?#]*', ''),
                       '^([^?#]*)', 1) AS path,
                     regexp_extract(regexp_replace(url,
                       '^[a-z][a-z0-9+.-]*://[^/?#]*', ''),
                       '\\?([^#]*)', 1) AS q
              FROM cand),
            sig2 AS (
              SELECT host, url, discovered_by, depth, path,
                     '/' || COALESCE(array_to_string(
                       list_transform(
                         list_filter(string_split(path, '/'), s -> s <> ''),
                         s -> CASE WHEN regexp_matches(s, '^[0-9a-fA-F]{8,}$')
                                   THEN '@'
                                   ELSE regexp_replace(s, '[0-9]+', '#', 'g')
                              END), '/'), '') AS sig_path,
                     list_sort(list_filter(
                       list_transform(string_split(q, '&'),
                                      p -> string_split(p, '=')[1]),
                       kk -> kk <> '')) AS qkeys
              FROM sigd),
            sig3 AS (
              SELECT host, url, discovered_by, depth, path,
                     CASE WHEN len(qkeys) > 0
                          THEN sig_path || '?'
                                 || COALESCE(array_to_string(qkeys, '&'), '')
                          ELSE sig_path END AS sig
              FROM sig2),
"""


def _trap_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic candidate stream with embedded trap shapes: one
    normal /doc/{id} URL per document, a 3-URL calendar fan-out
    (/cal/2024/{m}/{d}?sid=&d=) per even doc_id, and a path-cycle URL
    (/a/b/a/b/a/b/p{id}) per doc_id % 97 == 0. Hosts whose doc_ids are
    all even carry a dominating calendar template; odd hosts carry
    none — the verdict table must separate them."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    host = F.concat(F.col("source"), F.lit(".test"))
    did = F.concat(F.lit("d"), F.col("doc_id").cast("string"))
    base = d.select(
        F.concat(
            F.lit("https://"), host, F.lit("/doc/"), F.col("doc_id").cast("string")
        ).alias("url"),
        host.alias("host"),
        did.alias("discovered_by"),
        F.lit(1).alias("depth"),
    )
    cal = (
        d.where(F.col("doc_id") % 2 == 0)
        .select(
            "doc_id",
            "source",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("k"),
        )
        .select(
            F.concat(
                F.lit("https://"),
                F.concat(F.col("source"), F.lit(".test")),
                F.lit("/cal/2024/"),
                ((F.col("doc_id") + F.col("k")) % 12 + 1).cast("string"),
                F.lit("/"),
                ((F.col("doc_id") * F.col("k")) % 28 + 1).cast("string"),
                F.lit("?sid="),
                (F.col("doc_id") * 10 + F.col("k")).cast("string"),
                F.lit("&d=1"),
            ).alias("url"),
            F.concat(F.col("source"), F.lit(".test")).alias("host"),
            F.concat(F.lit("d"), F.col("doc_id").cast("string")).alias("discovered_by"),
            F.lit(2).alias("depth"),
        )
    )
    cyc = d.where(F.col("doc_id") % 97 == 0).select(
        F.concat(
            F.lit("https://"),
            host,
            F.lit("/a/b/a/b/a/b/p"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        host.alias("host"),
        did.alias("discovered_by"),
        F.lit(3).alias("depth"),
    )
    return base.unionByName(cal).unionByName(cyc)


def q_trap_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-trap verdicts (operators/traps.flag_traps): URL-template
    signatures (digit runs → '#', hex tokens → '@', sorted query keys)
    aggregated per (host, signature); a signature is a trap when it is
    both high-volume and dominates its host's frontier share. The
    reference has no trap defense (its frontier is a driver-side list);
    at a 10^10-URL frontier this gate is what keeps one calendar CGI
    from swallowing the crawl."""
    from docrawl_spark.operators.traps import flag_traps

    cands = _trap_candidates(spark, sf_dir)
    out = flag_traps(cands, max_urls_per_sig=30, max_host_share=0.5)
    return out.select(
        "host",
        "sig",
        "n_urls",
        "n_parents",
        "max_depth",
        "host_urls",
        F.round("host_share", 6).alias("host_share"),
        "is_trap",
    )


def q_trap_gate_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trap gate applied end-to-end (operators/traps.trap_gate):
    candidates minus flagged-template rows (broadcast anti-join) minus
    path-cycle rows (row-local check)."""
    from docrawl_spark.operators.traps import flag_traps, trap_gate

    cands = _trap_candidates(spark, sf_dir)
    traps = flag_traps(cands, max_urls_per_sig=30, max_host_share=0.5)
    return trap_gate(cands, traps).select("host", "url")


def q_politeness_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-delay dispatch timeline (operators/politeness.
    schedule_timeline): after per-host top-k selection, the k-th URL of
    a host is scheduled at k * delay_ms — the reference's per-page
    ``time.sleep`` politeness (docrawl_core.py:1088,1105) re-expressed
    as a data column the fetch stage partitions on. Delay derives
    deterministically from the host's numeric suffix (0.5/1.0/1.5/2.0
    s); milliseconds are exact BIGINTs cross-engine."""
    from docrawl_spark.operators.politeness import schedule_timeline

    urls = _doc_urls(spark, sf_dir)
    w = Window.partitionBy("host").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    sel = (
        urls.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select(
            F.col("host").alias("host_hash"),
            "doc_id",
            (
                (F.regexp_extract(F.col("source"), "([0-9]+)", 1).cast("long") % 4)
                * 0.5
                + 0.5
            ).alias("_crawl_delay"),
            "rn",
        )
    )
    out = schedule_timeline(sel, order_cols=["rn"])
    return out.select(
        F.col("host_hash").alias("host"), "doc_id", "fetch_seq", "scheduled_at_ms"
    )


def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization via native session_window
    (streaming/sessions.sessionize — the same expression runs under
    readStream with a watermark): maximal per-user event runs with no
    30-minute gap; session_end = last event + gap (Spark's native
    convention, mirrored in the oracle's islands CTE)."""
    from docrawl_spark.streaming.sessions import sessionize

    ev = _t(spark, sf_dir, "events")
    return sessionize(
        ev,
        ["user_id"],
        ts_col="ts",
        gap="30 minutes",
        aggs=[
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        ],
    )


def _redirect_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic redirect edge set over the URL universe: chain
    edges url(d) → url(d-1) for d % 7 ∈ {1,2,3} (chains of ≤3 hops
    ending at a d % 7 == 0 terminal), a 2-cycle url(d) ⇄ url(d+1) for
    d % 101 ∈ {5,6}, and a cycle-entry edge for d % 101 == 4. The rule
    sets are mutually exclusive so every src has exactly one Location."""
    u = _doc_urls(spark, sf_dir).select("doc_id", "url")
    a = u.select(F.col("doc_id").alias("a_id"), F.col("url").alias("src"))
    b = u.select(F.col("doc_id").alias("b_id"), F.col("url").alias("dst"))
    chain = (
        a.where(
            (F.col("a_id") % 7).isin(1, 2, 3)
            & ~(F.col("a_id") % 101).isin(4, 5, 6)
        )
        .join(b, F.col("b_id") == F.col("a_id") - 1)
        .select("src", "dst")
    )
    up = (
        a.where((F.col("a_id") % 101).isin(4, 5))
        .join(b, F.col("b_id") == F.col("a_id") + 1)
        .select("src", "dst")
    )
    down = (
        a.where(F.col("a_id") % 101 == 6)
        .join(b, F.col("b_id") == F.col("a_id") - 1)
        .select("src", "dst")
    )
    return chain.unionByName(up).unionByName(down)


# shared WITH-prefix for the redirect oracles: the same deterministic
# edge rules + the bounded recursive walk (hops <= 8 lets a 9th row
# appear exactly when the chain is over-budget or cyclic — the
# too_many sentinel, mirroring compose_redirect_map's saturating cap).
_REDIRECT_WALK_SQL = """
            WITH RECURSIVE u AS (""" + _DOC_URLS_SQL + """),
            edges AS (
              SELECT a.url AS src, b.url AS dst
              FROM u a JOIN u b ON b.doc_id = a.doc_id - 1
              WHERE a.doc_id % 7 IN (1, 2, 3)
                AND a.doc_id % 101 NOT IN (4, 5, 6)
              UNION ALL
              SELECT a.url, b.url
              FROM u a JOIN u b ON b.doc_id = a.doc_id + 1
              WHERE a.doc_id % 101 IN (4, 5)
              UNION ALL
              SELECT a.url, b.url
              FROM u a JOIN u b ON b.doc_id = a.doc_id - 1
              WHERE a.doc_id % 101 = 6),
            e1 AS (SELECT src, MIN(dst) AS dst FROM edges GROUP BY src),
            walk AS (
              SELECT src, dst AS cur, 1 AS hops FROM e1
              UNION ALL
              SELECT w.src, e.dst, w.hops + 1
              FROM walk w JOIN e1 e ON e.src = w.cur
              WHERE w.hops <= 8),
            fin AS (
              SELECT src, arg_max(cur, hops) AS fin_url,
                     CAST(MAX(hops) AS BIGINT) AS mh
              FROM walk GROUP BY src),
"""


def q_redirect_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redirect-chain resolution (operators/redirects.resolve_redirects,
    pointer-jumping): every URL annotated with its final destination,
    exact hop count, and direct/redirected/too_many status — chains,
    2-cycles, and cycle-entry rows all present in the input. Oracle: a
    bounded DuckDB recursive CTE walking the same edge rules."""
    from docrawl_spark.operators.redirects import resolve_redirects

    cands = _doc_urls(spark, sf_dir).select("doc_id", "url")
    edges = _redirect_edges(spark, sf_dir)
    return resolve_redirects(cands, edges, max_hops=8).select(
        "doc_id", "url", "final_url", "n_hops", "status"
    )


def _aliased_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus plus deterministic content aliases (the driver's
    documents table has NO exact duplicate texts at sf0.01, so DUST/
    mirror inputs synthesize them): every doc_id % 9 == 3 page is also
    served by a mirror host (mirror-<source>.test, same text), and
    every doc_id % 11 == 7 page has a same-host tracking-param alias —
    the two classic DUST shapes."""
    base = _doc_urls(spark, sf_dir).join(
        _t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    ).select("doc_id", "url", "host", "text")
    mirror = (
        base.where(F.col("doc_id") % 9 == 3)
        .select(
            "doc_id",
            F.regexp_replace("url", r"^https://", "https://mirror-").alias("url"),
            F.concat(F.lit("mirror-"), F.col("host")).alias("host"),
            "text",
        )
    )
    tracked = base.where(F.col("doc_id") % 11 == 7).select(
        "doc_id",
        F.concat(F.col("url"), F.lit("?utm_source=feed")).alias("url"),
        "host",
        "text",
    )
    return base.unionByName(mirror).unionByName(tracked)


_ALIASED_DOCS_SQL = """
  SELECT u.doc_id, u.url, u.host, d.text
  FROM (""" + _DOC_URLS_SQL + """) u JOIN documents d USING (doc_id)
  UNION ALL
  SELECT u.doc_id,
         regexp_replace(u.url, '^https://', 'https://mirror-') AS url,
         'mirror-' || u.host AS host, d.text
  FROM (""" + _DOC_URLS_SQL + """) u JOIN documents d USING (doc_id)
  WHERE u.doc_id % 9 = 3
  UNION ALL
  SELECT u.doc_id, u.url || '?utm_source=feed' AS url, u.host, d.text
  FROM (""" + _DOC_URLS_SQL + """) u JOIN documents d USING (doc_id)
  WHERE u.doc_id % 11 = 7
"""


def q_dust_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DUST detection (operators/mirrors.duplicate_content_clusters):
    exact duplicate-content clusters over the aliased corpus (mirror
    hosts + tracking-param aliases) with deterministic canonical-URL
    election (lexicographic min) — the frontier-collapse input. md5
    content identity is bit-reproducible in DuckDB."""
    from docrawl_spark.operators.mirrors import duplicate_content_clusters

    return duplicate_content_clusters(_aliased_docs(spark, sf_dir)).select(
        "content_hash",
        "canonical_url",
        "n_aliases",
        F.col("n_hosts").cast("long").alias("n_hosts"),
    )


def q_mirror_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirror-host candidates (operators/mirrors.mirror_host_pairs):
    host pairs sharing ≥2 identical contents over the aliased corpus,
    hub-content quadratic guard applied (max_hosts_per_hash=64)."""
    from docrawl_spark.operators.mirrors import mirror_host_pairs

    return mirror_host_pairs(
        _aliased_docs(spark, sf_dir), min_shared=2, max_hosts_per_hash=64
    )


def q_revalidation_wave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-GET recrawl accounting (operators/revalidate): a
    synthetic prior fetch log stores the current validator for 3 of
    every 4 docs (doc_id % 4 == 1 rows are stale, doc_id % 5 == 2 rows
    were never fetched → unconditional); classify 304 vs 200 and roll
    up per-host bandwidth saved vs transferred — the wave's
    bandwidth-delta metric."""
    from docrawl_spark.operators.revalidate import (
        classify_revalidated,
        etag_col,
        revalidation_plan,
    )

    docs = _doc_urls(spark, sf_dir).join(
        _t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )
    log = docs.where(F.col("doc_id") % 5 != 2).select(
        "url",
        F.when(
            F.col("doc_id") % 4 == 1,
            etag_col(F.concat(F.col("text"), F.lit("v0"))),
        )
        .otherwise(etag_col(F.col("text")))
        .alias("etag"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("fetched_at"),
    )
    planned = revalidation_plan(
        docs.select("doc_id", "url", "host", "text"), log
    )
    out = classify_revalidated(
        planned.withColumn("n_bytes", F.length("text")),
        etag_col(F.col("text")),
    )
    return out.groupBy("host").agg(
        F.sum((F.col("status_code") == 304).cast("long")).alias("n_304"),
        F.sum((F.col("status_code") == 200).cast("long")).alias("n_200"),
        F.sum((~F.col("conditional")).cast("long")).alias("n_unconditional"),
        F.sum("bytes_saved").alias("bytes_saved"),
        F.sum("bytes_fetched").alias("bytes_fetched"),
    )


# Shared open WITH-prefix: the full 3-iteration fixed-point PageRank
# pipeline (same edge derivation as q_host_pagerank) ending at CTE
# ``i3(host, rank_units)`` — extended by host_pagerank (plain SELECT)
# and frontier_priority (per-URL composition).
_PAGERANK_SQL = r"""
            WITH u AS (
              SELECT source || '.test' AS host, CAST(doc_id AS VARCHAR) AS did
              FROM documents),
            hosts AS (SELECT DISTINCT host FROM u),
            cnt AS (SELECT COUNT(*) AS n_hosts FROM hosts),
            idx AS (
              SELECT host, ROW_NUMBER() OVER (ORDER BY host) - 1 AS host_idx
              FROM hosts),
            raw AS (
              SELECT u.host AS src_host,
                     ('0x' || substr(md5(u.did || ':' || CAST(k AS VARCHAR)), 1, 15))::BIGINT
                       % (SELECT n_hosts FROM cnt) AS dst_idx
              FROM u, UNNEST([0, 1, 2]) AS t(k)),
            e0 AS (
              SELECT r.src_host, i.host AS dst_host
              FROM raw r JOIN idx i ON r.dst_idx = i.host_idx
              WHERE r.src_host <> i.host),
            edges AS (
              SELECT src_host, dst_host, COUNT(*) AS weight FROM e0 GROUP BY 1, 2),
            outw AS (SELECT src_host, SUM(weight) AS out_w FROM edges GROUP BY 1),
            ew AS (
              SELECT e.src_host, e.dst_host,
                     (CAST(e.weight AS BIGINT) * 1000000) // CAST(o.out_w AS BIGINT)
                       AS share_ppm
              FROM edges e JOIN outw o USING (src_host)),
            consts AS (
              SELECT CAST(1000000000000 // n_hosts AS BIGINT) AS r0,
                     CAST((15 * (1000000000000 // n_hosts)) // 100 AS BIGINT) AS base
              FROM cnt),
            r0t AS (SELECT host, (SELECT r0 FROM consts) AS rank_units FROM hosts),
            c1 AS (
              SELECT e.dst_host AS host,
                     SUM((r.rank_units // 1000000) * e.share_ppm) AS in_units
              FROM ew e JOIN r0t r ON e.src_host = r.host GROUP BY 1),
            i1 AS (
              SELECT h.host,
                     CAST((SELECT base FROM consts)
                          + (85 * COALESCE(c.in_units, 0)) // 100 AS BIGINT) AS rank_units
              FROM hosts h LEFT JOIN c1 c USING (host)),
            c2 AS (
              SELECT e.dst_host AS host,
                     SUM((r.rank_units // 1000000) * e.share_ppm) AS in_units
              FROM ew e JOIN i1 r ON e.src_host = r.host GROUP BY 1),
            i2 AS (
              SELECT h.host,
                     CAST((SELECT base FROM consts)
                          + (85 * COALESCE(c.in_units, 0)) // 100 AS BIGINT) AS rank_units
              FROM hosts h LEFT JOIN c2 c USING (host)),
            c3 AS (
              SELECT e.dst_host AS host,
                     SUM((r.rank_units // 1000000) * e.share_ppm) AS in_units
              FROM ew e JOIN i2 r ON e.src_host = r.host GROUP BY 1),
            i3 AS (
              SELECT h.host,
                     CAST((SELECT base FROM consts)
                          + (85 * COALESCE(c.in_units, 0)) // 100 AS BIGINT) AS rank_units
              FROM hosts h LEFT JOIN c3 c USING (host))
"""


def q_frontier_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank-weighted frontier ordering: per-URL scheduling priority
    composed from the host's fixed-point PageRank and a depth decay —
    priority_units = rank_units div (1 + depth) — then the global
    top-100 (TakeOrdered shape, deterministic doc_id tie-break). The
    link-graph signal actually steering the scheduler, end to end in
    exact BIGINT arithmetic."""
    pr = q_host_pagerank(spark, sf_dir)
    urls = _doc_urls(spark, sf_dir).select(
        "doc_id", "host", (F.col("doc_id") % 4 + 1).alias("depth")
    )
    return (
        urls.join(F.broadcast(pr), "host")
        .select(
            "doc_id",
            "host",
            "depth",
            F.expr("rank_units div (1 + depth)").alias("priority_units"),
        )
        .orderBy(F.col("priority_units").desc(), F.col("doc_id").asc())
        .limit(100)
    )


def q_adaptive_delays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AIMD-style per-host politeness adaptation
    (operators/politeness.adaptive_crawl_delays): a deterministic
    synthetic fetch log (latency from doc_id, +1200 ms on every third
    source, 503s for doc_id % 17 == 0) rolled up into next-wave delay
    decisions — backoff / hold / recover branches all exercised."""
    from docrawl_spark.operators.politeness import adaptive_crawl_delays

    urls = _doc_urls(spark, sf_dir)
    src_num = F.regexp_extract(F.col("source"), "([0-9]+)", 1).cast("long")
    log = urls.select(
        "host",
        F.when(F.col("doc_id") % 17 == 0, F.lit(503))
        .otherwise(F.lit(200))
        .alias("status"),
        (
            F.lit(50)
            + (F.col("doc_id") * 37) % 400
            + F.when(src_num % 3 == 1, F.lit(1200)).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("latency_ms"),
    )
    return adaptive_crawl_delays(log)


def q_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog register table (p=6, m=64) over the URL universe —
    the constant-size mergeable cardinality summary a long-running
    crawl keeps instead of counting its seen set
    (functions/sketches.hll_registers). Exact integer construction on
    the 60-bit md5 slice; DuckDB reproduces every register."""
    from docrawl_spark.functions.sketches import hll_registers

    urls = _doc_urls(spark, sf_dir).select("url")
    return hll_registers(urls, "url", p=6).orderBy("bucket")


_BM25_CORE_SQL = r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
                       AS term
              FROM documents),
            dl AS (
              SELECT doc_id,
                     CAST(len(regexp_split_to_array(trim(lower(text)),
                                                    '\s+')) AS BIGINT) AS dl
              FROM documents),
            stats AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST((CAST(SUM(len(regexp_split_to_array(
                              trim(lower(text)), '\s+'))) AS BIGINT) * 1000)
                          // COUNT(*) AS BIGINT) AS avgdl_x1000
              FROM documents),
            hits AS (
              SELECT doc_id, term FROM toks
              WHERE term IN ('spark', 'vector', 'merge', 'hash', 'window')),
            tf AS (
              SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
              FROM hits GROUP BY 1, 2),
            dfx AS (
              SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
              FROM hits GROUP BY 1),
            scored AS (
              SELECT t.doc_id,
                     (t.tf * 2200 * 1000000)
                       // (t.tf * 1000000
                           + 1200 * (1000 - 750
                                     + (750 * d.dl * 1000)
                                       // s.avgdl_x1000)) AS tf_ppm,
                     CAST(length(bin((s.n_docs * 1000) // f.df)) AS BIGINT)
                       AS idf_units
              FROM tf t
              JOIN dfx f USING (term)
              JOIN dl d USING (doc_id), stats s)
"""


# the exact linear-counting lookup round(64*ln(64/z)), z=1..64 —
# generated by sketches._lc_table(6); inlined into the DuckDB oracles
_HLL_LC_TABLE = (
    "266, 222, 196, 177, 163, 151, 142, 133, 126, 119, 113, 107, 102, "
    "97, 93, 89, 85, 81, 78, 74, 71, 68, 65, 63, 60, 58, 55, 53, 51, "
    "48, 46, 44, 42, 40, 39, 37, 35, 33, 32, 30, 28, 27, 25, 24, 23, "
    "21, 20, 18, 17, 16, 15, 13, 12, 11, 10, 9, 7, 6, 5, 4, 3, 2, 1, 0"
)


def q_hll_host_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host distinct-path cardinality via GROUPED HLL
    (functions/sketches.hll_registers_grouped + hll_estimate_grouped):
    every host's estimate in one register HashAggregate pass — the
    scheduler's per-host frontier-size signal without a distinct per
    host. Small hosts take the exact linear-counting table branch."""
    from docrawl_spark.functions.sketches import (
        hll_estimate_grouped,
        hll_registers_grouped,
    )

    urls = _doc_urls(spark, sf_dir).select("host", "path")
    reg = hll_registers_grouped(urls, ["host"], "path", p=6)
    return hll_estimate_grouped(reg, ["host"], p=6)


def q_hll_union_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-crawl set union via sketch merge: two overlapping URL
    subsets (doc_id % 3 != 0 and doc_id % 2 != 0) are sketched
    independently, merged bucket-wise (functions/sketches.hll_union),
    and estimated — no key exchange ever happens. The oracle computes
    the identical register MAX-merge in SQL."""
    from docrawl_spark.functions.sketches import (
        hll_estimate,
        hll_registers,
        hll_union,
    )

    urls = _doc_urls(spark, sf_dir).select("doc_id", "url")
    a = hll_registers(urls.where(F.col("doc_id") % 3 != 0), "url", p=6)
    b = hll_registers(urls.where(F.col("doc_id") % 2 != 0), "url", p=6)
    return hll_estimate(hll_union(a, b), p=6)


def q_hll_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixed-point HLL cardinality estimate from the register
    table — alpha-corrected harmonic mean with the small-range
    linear-counting branch, all BIGINT (functions/sketches
    .hll_estimate), so the estimate itself hash-matches DuckDB."""
    from docrawl_spark.functions.sketches import hll_estimate, hll_registers

    urls = _doc_urls(spark, sf_dir).select("url")
    return hll_estimate(hll_registers(urls, "url", p=6), p=6)


def q_bloom_fpr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom false-positive calibration (functions/bloom.
    sql_bloom_membership): the relational double-hash twin of the
    engine's numpy Bloom, sized tight (m=1024, k=3) so the fixture
    actually exhibits false positives. Members = even doc_ids; every
    URL probed; structurally zero false negatives, and the measured
    FPR is what sizes the production filter. The bit array is the
    DISTINCT member-position set (≤ m rows, broadcast)."""
    from docrawl_spark.functions.bloom import sql_bloom_membership

    urls = _doc_urls(spark, sf_dir).select("doc_id", "url")
    members = urls.where(F.col("doc_id") % 2 == 0).select("url")
    out = sql_bloom_membership(
        members, urls.select("url"), "url", m_bits=1024, k=3
    )
    return out.join(urls, "url").select(
        "url",
        (F.col("doc_id") % 2 == 0).cast("int").alias("truly_seen"),
        "bloom_positive",
    )


def q_events_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users per day via HLL register merge
    (functions/sketches.hll_rolling_estimate): per-day sketches from
    one fact-table pass, window-merged by (day, bucket) MAX — the
    mergeability property that answers trailing-window cardinality at
    100 TB without re-scanning 7 days of events per day. The oracle
    replays the identical register/merge/estimate arithmetic."""
    from docrawl_spark.functions.sketches import hll_rolling_estimate

    ev = _t(spark, sf_dir, "events").select(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .alias("day_idx"),
        F.col("user_id"),
    )
    out = hll_rolling_estimate(ev, "day_idx", "user_id", window_days=7, p=6)
    return out.select(
        F.col("win_day").cast("long").alias("win_day"), "estimate_units"
    )


def q_cms_hot_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min hot-host detection: the d×w counter sketch over the
    frontier's host column, point-queried for every candidate host —
    min-over-rows upper bound (functions/sketches.cms_*). The
    mergeable form the scheduler keeps between waves to pick salting
    candidates before any exact per-host pass runs."""
    from docrawl_spark.functions.sketches import cms_counters, cms_estimate

    urls = _doc_urls(spark, sf_dir)
    counters = cms_counters(urls, "host", depth=4, width=1024)
    cand = urls.select("host").distinct()
    return (
        cms_estimate(counters, cand, "host", depth=4, width=1024)
        .orderBy(F.col("cm_estimate").desc(), F.col("host").asc())
        .limit(20)
    )


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact BM25 top-20 over documents for a fixed query-term
    set (datapipe/search.bm25_topk): explode→filter-to-vocabulary→
    HashAggregates→broadcast idf dim→TakeOrdered. k1=1.2 / b=0.75 in
    ppt fixed-point; idf is the bit-length integer log2 — every score
    reproducible bit-for-bit in DuckDB."""
    from docrawl_spark.datapipe.search import bm25_topk

    docs = _docs_par(spark, sf_dir)
    return bm25_topk(
        docs, ["spark", "vector", "merge", "hash", "window"], k=20
    )


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC delta export between two crawl snapshots
    (sources/storage.snapshot_diff): deterministic old/new table states
    derived from documents (doc_id % 11 membership shifts simulate
    pages appearing/vanishing; every fifth doc gets a changed content
    signature) → one full-outer key join classifying added / removed /
    changed, unchanged rows dropped. The incremental-recrawl feed and
    warehouse-replication primitive; pairs with
    Warehouse.read(as_of=...) to diff committed snapshots."""
    from docrawl_spark.sources.storage import snapshot_diff

    urls = _doc_urls(spark, sf_dir).select("doc_id", "url")
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = urls.join(docs, "doc_id")
    old = base.where(F.col("doc_id") % 11 != 3).select(
        "url", F.md5("text").alias("content_sig")
    )
    new = base.where(F.col("doc_id") % 11 != 7).select(
        "url",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.md5(F.concat(F.col("text"), F.lit("|rev2"))),
        )
        .otherwise(F.md5("text"))
        .alias("content_sig"),
    )
    return snapshot_diff(old, new, ["url"], ["content_sig"])


def _latency_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic fetch-latency column over documents."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        ((F.col("doc_id") * 37) % 4000 + 50).cast("long").alias("latency_ms"),
    )


def q_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable log2×sub-bucket latency histogram
    (functions/sketches.log2_histogram): ≤ 64·8 counter rows replacing
    a full-sort percentile at scale; counters add across waves. Pure
    integer bucketing (bit-length msb + next-3-bits sub-position)."""
    from docrawl_spark.functions.sketches import log2_histogram

    return log2_histogram(_latency_docs(spark, sf_dir), "latency_ms")


def q_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certified percentile intervals (p50/p95/p99) read off the
    cumulative log2 histogram — nearest-rank in integer arithmetic,
    the sketch-route answer to exact-quantile shuffles."""
    from docrawl_spark.functions.sketches import (
        histogram_percentile_bounds,
        log2_histogram,
    )

    hist = log2_histogram(_latency_docs(spark, sf_dir), "latency_ms")
    return histogram_percentile_bounds(hist, [50, 95, 99])


def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view upkeep: per-host (n_docs, sum_n_chars) rollup
    maintained INCREMENTALLY from a snapshot_diff CDC delta
    (operators/rollup) — old rollup ⊕ delta-sized adjustments, never a
    rescan of the new state. The oracle computes the direct GROUP BY
    over the new state, so the hash-match certifies incremental ≡
    full recompute AND cross-engine."""
    from docrawl_spark.operators.rollup import (
        apply_rollup_delta,
        rollup_adjustments,
        rollup_from_state,
    )
    from docrawl_spark.sources.storage import snapshot_diff

    base = _doc_urls(spark, sf_dir).select("doc_id", "url", "host", "n_chars")
    old = base.where(F.col("doc_id") % 11 != 3).select(
        "host", "url", "n_chars"
    )
    new = base.where(F.col("doc_id") % 11 != 7).select(
        "host",
        "url",
        F.when(F.col("doc_id") % 5 == 0, F.col("n_chars") + 37)
        .otherwise(F.col("n_chars"))
        .alias("n_chars"),
    )
    old_stats = rollup_from_state(old, ["host"], ["n_chars"], count_col="n_docs")
    delta = snapshot_diff(old, new, ["host", "url"], ["n_chars"])
    adj = rollup_adjustments(delta, ["host"], ["n_chars"])
    return apply_rollup_delta(
        old_stats, adj, ["host"], ["n_chars"], count_col="n_docs"
    )


def q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+vector retrieval: BM25 top-20 and exact-cosine
    top-20 fused by reciprocal-rank fusion (datapipe/search.rrf_fuse,
    10^6 div (60+rank) — integer-exact). The modern corpus-mining
    shape; both candidate lists and the fusion are top-k sized, so
    everything after the two scans is driver-scale."""
    from docrawl_spark.datapipe.search import bm25_topk, rrf_fuse, with_rank
    from docrawl_spark.datapipe.similarity import cosine_topk

    bm = bm25_topk(
        _docs_par(spark, sf_dir),
        ["spark", "vector", "merge", "hash", "window"],
        k=20,
    )
    bmr = with_rank(
        bm, [F.col("score_units").desc(), F.col("doc_id").asc()]
    )
    cos = cosine_topk(_t(spark, sf_dir, "embeddings"), _QUERY_VEC, k=20)
    cosr = with_rank(
        cos.withColumnRenamed("vec_id", "doc_id"),
        [F.col("cosine").desc(), F.col("doc_id").asc()],
    )
    return rrf_fuse([bmr, cosr], topk=10)


def q_corpus_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard manifest (datapipe/export
    .shard_manifest): shard = hash60(doc_id) % 8; per-shard row count
    + order-independent BIT_XOR content signature over
    hash60(doc_id ':' md5(text)). Two exports are byte-equivalent iff
    their manifests match — verified cross-engine here."""
    from docrawl_spark.datapipe.export import shard_manifest

    return shard_manifest(_docs_par(spark, sf_dir), n_shards=8)


def q_host_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-graph HITS (2 iterations, integer fixed-point, L1-normalized
    per iteration) — hubs & authorities over the SAME deterministic edge
    derivation as q_host_pagerank, so the two link-graph signals are
    directly comparable. Bit-exact vs a DuckDB oracle running the same
    unrolled iterations (datapipe/graph.hits_hosts docstring has the
    full integer spec)."""
    from docrawl_spark.datapipe.graph import hits_hosts, host_edges
    from docrawl_spark.operators.ranking import with_global_rank

    urls = _doc_urls(spark, sf_dir)
    hosts = urls.select("host").distinct()
    idx = with_global_rank(hosts, ["host"], rank_col="host_idx")
    cnt = hosts.agg(F.count("*").alias("n_hosts"))
    links = (
        urls.select(
            "host",
            F.col("doc_id").cast("string").alias("did"),
            F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("k"),
        )
        .crossJoin(F.broadcast(cnt))
        .select(
            F.col("host").alias("src_host"),
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("did"), F.lit(":"), F.col("k").cast("string"))),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.col("n_hosts"),
            ).alias("dst_idx"),
        )
    )
    raw = links.join(
        F.broadcast(idx), links.dst_idx == idx.host_idx
    ).select("src_host", F.col("host").alias("dst_host"))
    return hits_hosts(host_edges(raw), hosts, n_iter=2)


def q_registrable_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registrable-domain (eTLD+1) extraction by longest public-suffix
    match (functions/domains) over a deterministic synthetic host set
    that exercises every rule: multi-label suffixes (co.uk), private
    registries (github.io), the unknown-TLD default rule (xyzzy), and
    hosts that ARE a public suffix (NULL registrable domain)."""
    from docrawl_spark.functions.domains import registrable_domains, suffix_dim

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    host = F.when(F.col("doc_id") % 97 == 0, F.lit("github.io")).otherwise(
        F.concat(
            F.element_at(
                F.array(F.lit(""), F.lit("www."), F.lit("a.b.")),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ),
            F.col("source"),
            F.lit("."),
            F.element_at(
                F.array(
                    F.lit("com"), F.lit("co.uk"), F.lit("github.io"),
                    F.lit("com.au"), F.lit("xyzzy"),
                ),
                (F.col("doc_id") % 5 + 1).cast("int"),
            ),
        )
    )
    hosts = d.select(host.alias("host"))
    return registrable_domains(hosts, suffix_dim(spark))


def q_frontier_fairness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier fairness one-row summary: Gini coefficient (ppm,
    float-free) + top-decile share over per-host scheduled-URL counts
    (operators/fairness.host_load_gini — scalable rank, exact BIGINT
    arithmetic, CASE-guarded against overflow at frontier scale)."""
    from docrawl_spark.operators.fairness import host_load_gini

    return host_load_gini(_doc_urls(spark, sf_dir), host_col="host")


def q_media_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-byte content sniffing over a binary media column
    (datapipe/multimodal.sniff_media_type_col): deterministic synthetic
    bytes per doc (magic prefix chosen by doc_id, md5-derived body),
    sniffed JVM-side by leading-byte compare — Content-Type headers and
    URL extensions lie; the byte prefix doesn't. Aggregated per sniffed
    type; the oracle reproduces the type/length arithmetic."""
    from docrawl_spark.datapipe.multimodal import sniff_media_type_col

    d = _t(spark, sf_dir, "documents").select("doc_id")
    magic = F.element_at(
        F.array(
            F.lit(b"\x89PNG\r\n\x1a\n"),
            F.lit(b"\xff\xd8\xff"),
            F.lit(b"GIF8"),
            F.lit(b"%PDF"),
            F.lit(b"\x00"),  # no magic: sniffs as unknown (0x00 collides
            # with no table entry, keeping the md5 body from ever
            # accidentally forming a magic)
        ),
        (F.col("doc_id") % 5 + 1).cast("int"),
    )
    content = F.concat(magic, F.unhex(F.md5(F.col("doc_id").cast("string"))))
    media = d.select("doc_id", content.alias("content"))
    return (
        media.select(sniff_media_type_col("content").alias("media_type"), "content")
        .groupBy("media_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("content")).alias("total_bytes"),
        )
    )


def q_substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shared-substring detection (Lee et al. 2022-style span
    dedup primitive, datapipe/dedup.substring_dup_spans): doc pairs
    sharing a contiguous run of >= 8 tokens, found by positioned
    8-gram hash join + diagonal run-length — never a corpus self-join,
    stop-gram TF/DF caps bound the fan-out. md5hex gram hashing so the
    DuckDB oracle reproduces the join keys bit-for-bit."""
    from docrawl_spark.datapipe.dedup import substring_dup_spans

    return substring_dup_spans(
        _docs_par(spark, sf_dir), k=8, min_span_tokens=8, hash_mode="md5hex"
    )


def q_substring_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus dedup on the shared-substring relation: drop every doc
    sharing a >=8-token span with a smaller-id doc (anti-join against
    the pair table's id_b side), keep the rest."""
    from docrawl_spark.datapipe.dedup import substring_dedup_docs

    return substring_dedup_docs(
        _docs_par(spark, sf_dir), k=8, min_span_tokens=8, hash_mode="md5hex"
    ).select("doc_id", "lang", "source", "n_chars")



def q_lm_bits_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM surprisal per doc (datapipe/text.lm_bits_score): the
    CCNet-style perplexity filter trained on the corpus itself, scored
    in integer log2 bits (length(bin(x)) — identical in Spark and
    DuckDB), so the oracle matches bit-for-bit. No UDF, no window: two
    HashAggregate count dims + equi-joins + one groupBy(doc)."""
    from docrawl_spark.datapipe.text import lm_bits_score

    return lm_bits_score(_docs_par(spark, sf_dir))



def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase retrieval over positional postings
    (datapipe/search.phrase_search): broadcast query-vocab filter kills
    ~all postings before any shuffle, then one HashAggregate over
    (doc, pos - qidx) alignment anchors — an anchor witnessing every
    query slot is one occurrence. Complements BM25 (bag-of-words) with
    order-sensitive matching."""
    from docrawl_spark.datapipe.search import phrase_search

    return phrase_search(_docs_par(spark, sf_dir), "slow hash batch")



def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding token-window chunking (datapipe/packing.chunk_documents,
    32-token windows, 4-token overlap): pure per-row array ops, zero
    shuffle — the standard pre-tokenization doc splitter."""
    from docrawl_spark.datapipe.packing import chunk_documents

    return chunk_documents(_docs_par(spark, sf_dir), chunk_tokens=32, overlap=4)


def q_pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing (datapipe/packing.pack_sequences,
    256-token budget, 8 shards, md5 ordering) rolled up to per-pack
    fill stats — the shard-parallel greedy packer whose assignment is a
    pure function of (salt, doc_id); the per-shard window is the only
    shuffle and shard count is the parallelism knob."""
    from docrawl_spark.datapipe.packing import pack_manifest, pack_sequences

    packs = pack_sequences(
        _docs_par(spark, sf_dir), budget_tokens=256, n_shards=8, salt="pack1"
    )
    return pack_manifest(packs, budget_tokens=256)



def q_waterfill_budgets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-min fair (water-filling) split of a global fetch budget of
    300 URLs across hosts (operators/fairness.waterfill_budgets): every
    host gets min(demand, level) with the exact integer water level +
    deterministic remainder, computed via the distributed prefix-sum —
    no single-partition window. Feeds the politeness top-k as its
    per-host cap."""
    from docrawl_spark.operators.fairness import waterfill_budgets

    demand = _doc_urls(spark, sf_dir).groupBy("host").agg(
        F.count("*").alias("demand")
    )
    return waterfill_budgets(demand, budget=300)


def _docs_with_host_footer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with a host column and synthetic site chrome: the flat
    testdata text has no newlines, so inject one every 2 tokens (as the
    line-dedup query does) AND append a per-host footer line — every
    host gets a guaranteed 100%-share template to mine."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.col("source"), F.lit(".test")).alias("host"),
        F.concat(
            F.regexp_replace(F.trim(F.col("text")), r"(\S+ \S+) ", "$1\n"),
            F.lit("\nfooter nav "),
            F.col("source"),
        ).alias("text"),
    )


def q_host_template_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host template-line mining (datapipe.dedup.host_template_lines):
    non-empty lines present in ≥25% of a host's documents (host must
    have ≥5 docs) are site chrome. Exact ppm shares — BIGINT div on
    both engines."""
    from docrawl_spark.datapipe.dedup import host_template_lines

    return host_template_lines(
        _docs_with_host_footer(spark, sf_dir), min_docs=5, min_share_ppm=250_000
    )


def q_host_template_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strip each host's mined template lines from its documents
    (datapipe.dedup.strip_host_templates), re-assembled in original
    line order — the per-site complement of line_dedup_docs."""
    from docrawl_spark.datapipe.dedup import strip_host_templates

    return strip_host_templates(
        _docs_with_host_footer(spark, sf_dir), min_docs=5, min_share_ppm=250_000
    )


def q_host_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host predicted-language steering profile
    (datapipe.text.host_language_profile): dominant langid per source
    (most docs, lexicographic tie-break) + exact ppm share — the
    frontier-steering signal that demotes off-target-language hosts
    before budget is spent on them."""
    from docrawl_spark.datapipe.text import host_language_profile

    docs = _t(spark, sf_dir, "documents").select(
        F.col("source").alias("host"), "text", "doc_id"
    )
    return host_language_profile(docs)


def q_robots_refetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 §2.4 robots-cache scheduling
    (operators/politeness.robots_cache_schedule): the events stream
    doubles as a robots-fetch log (user→host, ts→fetched_at,
    event_type→final status); per host the latest fetch, its access
    state (ok / allow_all on 4xx / disallow_all on fresh 5xx /
    stale_unreachable past the grace window) and whether the 24 h
    cache validity has lapsed at a fixed as_of. Exact BIGINT
    microsecond ages on both engines."""
    from docrawl_spark.operators.politeness import robots_cache_schedule

    ev = _t(spark, sf_dir, "events")
    status = (
        F.when(F.col("event_type") == "error", F.lit(503))
        .when(F.col("event_type") == "purchase", F.lit(404))
        .when(F.col("event_type") == "signup", F.lit(301))
        .otherwise(F.lit(200))
    )
    log = ev.select(
        F.col("user_id").alias("host"),
        F.col("ts").alias("fetched_at"),
        status.alias("status"),
        F.col("event_id").alias("fetch_id"),
    )
    as_of = F.to_timestamp(F.lit("2024-01-31 06:00:00"))
    return robots_cache_schedule(
        log, as_of, cache_hours=24, unreachable_grace_days=14
    )


def _synthetic_host_graph(spark: SparkSession, sf_dir: str):
    """The deterministic host graph shared by the link-analysis queries
    (same derivation as q_host_pagerank / q_host_hits: 3 md5-hashed
    out-links per doc onto the range-partitioned host index, self-loops
    dropped by host_edges). Returns (edges, hosts)."""
    from docrawl_spark.datapipe.graph import host_edges
    from docrawl_spark.operators.ranking import with_global_rank

    urls = _doc_urls(spark, sf_dir)
    hosts = urls.select("host").distinct()
    idx = with_global_rank(hosts, ["host"], rank_col="host_idx")
    cnt = hosts.agg(F.count("*").alias("n_hosts"))
    links = (
        urls.select(
            "host",
            F.col("doc_id").cast("string").alias("did"),
            F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("k"),
        )
        .crossJoin(F.broadcast(cnt))
        .select(
            F.col("host").alias("src_host"),
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("did"), F.lit(":"), F.col("k").cast("string"))),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.col("n_hosts"),
            ).alias("dst_idx"),
        )
    )
    raw = links.join(
        F.broadcast(idx), links.dst_idx == idx.host_idx
    ).select("src_host", F.col("host").alias("dst_host"))
    return host_edges(raw), hosts


def q_host_opic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch OPIC (datapipe/graph.opic_hosts, Abiteboul et al. WWW'03)
    over the same deterministic host graph as q_host_pagerank — the
    greedy cash-distribution crawl-ordering signal, 3 synchronous
    rounds, exact BIGINT fixed-point with uniform dangling
    redistribution; bit-exact vs a DuckDB oracle unrolling the same
    rounds."""
    from docrawl_spark.datapipe.graph import opic_hosts

    edges, hosts = _synthetic_host_graph(spark, sf_dir)
    return opic_hosts(edges, hosts, n_iter=3)


def q_host_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-reciprocity per host (datapipe/graph.host_reciprocity): the
    share of outbound weight over reciprocated edges — the
    link-farm/nepotistic-link signal, exact ppm."""
    from docrawl_spark.datapipe.graph import host_reciprocity

    edges, _hosts = _synthetic_host_graph(spark, sf_dir)
    return host_reciprocity(edges)


def q_feed_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSS/Atom feed ingestion (operators/feeds.feed_entries): each host
    publishes a syndication feed of its doc URLs — RSS 2.0 or Atom by
    md5(host) parity, so BOTH from_xml branches (element text vs href
    attribute) are exercised. The oracle builds identical XML and
    extracts with regexes — the XML parser + format-normalizing
    coalesce is what's cross-checked."""
    from docrawl_spark.operators.feeds import feed_entries

    u = _doc_urls(spark, sf_dir)
    did = F.col("doc_id").cast("string")
    day = (F.col("doc_id") % 28 + 1).cast("string")
    rss_item = F.concat(
        F.lit("<item><link>"), F.col("url"),
        F.lit("</link><title>Doc "), did,
        F.lit("</title><pubDate>"), day,
        F.lit(" Jan 2026 00:00:00 GMT</pubDate><guid>g"), did,
        F.lit("</guid></item>"),
    )
    atom_entry = F.concat(
        F.lit('<entry><link href="'), F.col("url"),
        F.lit('"/><title>Doc '), did,
        F.lit("</title><updated>2026-01-"), day,
        F.lit("T00:00:00Z</updated><id>i"), did,
        F.lit("</id></entry>"),
    )
    is_atom = (
        F.conv(F.substring(F.md5(F.col("host")), 1, 1), 16, 10).cast("long") % 2
        == 1
    )
    entry = F.when(is_atom, atom_entry).otherwise(rss_item)
    feeds = (
        u.select("host", "doc_id", entry.alias("entry"), is_atom.alias("_atom"))
        .groupBy("host", "_atom")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "entry"))),
                    lambda s: s.getField("entry"),
                ),
                "",
            ).alias("_body")
        )
        .select(
            "host",
            F.when(
                F.col("_atom"),
                F.concat(F.lit("<feed>"), F.col("_body"), F.lit("</feed>")),
            )
            .otherwise(
                F.concat(
                    F.lit('<rss version="2.0"><channel>'),
                    F.col("_body"),
                    F.lit("</channel></rss>"),
                )
            )
            .alias("feed_xml"),
        )
    )
    return feed_entries(feeds, keep_cols=["host"])


def q_robots_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robots META directives + rel=canonical
    (operators/meta_directives): per-doc synthetic <head> exercising
    every parse branch — quoted/unquoted/uppercase attrs, the
    none≡noindex+nofollow alias, multi-tag union, decoy non-robots
    meta tags, canonical with either attribute order. Two-stage
    lookahead-free regexes run identically on Java regex and RE2."""
    from docrawl_spark.operators.meta_directives import (
        rel_canonical_col,
        robots_meta_directives,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % 7
    robots_part = (
        F.when(m == 0, F.lit('<meta name="robots" content="noindex">'))
        .when(m == 1, F.lit("<meta NAME='robots' CONTENT='nofollow, noarchive'>"))
        .when(m == 2, F.lit('<meta name=robots content="none">'))
        .when(
            m == 3,
            F.lit(
                '<meta name="robots" content="noindex">'
                '<meta name="robots" content="nofollow">'
            ),
        )
        .otherwise(F.lit('<meta name="viewport" content="width=1">'))
    )
    canon_url = F.concat(
        F.lit("https://canon.test/"), F.expr("doc_id div 4").cast("string")
    )
    canon_part = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit('<link href="'), canon_url, F.lit('" rel="canonical">')),
        )
        .when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit('<link rel="canonical" href="'), canon_url, F.lit('">')),
        )
        .otherwise(F.lit(""))
    )
    pages = d.select(
        "doc_id",
        F.concat(
            F.lit("<html><head>"), robots_part, canon_part,
            F.lit("</head><body>x</body></html>"),
        ).alias("html"),
    )
    flags = robots_meta_directives(pages)
    return flags.join(
        pages.select("doc_id", rel_canonical_col(F.col("html")).alias("canonical_url")),
        "doc_id",
    )


def q_http_cache_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9111 freshness planning (operators/revalidate.http_cache_plan):
    synthetic per-URL caching metadata exercising every lifetime branch
    — explicit max-age, no-store/no-cache zeroing (even when a max-age
    is also present), s-maxage NOT matching the max-age pattern, the
    heuristic Last-Modified/10 lifetime, and the no-basis default —
    classified into fresh / revalidate / refetch at a fixed as_of.
    Exact BIGINT microsecond arithmetic on both engines."""
    from docrawl_spark.operators.revalidate import http_cache_plan

    u = _doc_urls(spark, sf_dir)
    fetched = F.expr(
        "timestampadd(DAY, cast(doc_id % 40 as int),"
        " timestamp'2024-01-01 00:00:00')"
    )
    cc = (
        F.when(F.col("doc_id") % 6 == 0, F.lit("max-age=86400"))
        .when(F.col("doc_id") % 6 == 1, F.lit("no-cache, max-age=99999"))
        .when(F.col("doc_id") % 6 == 2, F.lit("s-maxage=31536000"))
        .when(F.col("doc_id") % 6 == 3, F.lit("public, max-age=6048000"))
        .when(F.col("doc_id") % 6 == 5, F.lit("no-store"))
        .otherwise(F.lit(None).cast("string"))
    )
    lm = F.when(
        F.col("doc_id") % 2 == 0,
        F.expr(
            "timestampadd(DAY, -cast(doc_id % 100 + 1 as int),"
            " timestampadd(DAY, cast(doc_id % 40 as int),"
            " timestamp'2024-01-01 00:00:00'))"
        ),
    )
    log = u.select(
        "url",
        fetched.alias("fetched_at"),
        cc.alias("cache_control"),
        lm.alias("last_modified"),
        (F.col("doc_id") % 3 == 0).alias("has_validator"),
    )
    as_of = F.to_timestamp(F.lit("2024-02-15 00:00:00"))
    return http_cache_plan(log, as_of)


def q_charset_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-encoding sniff (datapipe/multimodal.charset_sniff_col,
    WHATWG precedence): synthetic (bytes, Content-Type, html) triples
    exercising every branch — UTF-8/UTF-16LE BOMs overriding a header,
    quoted header charset params, <meta charset=…>, http-equiv
    content params, and the no-signal NULL. The Spark side sniffs real
    binary prefixes; the oracle mirrors the header/meta regexes and
    expectation-tables only the BOM branch (binary compare has no
    cross-engine twin)."""
    from docrawl_spark.datapipe.multimodal import charset_sniff_col

    d = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % 6
    body = (
        F.when(m == 0, F.lit(b"\xef\xbb\xbfhello"))
        .when(m == 4, F.lit(b"\xff\xfehello"))
        .otherwise(F.lit(b"hello"))
    )
    ct = (
        F.when(m == 0, F.lit("text/html; charset=latin-1"))
        .when(m == 1, F.lit('text/html; charset="ISO-8859-1"'))
        .when(m == 3, F.lit("text/html"))
        .otherwise(F.lit(None).cast("string"))
    )
    html = (
        F.when(m == 2, F.lit("<html><head><meta charset=windows-1251></head>"))
        .when(
            m == 3,
            F.lit(
                '<html><head><meta http-equiv="Content-Type"'
                ' content="text/html; charset=EUC-JP"></head>'
            ),
        )
        .otherwise(F.lit("<p>x</p>"))
    )
    return d.select(
        "doc_id",
        charset_sniff_col(body, ct, html).alias("charset"),
    )


def q_circuit_breaker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host fetch circuit breaker
    (operators/politeness.failure_circuit_breaker): the events stream
    as a fetch log ('error' events are 5xx), per host the consecutive
    failures since the last success in (ts, id) order, tripping open at
    2 and decaying to half_open after 300 h of silence at a fixed
    as_of. Exact BIGINT microsecond ages, no window."""
    from docrawl_spark.operators.politeness import failure_circuit_breaker

    ev = _t(spark, sf_dir, "events")
    log = ev.select(
        F.col("user_id").alias("host"),
        F.col("ts").alias("fetched_at"),
        F.when(F.col("event_type") == "error", F.lit(503))
        .otherwise(F.lit(200))
        .alias("status"),
        F.col("event_id").alias("fetch_id"),
    )
    as_of = F.to_timestamp(F.lit("2024-02-10 00:00:00"))
    return failure_circuit_breaker(
        log, as_of, trip_threshold=2, cooldown_hours=300
    )


def _docs_as_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic HTML pages over the doc universe for the boilerplate
    family: link-dense nav, short heading, the doc's text as body
    prose, link+copyright footer — every classifier label reachable."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit(
                '<div class="nav"><ul><li><a href="/">Home</a></li>'
                '<li><a href="/about">About us</a></li>'
                '<li><a href="/contact">Contact page</a></li></ul></div>'
                "<h1>Doc "
            ),
            F.col("doc_id").cast("string"),
            F.lit("</h1><p>"),
            F.col("text"),
            F.lit(
                '</p><div class="footer"><a href="/terms">Terms</a>'
                " (c) example site</div>"
            ),
        ).alias("html"),
    )


def q_content_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JusText-style block classification
    (datapipe/boilerplate.classify_blocks): pages segmented on
    block-tag boundaries; per block the link/stopword ppm densities and
    the bad/short/good/near_good label — exact integer densities on
    both engines."""
    from docrawl_spark.datapipe.boilerplate import classify_blocks

    return classify_blocks(_docs_as_pages(spark, sf_dir))


def q_main_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Main-content extraction (datapipe/boilerplate.extract_main_text):
    keep good/near_good blocks, re-assembled in original block order —
    nav and footer chrome gone, body prose kept."""
    from docrawl_spark.datapipe.boilerplate import extract_main_text

    return extract_main_text(_docs_as_pages(spark, sf_dir))


def q_path_prefix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host site-section histogram
    (operators/links.path_prefix_profile): synthetic section paths
    (/doc /tag /cat /media by doc_id mod), counted per (host, leading
    segment) with exact ppm shares — the section-budget / trap-surface
    planner view."""
    from docrawl_spark.operators.links import path_prefix_profile

    sect = F.element_at(
        F.array(F.lit("doc"), F.lit("tag"), F.lit("cat"), F.lit("media")),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    urls = _t(spark, sf_dir, "documents").select(
        F.concat(F.col("source"), F.lit(".test")).alias("host"),
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".test/"), sect,
            F.lit("/"), F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    return path_prefix_profile(urls, depth=1)


def q_lang_metadata_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-quality audit: per source, how often the PREDICTED
    language (datapipe/text.langid_col) agrees with the stored lang
    metadata column — exact ppm agreement; the sanity gate before
    trusting either signal for mixing."""
    from docrawl_spark.datapipe.text import langid_col

    d = _t(spark, sf_dir, "documents").select(
        "source", "lang", langid_col(F.col("text")).alias("pred")
    )
    return d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum((F.col("pred") == F.col("lang")).cast("long"))
        .cast("long")
        .alias("n_match"),
    ).select(
        "source",
        "n_docs",
        "n_match",
        F.expr("n_match * 1000000L div n_docs").alias("match_ppm"),
    )


def q_hreflang_alternates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hreflang alternate extraction
    (operators/meta_directives.hreflang_alternates): synthetic heads
    with a stylesheet decoy, attribute-order/case variation, an
    x-default on every third doc, and a rel=canonical that must NOT
    match the alternate filter."""
    from docrawl_spark.operators.meta_directives import hreflang_alternates

    did = F.col("doc_id").cast("string")
    pages = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit('<head><link rel="stylesheet" href="/s.css">'
                  '<link rel="alternate" hreflang="en" href="https://h/en/'),
            did,
            F.lit('"><link hreflang="DE-de" rel=alternate href="https://h/de/'),
            did,
            F.lit('">'),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit('<link rel="alternate" hreflang="x-default" href="https://h/'),
                    did,
                    F.lit('">'),
                ),
            ).otherwise(F.lit("")),
            F.lit('<link rel="canonical" href="https://h/c"></head>'),
        ).alias("html"),
    )
    return hreflang_alternates(pages)


def q_html_unescape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass HTML entity decoding (datapipe/text.html_unescape_col):
    per-doc synthetic text exercising the named core set, decimal and
    hex numeric refs (ASCII only), the &amp;lt; no-double-decode rule,
    out-of-range refs, and non-entities."""
    from docrawl_spark.datapipe.text import html_unescape_col

    m = F.col("doc_id") % 7
    t = (
        F.when(m == 0, F.lit("a &amp; b &lt;c&gt;"))
        .when(m == 1, F.lit("it&#39;s &quot;here&quot;"))
        .when(m == 2, F.lit("hex it&#x27;s fine"))
        .when(m == 3, F.lit("&amp;lt; decodes ONCE"))
        .when(m == 4, F.lit("&#8212; and &#x2014; pass through"))
        .when(m == 5, F.lit("&unknown; tail& plain"))
        .otherwise(F.lit("no entities at all"))
    )
    return _t(spark, sf_dir, "documents").select(
        "doc_id", t.alias("text"), html_unescape_col(t).alias("unescaped")
    )


def q_retry_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retry-After parsing (operators/politeness.retry_after_us_col,
    RFC 9110 §10.2.3): delay-seconds and IMF-fixdate forms (the date
    round-trips through Spark's formatter+parser; the oracle computes
    the expected instant directly — the parser is the DUT), garbage
    and NULL → NULL."""
    from docrawl_spark.operators.politeness import retry_after_us_col

    ev = _t(spark, sf_dir, "events")
    m = F.col("event_id") % 4
    header = (
        F.when(m == 0, (F.col("event_id") % 300 + 30).cast("string"))
        .when(
            m == 1,
            F.concat(
                F.date_format("ts", "EEE, dd MMM yyyy HH:mm:ss"), F.lit(" GMT")
            ),
        )
        .when(m == 2, F.lit("soon"))
        .otherwise(F.lit(None).cast("string"))
    )
    rx = F.to_timestamp(F.lit("2024-02-01 00:00:00"))
    return ev.select(
        "event_id",
        header.alias("header"),
        retry_after_us_col(header, rx).alias("retry_at_us"),
    )


def q_percent_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 3986 §6.2.2 percent-encoding normalization
    (functions/canon.percent_normalize_col): synthetic URLs carrying
    unreserved escapes (%2e → '.', %7e → '~'), reserved escapes in
    both hex cases (%2f → %2F), malformed escapes (%zz) and a bare
    trailing '%' — all normalized to one frontier key form."""
    from docrawl_spark.functions.canon import percent_normalize_col

    m = F.col("doc_id") % 6
    suffix = (
        F.when(m == 0, F.lit("%2epath"))
        .when(m == 1, F.lit("%2fquery"))
        .when(m == 2, F.lit("%7Euser"))
        .when(m == 3, F.lit("%zzbad"))
        .when(m == 4, F.lit("%"))
        .otherwise(F.lit("plain"))
    )
    u = _doc_urls(spark, sf_dir).select(
        "doc_id", F.concat(F.col("url"), F.lit("/"), suffix).alias("url")
    )
    return u.select(
        "doc_id", "url", percent_normalize_col(F.col("url")).alias("normalized")
    )


def q_corpus_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture report (datapipe/sampling.corpus_mix_report):
    docs + whitespace tokens per source × lang with exact ppm shares of
    the corpus totals — the observed mixture the temperature ops
    reshape. One HashAggregate + a broadcast totals row."""
    from docrawl_spark.datapipe.sampling import corpus_mix_report

    return corpus_mix_report(_t(spark, sf_dir, "documents"))


def q_robots_agent_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 §2.2.1 user-agent group selection
    (operators/politeness.select_agent_rules): multi-group robots blobs
    — a googlebot group, (on even-md5 hosts) a two-UA docrawl group,
    and the * fallback — resolved for product token 'docrawl-spark':
    'docrawl' prefix-matches at specificity 7, beating *; odd hosts
    fall back to the * group. Group ids from a bounded per-blob
    lag/running-sum window pair."""
    from docrawl_spark.operators.politeness import select_agent_rules

    return select_agent_rules(
        _robots_multi_group_dim(spark, sf_dir), agent="docrawl-spark"
    )


def _robots_multi_group_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host dim with the shared multi-group robots blob: a googlebot
    group, (even-md5 hosts) a two-UA docrawl group, the * fallback."""
    hosts = _doc_urls(spark, sf_dir).select("host").distinct()
    is_even = (
        F.conv(F.substring(F.md5(F.col("host")), 1, 1), 16, 10).cast("long") % 2
        == 0
    )
    blob = F.concat(
        F.lit("User-agent: googlebot\nDisallow: /g1\n"),
        F.when(
            is_even,
            F.concat(
                F.lit(
                    "User-agent: docrawl\nUser-agent: docrawl-img\n"
                    "Allow: /public\nDisallow: /private/"
                ),
                F.col("host"),
                F.lit("\n"),
            ),
        ).otherwise(F.lit("")),
        F.lit("User-agent: *\nDisallow: /fallback"),
    )
    return hosts.select("host", blob.alias("robots_blob"))


def q_robots_full_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END Robots Exclusion Protocol evaluation: §2.2.1 group
    selection (select_agent_rules) → rule compilation
    (robots_compile_col) → §2.2.2 longest-match verdict
    (robots_allowed_rfc_col), over the shared multi-group blobs and
    four synthetic path families per host. Even-md5 hosts obey their
    docrawl group (/public allowed, /private/<host> blocked); odd
    hosts fall back to * (/fallback blocked)."""
    from docrawl_spark.operators.politeness import (
        robots_allowed_rfc_col,
        robots_compile_col,
        select_agent_rules,
    )

    dim = _robots_multi_group_dim(spark, sf_dir)
    rules = select_agent_rules(dim, agent="docrawl-spark")
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
        .select("host", robots_compile_col(F.col("_rules")).alias("_compiled"))
    )
    path = (
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit("/public/p"), F.col("doc_id").cast("string")))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.lit("/private/"), F.col("host"), F.lit("/q")))
        .when(F.col("doc_id") % 4 == 2, F.concat(F.lit("/fallback/r"), F.col("doc_id").cast("string")))
        .otherwise(F.concat(F.lit("/misc/s"), F.col("doc_id").cast("string")))
    )
    urls = _doc_urls(spark, sf_dir).select(
        "doc_id",
        "host",
        F.concat(F.lit("https://"), F.col("host"), path).alias("url"),
    )
    return urls.join(compiled, "host").select(
        "doc_id",
        "host",
        robots_allowed_rfc_col(F.col("url"), F.col("_compiled")).alias("allowed"),
    )


def q_snapshot_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot change magnitude
    (operators/recrawl.snapshot_change_magnitude): two synthetic
    versions per URL — v1 appends an update suffix for most docs and
    fully REVERSES the token order for every 10th (word-order reversal
    destroys nearly all k=3 shingles, the 'rewritten page' case) —
    scored as exact shingle-Jaccard change ppm. The refresh-value
    signal the Poisson change rate can't express."""
    from docrawl_spark.operators.recrawl import snapshot_change_magnitude

    u = _doc_urls(spark, sf_dir).join(
        _t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )
    v0 = u.select("url", F.lit(0).alias("version"), F.trim("text").alias("text"))
    v1 = u.select(
        "url",
        F.lit(1).alias("version"),
        F.when(
            F.col("doc_id") % 10 == 0,
            F.array_join(F.reverse(F.split(F.trim("text"), r"\s+")), " "),
        )
        .otherwise(
            F.concat(
                F.trim("text"),
                F.lit(" updated content section "),
                F.col("doc_id").cast("string"),
            )
        )
        .alias("text"),
    )
    return snapshot_change_magnitude(v0.unionByName(v1), k=3)


def q_host_trustrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrustRank (datapipe/graph.trustrank_hosts, Gyöngyi et al. VLDB'04)
    over the shared synthetic host graph: teleport restricted to a
    deterministic md5-parity seed quarter, 3 iterations, exact BIGINT
    fixed-point — the anti-spam complement of host_pagerank, bit-exact
    vs a DuckDB oracle unrolling the same rounds."""
    from docrawl_spark.datapipe.graph import trustrank_hosts

    edges, hosts = _synthetic_host_graph(spark, sf_dir)
    seeds = hosts.where(
        F.conv(F.substring(F.md5(F.col("host")), 1, 1), 16, 10).cast("long") % 4
        == 0
    )
    return trustrank_hosts(edges, hosts, seeds, n_iter=3)


def q_canonical_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rel=canonical URL clustering — the site-asserted dedup signal
    consumed: each doc's effective canonical key is its declared
    canonical (same synthetic <head> as q_robots_meta) or its own URL;
    clusters roll up member count, declared-count, and the min-doc_id
    representative. At scale this replaces a content-similarity join
    for every page that self-declares."""
    from docrawl_spark.operators.meta_directives import rel_canonical_col

    u = _doc_urls(spark, sf_dir).select("doc_id", "url")
    canon_url = F.concat(
        F.lit("https://canon.test/"), F.expr("doc_id div 4").cast("string")
    )
    canon_part = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit('<link href="'), canon_url, F.lit('" rel="canonical">')),
        )
        .when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit('<link rel="canonical" href="'), canon_url, F.lit('">')),
        )
        .otherwise(F.lit(""))
    )
    pages = u.select(
        "doc_id",
        "url",
        F.concat(F.lit("<html><head>"), canon_part, F.lit("</head></html>")).alias(
            "html"
        ),
    )
    eff = pages.select(
        "doc_id",
        rel_canonical_col(F.col("html")).alias("_canon"),
        "url",
    ).select(
        "doc_id",
        F.coalesce(F.col("_canon"), F.col("url")).alias("cluster_url"),
        F.col("_canon").isNotNull().alias("_declared"),
    )
    return eff.groupBy("cluster_url").agg(
        F.count("*").cast("long").alias("n_members"),
        F.sum(F.col("_declared").cast("long")).cast("long").alias("n_declared"),
        F.min("doc_id").alias("rep_doc"),
    )


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation lexicon by integer-bits PMI
    (datapipe/text.pmi_collocations): corpus bigram pairs with ≥3 joint
    occurrences, association scored factorized in bit lengths
    (overflow-proof at web-scale counts) — same bigram instances as
    lm_bits_score, per-pair instead of per-doc."""
    from docrawl_spark.datapipe.text import pmi_collocations

    return pmi_collocations(_t(spark, sf_dir, "documents"), min_count=3)



# --------------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------------


def q_url_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-template mining (operators/links.url_template_profile):
    synthetic per-doc paths exercising all four template shapes —
    plain ids, nested tag/page params, 16-hex-char digest segments
    ({h} generalization), and year/month archives — aggregated per
    (host, template) with exact BIGINT page counts and n_chars yield.
    The scheduler's page-factory-vs-parameter-trap view."""
    from docrawl_spark.operators.links import url_template_profile

    d = _t(spark, sf_dir, "documents")
    path = F.element_at(
        F.array(
            F.concat(F.lit("/doc/"), F.col("doc_id").cast("string")),
            F.concat(
                F.lit("/tag/"), (F.col("doc_id") % 50).cast("string"),
                F.lit("/page/"), (F.col("doc_id") % 7).cast("string"),
            ),
            F.concat(
                F.lit("/a/"),
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 16),
            ),
            F.concat(
                F.lit("/archive/"),
                (F.lit(2000) + F.col("doc_id") % 25).cast("string"),
                F.lit("/"), (F.col("doc_id") % 12 + 1).cast("string"),
            ),
        ),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    urls = d.select(
        F.concat(F.col("source"), F.lit(".test")).alias("host"),
        path.alias("path"),
        "n_chars",
    )
    return url_template_profile(urls, yield_col="n_chars")


def q_c4_line_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-cleaning audit (datapipe/text.c4_line_stats):
    docs re-lined into 6-word lines, terminal punctuation added by a
    content rule ([a-m] line endings), plus injected kill/drop signals
    (a javascript line every 13th doc, lorem ipsum every 17th, a curly
    brace every 23rd) — per-doc retained-line counts, exact ppm
    retention, and the C4 page-keep verdict."""
    from docrawl_spark.datapipe.text import c4_line_stats

    d = _t(spark, sf_dir, "documents")
    t1 = F.regexp_replace(F.col("text"), r"((\S+ ){5}\S+) ", "$1\n")
    t2 = F.regexp_replace(t1, r"([a-m])(\n|$)", "$1.$2")
    txt = F.concat(
        t2,
        F.when(
            F.col("doc_id") % 13 == 0,
            F.lit("\nenable javascript to view this page."),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 17 == 0,
            F.lit("\nlorem ipsum dolor sit amet today."),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 23 == 0, F.lit("\nconfig { value }")
        ).otherwise(F.lit("")),
    )
    return c4_line_stats(d.select("doc_id", txt.alias("text")))


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance scores (datapipe/sampling.dsir_bits): target =
    the lang='en' subset, background = the whole corpus; per doc the
    exact integer-bits log-ratio of hashed-unigram likelihoods — the
    resampling weight that upsamples target-looking raw docs."""
    from docrawl_spark.datapipe.sampling import dsir_bits

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", (F.col("lang") == "en").alias("is_en")
    )
    return dsir_bits(d, target_col="is_en")


def q_outlink_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlink-diversity spam signal (operators/links.outlink_diversity):
    synthetic per-doc outlinks whose targets span subdomain collapse
    (a.b.example.com + example.com -> one eTLD+1), multi-label
    suffixes (co.uk), a private registry (github.io, where each cdnN
    IS its own registrable domain), self-links, and an .org spread —
    per source host the exact BIGINT host/domain fan-out and self/
    diversity ppm."""
    from docrawl_spark.functions.domains import suffix_dim
    from docrawl_spark.operators.links import outlink_diversity

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("doc_id").cast("string").alias("did"),
        F.concat(F.col("source"), F.lit(".test")).alias("src_host"),
    )
    e0 = d.select(
        "doc_id", "did", "src_host",
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("k"),
    )
    pick = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("did"), F.lit(":"), F.col("k").cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("long")
        % 6
    ).cast("int")
    dst = F.element_at(
        F.array(
            F.lit("a.b.example.com"),
            F.lit("example.com"),
            F.lit("w.example.co.uk"),
            F.col("src_host"),
            F.concat(F.lit("cdn"), (F.col("doc_id") % 5).cast("string"), F.lit(".github.io")),
            F.concat(F.lit("news"), (F.col("doc_id") % 7).cast("string"), F.lit(".org")),
        ),
        pick + 1,
    )
    edges = e0.select("src_host", dst.alias("dst_host"))
    return outlink_diversity(edges, suffix_dim(spark))


def q_fetch_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous fetch-shard assignment (operators/sharding): every
    source host pinned to a fetcher shard at fleet sizes 16 and 17 —
    the resize plan showing exactly which hosts drain and that each
    moves to the NEW shard (the HRW minimal-movement property)."""
    from docrawl_spark.operators.sharding import rendezvous_rebalance_plan

    hosts = _t(spark, sf_dir, "documents").select(
        F.concat(F.col("source"), F.lit(".test")).alias("host")
    )
    return rendezvous_rebalance_plan(hosts, 16, 17)


def q_clean_param_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clean-param directive end-to-end (operators/politeness.
    clean_param_rules + apply_clean_params): hosts carry synthesized
    robots blobs with prefix-scoped / site-wide / non-matching-prefix
    Clean-param lines (plus a no-directive group); URLs carry five
    query shapes incl. a bare flag token and no-query — the site-
    declared param strip for frontier dedup."""
    from docrawl_spark.operators.politeness import (
        apply_clean_params,
        clean_param_rules,
    )

    u = _doc_urls(spark, sf_dir)
    g = F.pmod(F.regexp_extract(F.col("host"), r"(\d+)", 1).cast("int"), F.lit(4))
    blob = (
        F.when(
            g == 0,
            F.lit("User-agent: *\nClean-param: sid&ref /doc\nclean-param: page"),
        )
        .when(g == 1, F.lit("Clean-Param: utm_source /d"))
        .when(g == 2, F.lit("Disallow: /x"))
        .otherwise(F.lit("clean-param: sid /other"))
    )
    robots = u.select("host").distinct().withColumn("robots_blob", blob)
    qsfx = (
        F.when(F.col("doc_id") % 5 == 0, F.lit("?sid=1&page=2&keep=3"))
        .when(F.col("doc_id") % 5 == 1, F.lit("?utm_source=news&id=7"))
        .when(F.col("doc_id") % 5 == 2, F.lit(""))
        .when(F.col("doc_id") % 5 == 3, F.lit("?page=5"))
        .otherwise(F.lit("?flag&sid=9"))
    )
    urls = u.select(
        "doc_id", F.concat(F.col("url"), qsfx).alias("url"), "host", "path"
    )
    return apply_clean_params(urls, clean_param_rules(robots)).select(
        "doc_id", "url", "clean_url", "n_params_dropped"
    )


def q_structured_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OpenGraph + JSON-LD extraction (operators/meta_directives.
    og_properties/jsonld_blocks) over synthesized pages: double/single
    quoting, reversed attr order, repeated og:image, decoy scripts and
    charset metas, a typeless JSON-LD block, and a no-structured-data
    group. One unioned row per declaration: (doc_id, kind, ord, key,
    value)."""
    from docrawl_spark.operators.meta_directives import (
        jsonld_blocks,
        og_properties,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")
    s = F.col("doc_id").cast("string")
    g = F.col("doc_id") % 4
    html = F.concat(
        F.lit('<head><meta charset="utf-8">'),
        F.when(
            g == 0,
            F.concat(
                F.lit('<meta property="og:title" content="Doc '),
                s,
                F.lit(
                    '"><meta property="og:image" content="https://h/i1.png">'
                    '<meta property="og:image" content="https://h/i2.png">'
                    '<script type="application/ld+json">{"@context":'
                    '"https://schema.org","@type":"Article","headline":"Doc '
                ),
                s,
                F.lit('"}</script>'),
            ),
        )
        .when(
            g == 1,
            F.concat(
                F.lit("<meta content='X"),
                s,
                F.lit(
                    "' property='og:type'><script src=\"/app.js\"></script>"
                    "<script type='application/ld+json'>"
                    '{"@graph":[{"@type":"Person"}]}</script>'
                ),
            ),
        )
        .when(
            g == 2,
            F.lit('<meta name="robots" content="noindex"><script>var x=1;</script>'),
        )
        .otherwise(
            F.concat(
                F.lit('<meta property="og:url" content="https://h/'),
                s,
                F.lit(
                    '"><script type="application/ld+json">'
                    '{"name":"no type"}</script>'
                ),
            )
        ),
        F.lit("</head>"),
    )
    pages = d.select("doc_id", html.alias("html"))
    og = og_properties(pages).select(
        "doc_id",
        F.lit("og").alias("kind"),
        F.col("og_order").alias("ord"),
        F.col("property").alias("key"),
        F.col("content").alias("value"),
    )
    ld = jsonld_blocks(pages).select(
        "doc_id",
        F.lit("jsonld").alias("kind"),
        F.col("script_order").alias("ord"),
        F.col("jsonld_type").alias("key"),
        F.col("body_chars").cast("string").alias("value"),
    )
    return og.unionByName(ld)


def q_postings_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index storage stats (datapipe/search.postings_stats):
    per corpus token, exact delta-gap varint byte cost of its posting
    list (1-based, first posting absolute), df and doc-range — the
    shard-budget planner for the BM25/phrase indexes."""
    from docrawl_spark.datapipe.search import postings_stats

    return postings_stats(_t(spark, sf_dir, "documents"))


def _cocite_fixture_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared link-fixture derivation for the co-citation family:
    pages pick 3 targets from a 40-target pool (md5-deterministic),
    plus one mega-hub source (doc 0, 70 targets) that the outdegree
    cap must drop. Mirrored verbatim in the DuckDB oracles."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".test/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("src"),
    )
    e0 = d.select(
        "doc_id",
        "src",
        F.explode(
            F.sequence(
                F.lit(0),
                F.when(F.col("doc_id") == 0, F.lit(69)).otherwise(F.lit(2)),
            )
        ).alias("k"),
    )
    pick = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("k").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 40
    ).cast("string")
    dst = F.when(
        F.col("doc_id") == 0,
        F.concat(F.lit("hub"), F.col("k").cast("string"), F.lit(".test")),
    ).otherwise(F.concat(F.lit("t"), pick, F.lit(".test")))
    return e0.select(F.col("src").alias("src_host"), dst.alias("dst_host"))


def q_cocitation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-citation pairs (datapipe/graph.cocitation_pairs) over the
    shared link fixture: unordered target pairs cited together by
    >= 2 sources, after the mega-hub outdegree cap."""
    from docrawl_spark.datapipe.graph import cocitation_pairs

    return cocitation_pairs(_cocite_fixture_edges(spark, sf_dir))


def q_adamic_adar_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar related-host scores (datapipe/graph.
    adamic_adar_pairs) over the shared link fixture: co-citation where
    each common source counts 1/log2(outdegree) (integer-exact via the
    cross-engine bit-length idiom) — focused pages outvote hubs. Same
    mega-hub cap and bounded pair fan-out as cocitation_pairs."""
    from docrawl_spark.datapipe.graph import adamic_adar_pairs

    return adamic_adar_pairs(_cocite_fixture_edges(spark, sf_dir))


def q_wand_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAND/MaxScore term upper bounds (datapipe/search.
    term_upper_bounds): per corpus term, the exact max single-posting
    BM25 contribution in integer fixed-point — the query-time pruning
    companion of bm25_search and postings_gaps."""
    from docrawl_spark.datapipe.search import term_upper_bounds

    return term_upper_bounds(_t(spark, sf_dir, "documents"))


def q_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota caps (datapipe/sampling.domain_quota_sample):
    docs spread over collapsing subdomains (b*.blog.example.com), a
    private-registry family (*.github.io — each its own registrable
    domain), and plain hosts; keep the 5 best per eTLD+1 by an
    md5-deterministic integer quality."""
    from docrawl_spark.datapipe.sampling import domain_quota_sample
    from docrawl_spark.functions.domains import suffix_dim

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    g = F.col("doc_id") % 3
    host = (
        F.when(
            g == 0,
            F.concat(
                F.lit("b"), (F.col("doc_id") % 4).cast("string"),
                F.lit(".blog.example.com"),
            ),
        )
        .when(g == 1, F.concat(F.col("source"), F.lit(".github.io")))
        .otherwise(F.concat(F.col("source"), F.lit(".test")))
    )
    quality = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
        ).cast("long")
        % 1000
    )
    docs = d.select("doc_id", host.alias("host"), quality.alias("quality"))
    return domain_quota_sample(docs, suffix_dim(spark), k=5)


def q_surt_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURT canonical sort keys (functions/canon.surt_col): scheme
    dropped, www-fold, host labels reversed — urls spanning www
    prefixes, multi-label co.uk subdomains, bare-host (path → '/'),
    and fragments (dropped)."""
    from docrawl_spark.functions.canon import surt_col

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    s = F.col("doc_id").cast("string")
    g = F.col("doc_id") % 4
    url = (
        F.when(
            g == 0,
            F.concat(F.lit("https://www."), F.col("source"), F.lit(".test/doc/"), s, F.lit("?q=1")),
        )
        .when(
            g == 1,
            F.concat(F.lit("https://a.b."), F.col("source"), F.lit(".co.uk/doc/"), s),
        )
        .when(g == 2, F.concat(F.lit("https://"), F.col("source"), F.lit(".test")))
        .otherwise(
            F.concat(F.lit("http://"), F.col("source"), F.lit(".test/doc/"), s, F.lit("#frag"))
        )
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select("doc_id", "url", surt_col("url").alias("surt"))


def q_link_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 8288 Link-header relations (operators/fetch.
    link_header_relations): synthesized fetch-log headers carry
    quoted next/prev pagination pairs, an unquoted case-variant
    rel=canonical with a trailing type param, and a no-link group."""
    from docrawl_spark.operators.fetch import link_header_relations

    d = _doc_urls(spark, sf_dir)
    s = F.col("doc_id").cast("string")
    g = F.col("doc_id") % 3
    nxt = (F.col("doc_id") + 1).cast("string")
    prv = (F.col("doc_id") - 1).cast("string")
    linkval = (
        F.when(
            g == 0,
            F.concat(
                F.lit("<https://"), F.col("host"), F.lit("/doc/"), nxt,
                F.lit('>; rel="next", <https://'), F.col("host"),
                F.lit("/doc/"), prv, F.lit('>; rel="prev"'),
            ),
        )
        .when(
            g == 1,
            F.concat(
                F.lit("<https://"), F.col("host"),
                F.lit('/c>; REL=canonical; type="text/html"'),
            ),
        )
        .otherwise(F.lit(None).cast("string"))
    )
    headers = F.when(
        linkval.isNotNull(),
        F.create_map(F.lit("link"), linkval, F.lit("server"), F.lit("synth")),
    ).otherwise(F.create_map(F.lit("server"), F.lit("synth")))
    log = d.select("url", headers.alias("headers"))
    return link_header_relations(log)


def q_hreflang_recip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hreflang return-tag audit (operators/meta_directives.
    hreflang_reciprocity): docs form en/de/fr triples declaring each
    other; every 7th doc declares nothing (its inbound declarations go
    non-reciprocal) and the last triple points past the corpus edge
    (dangling target)."""
    from docrawl_spark.operators.meta_directives import hreflang_reciprocity

    d = _t(spark, sf_dir, "documents").select("doc_id")
    e0 = d.where(F.col("doc_id") % 7 != 0).select(
        "doc_id",
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("v"),
    ).where(F.col("v") != F.col("doc_id") % 3)
    url = F.concat(F.lit("https://x.test/doc/"), F.col("doc_id").cast("string"))
    href = F.concat(
        F.lit("https://x.test/doc/"),
        (F.col("doc_id") - F.pmod(F.col("doc_id"), F.lit(3)) + F.col("v")).cast(
            "string"
        ),
    )
    lang = F.element_at(
        F.array(F.lit("en"), F.lit("de"), F.lit("fr")), F.col("v") + 1
    )
    alts = e0.select(url.alias("url"), href.alias("href"), lang.alias("hreflang"))
    return hreflang_reciprocity(alts)


def q_ip_budgets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-IP politeness split (operators/politeness.
    shared_ip_budgets): hosts hash onto 4 synthetic IPs with
    requested budgets 1..7; cap 10 per IP — under-cap IPs grant
    as-requested, over-cap IPs split by exact largest remainder."""
    from docrawl_spark.operators.politeness import shared_ip_budgets

    hosts = _doc_urls(spark, sf_dir).select("host").distinct()
    hint = F.conv(F.substring(F.md5(F.col("host")), 1, 15), 16, 10).cast("long")
    h = hosts.select(
        "host",
        F.concat(F.lit("10.0.0."), (hint % 4).cast("string")).alias("ip"),
        (hint % 7 + 1).alias("budget"),
    )
    return shared_ip_budgets(h, ip_cap=10)


def q_semantic_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination (datapipe/dedup.
    semantic_decontamination): the eval set is every 97th embedding
    (re-keyed +10^6), so exact leaks (cosine 1.0, same bucket) must
    flag, plus whatever planted near-pairs fall within one probe
    bit."""
    from docrawl_spark.datapipe.dedup import semantic_decontamination

    emb = _t(spark, sf_dir, "embeddings")
    ev = emb.where(F.col("vec_id") % 97 == 0).select(
        (F.col("vec_id") + 1000000).alias("eval_id"), "embedding"
    )
    return semantic_decontamination(emb, ev, threshold=0.4)


def q_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup threshold sensitivity (datapipe/dedup.
    neardup_threshold_sweep): the verified LSH→Jaccard pair set swept
    over five thresholds in one pass — surviving pairs and docs the
    keep-first rule would drop at each, zero rows included."""
    from docrawl_spark.datapipe.dedup import (
        minhash_lsh_pairs,
        neardup_threshold_sweep,
        ngram_jaccard_pairs,
    )

    docs = _docs_par(spark, sf_dir)
    cands = minhash_lsh_pairs(docs, n_hashes=8, n_bands=4, hash_mode="md5hex")
    pairs = ngram_jaccard_pairs(docs, cands, shingle_k=2, threshold=0.05)
    return neardup_threshold_sweep(
        pairs, [100000, 300000, 500000, 700000, 900000]
    )


def q_delay_compliance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-delay compliance audit (operators/politeness.
    delay_compliance_report): md5-scattered fetch instants within a
    10^7 µs window vs per-host 1-3 s policy delays — observed gap
    stats and exact violation ppm per host."""
    from docrawl_spark.operators.politeness import delay_compliance_report

    d = _doc_urls(spark, sf_dir)
    us = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
        ).cast("long")
        % 10000000
    )
    policy = (
        (F.pmod(F.regexp_extract(F.col("host"), r"(\d+)", 1).cast("int"), F.lit(3)) + 1)
        * 1000000
    ).cast("long")
    log = d.select(
        "host",
        us.alias("fetch_us"),
        policy.alias("policy_us"),
        F.col("doc_id").alias("fetch_id"),
    )
    return delay_compliance_report(log)


def q_sitemap_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-sitemap extension (operators/sitemap.
    sitemap_image_entries): per-doc single-entry sitemaps carrying
    two captioned/uncaptioned images, one bare image, or none —
    namespaced elements through native from_xml."""
    from docrawl_spark.operators.sitemap import sitemap_image_entries

    d = _doc_urls(spark, sf_dir)
    s = F.col("doc_id").cast("string")
    u = F.concat(F.lit("<loc>"), F.col("url"), F.lit("</loc>"))
    g = F.col("doc_id") % 3
    block = (
        F.when(
            g == 0,
            F.concat(
                F.lit("<url>"), u,
                F.lit("<image:image><image:loc>https://img.test/i"), s,
                F.lit("a.png</image:loc><image:caption>cap "), s,
                F.lit("</image:caption></image:image>"
                      "<image:image><image:loc>https://img.test/i"), s,
                F.lit("b.png</image:loc></image:image></url>"),
            ),
        )
        .when(
            g == 1,
            F.concat(
                F.lit("<url>"), u,
                F.lit("<image:image><image:loc>https://img.test/i"), s,
                F.lit(".jpg</image:loc></image:image></url>"),
            ),
        )
        .otherwise(F.concat(F.lit("<url>"), u, F.lit("</url>")))
    )
    xml = F.concat(F.lit("<urlset>"), block, F.lit("</urlset>"))
    docs = d.select("doc_id", xml.alias("sitemap_xml"))
    return sitemap_image_entries(docs, keep_cols=["doc_id"])


def q_ucb_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bandit crawl allocation (operators/fairness.
    ucb_host_allocation): per-host fetch counts and useful yields
    (n_chars above a fixed bar) from the documents table — integer
    UCB1 scores with the bit-length log and deterministic isqrt."""
    from docrawl_spark.operators.fairness import ucb_host_allocation

    stats = (
        _doc_urls(spark, sf_dir)
        .groupBy("host")
        .agg(
            F.count("*").alias("n_fetches"),
            F.sum(F.when(F.col("n_chars") > 600, 1).otherwise(0)).alias(
                "n_useful"
            ),
        )
    )
    return ucb_host_allocation(stats)


def q_retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval eval (datapipe/search.retrieval_ndcg): three synthetic
    queries with md5-ordered top-10 rankings and half-judged qrels
    (graded 0-3; odd docs unjudged → gain 0) — integer NDCG@10 with
    the bit-length discount."""
    from pyspark.sql import Window

    from docrawl_spark.datapipe.search import retrieval_ndcg

    d = _t(spark, sf_dir, "documents").select("doc_id")
    qd = d.select(
        "doc_id",
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("query_id"),
    )
    cand = qd.where(F.col("doc_id") % 5 == F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.md5(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit("|"),
                F.col("query_id").cast("string"),
            )
        ),
        F.col("doc_id"),
    )
    ranked = cand.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= 10
    )
    qrels = qd.where(F.col("doc_id") % 2 == 0).select(
        "query_id",
        "doc_id",
        ((F.col("doc_id") + F.col("query_id")) % 4).cast("int").alias("rel"),
    )
    return retrieval_ndcg(ranked, qrels, k=10)


def q_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style badword page filter (datapipe/text.blocklist_filter):
    word-boundary exact, case-insensitive, blocklist as a literal
    broadcast array — per-doc blocked flag + the sorted hit list."""
    from docrawl_spark.datapipe.text import blocklist_filter

    return blocklist_filter(
        _t(spark, sf_dir, "documents"), ["slow", "trap", "vector"]
    )


def q_domain_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test domain-leakage audit (datapipe/sampling.
    split_domain_leakage): hash_split assigns docs, the audit collapses
    subdomain variants to the registrable domain and reports every
    domain with docs on BOTH sides of the split."""
    from docrawl_spark.datapipe.sampling import hash_split, split_domain_leakage
    from docrawl_spark.functions.domains import registrable_domains, suffix_dim

    hosted = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.element_at(
                F.array(F.lit(""), F.lit("www."), F.lit("a.b.")),
                (F.col("doc_id") % 3).cast("int") + 1,
            ),
            F.col("source"),
            F.lit(".test"),
        ).alias("host"),
    )
    s = hash_split(hosted, weights={"train": 0.8, "val": 0.1, "test": 0.1})
    dmap = registrable_domains(hosted.select("host"), suffix_dim(spark))
    return split_domain_leakage(s, dmap)


def q_margin_bitext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-criterion bitext mining (datapipe/similarity.
    margin_mine_pairs): even/odd vec_ids stand in for the two language
    sides; SRP multi-probe candidates, ratio margin vs the top-4
    neighborhood means in exact ppm, best target per source."""
    from docrawl_spark.datapipe.similarity import margin_mine_pairs

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        (F.col("vec_id") % 2).cast("int").alias("side"),
    )
    return margin_mine_pairs(emb, k=4, margin_ppm_min=1_050_000, dim=64)


def q_crawl_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawl-completeness estimation (functions/sketches.
    chao1_completeness): bias-corrected Chao1 richness + Good-Turing
    unseen mass over a deterministic discovery-count distribution
    (half singletons, a tail of repeats)."""
    from docrawl_spark.functions.sketches import chao1_completeness

    u = _doc_urls(spark, sf_dir).select(
        "host",
        "doc_id",
        F.when(F.col("doc_id") % 10 < 5, 1)
        .when(F.col("doc_id") % 10 < 8, 2)
        .when(F.col("doc_id") % 10 < 9, 3)
        .otherwise(5)
        .cast("long")
        .alias("n_seen"),
    )
    return chao1_completeness(u)


def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup accounting (datapipe/dedup.
    cdc_chunk_table + cdc_dedup_stats): rolling md5 k-gram cut points
    (k=8, divisor=64 → ~64-byte chunks), per-chunk copy counts."""
    from docrawl_spark.datapipe.dedup import cdc_chunk_table, cdc_dedup_stats

    chunks = cdc_chunk_table(_docs_par(spark, sf_dir), k=8, divisor=64)
    return cdc_dedup_stats(chunks)


def q_prefix_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact prefix-filtered set-similarity self-join (datapipe.dedup.
    prefix_jaccard_pairs) at Jaccard ≥ 0.9 — the oracle is BRUTE FORCE,
    so a hash match proves the pruning lost no pair."""
    from docrawl_spark.datapipe.dedup import prefix_jaccard_pairs

    return prefix_jaccard_pairs(_docs_par(spark, sf_dir), t_ppm=900000)


def _hb_host_graph(spark: SparkSession, sf_dir: str):
    """(edges, hosts) — the same deterministic host graph host_pagerank
    uses (3 md5-hashed out-links per doc onto the host index)."""
    from docrawl_spark.operators.ranking import with_global_rank

    urls = _doc_urls(spark, sf_dir)
    hosts = urls.select("host").distinct()
    idx = with_global_rank(hosts, ["host"], rank_col="host_idx")
    cnt = hosts.agg(F.count("*").alias("n_hosts"))
    links = (
        urls.select(
            "host",
            F.col("doc_id").cast("string").alias("did"),
            F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("k"),
        )
        .crossJoin(F.broadcast(cnt))
        .select(
            F.col("host").alias("src_host"),
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("did"), F.lit(":"), F.col("k").cast("string"))),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.col("n_hosts"),
            ).alias("dst_idx"),
        )
    )
    edges = links.join(F.broadcast(idx), links.dst_idx == idx.host_idx).select(
        "src_host", F.col("host").alias("dst_host")
    )
    return edges, hosts


def q_hyperball_nf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperBall neighborhood function N(r), r = 0..3, over the same
    deterministic host graph as host_pagerank (datapipe.graph.
    hyperball_neighborhood, p=4): per-node integer-exact HLL counters
    register-max-merged along edges each round."""
    from docrawl_spark.datapipe.graph import hyperball_neighborhood

    edges, hosts = _hb_host_graph(spark, sf_dir)
    return hyperball_neighborhood(edges, hosts, n_rounds=3, p=4)


def q_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 hosts by inbound harmonic centrality (datapipe.graph.
    harmonic_centrality_topk over the REVERSED host graph): HyperBall
    ball-growth deltas weighted 1/r."""
    from docrawl_spark.datapipe.graph import harmonic_centrality_topk

    edges, hosts = _hb_host_graph(spark, sf_dir)
    rev = edges.select(
        F.col("dst_host").alias("src_host"), F.col("src_host").alias("dst_host")
    )
    return harmonic_centrality_topk(rev, hosts, n_rounds=3, p=4, k=20)


def _hyperball_cte_chain(n_rounds: int = 3, p: int = 4, reverse: bool = False) -> str:
    """Generate the fixed-round HyperBall CTE chain mirroring
    hyperball_ball_profile: c0 = one-key HLL register list per host,
    round i = edge join + UNION + per-(host, j) register MAX + list
    reassembly, then a per-host integer HLL ball estimate bl{r} for
    each round. ``reverse`` flips the merge direction (inbound balls
    for harmonic centrality)."""
    from docrawl_spark.functions.sketches import _lc_table

    m = 1 << p
    width = 60 - p
    alpha_ppm = int(0.7213 / (1.0 + 1.079 / m) * 1_000_000)
    lc = ", ".join(str(v) for v in _lc_table(p))
    join_col = "src_host" if reverse else "dst_host"
    out_col = "dst_host" if reverse else "src_host"
    parts = [
        f"""WITH u AS (
          SELECT source || '.test' AS host, CAST(doc_id AS VARCHAR) AS did
          FROM documents),
        hosts AS (SELECT DISTINCT host FROM u),
        cnt AS (SELECT COUNT(*) AS n_hosts FROM hosts),
        idx AS (
          SELECT host, ROW_NUMBER() OVER (ORDER BY host) - 1 AS host_idx
          FROM hosts),
        raw AS (
          SELECT u.host AS src_host,
                 ('0x' || substr(md5(u.did || ':' || CAST(k AS VARCHAR)), 1, 15))::BIGINT
                   % (SELECT n_hosts FROM cnt) AS dst_idx
          FROM u, UNNEST([0, 1, 2]) AS t(k)),
        e0 AS (
          SELECT DISTINCT r.src_host, i.host AS dst_host
          FROM raw r JOIN idx i ON r.dst_idx = i.host_idx
          WHERE r.src_host <> i.host),
        hh AS (
          SELECT host, ('0x' || substr(md5(host), 1, 15))::BIGINT AS h
          FROM hosts),
        c0 AS (
          SELECT host,
                 list_transform(range(0, {m}),
                   j -> CASE WHEN j = h % {m}
                             THEN (CASE WHEN h // {m} = 0 THEN {width + 1}
                                        ELSE {width} - length(bin(h // {m})) + 1 END)
                             ELSE 0 END) AS regs
          FROM hh)"""
    ]
    for i in range(1, n_rounds + 1):
        parts.append(
            f""",
        nb{i} AS (
          SELECT e.{out_col} AS host, c.regs
          FROM e0 e JOIN c{i - 1} c ON c.host = e.{join_col}),
        al{i} AS (
          SELECT host, regs FROM c{i - 1}
          UNION ALL SELECT host, regs FROM nb{i}),
        mx{i} AS (
          SELECT host, j, MAX(regs[j + 1]) AS rho
          FROM al{i}, UNNEST(range(0, {m})) AS t(j) GROUP BY host, j),
        c{i} AS (SELECT host, list(rho ORDER BY j) AS regs FROM mx{i} GROUP BY host)"""
        )
    for r in range(0, n_rounds + 1):
        parts.append(
            f""",
        ag{r} AS (
          SELECT host,
                 CAST(SUM(1::BIGINT << CAST(greatest(40 - regs[j + 1], 0) AS INTEGER)) AS BIGINT) AS s,
                 CAST(SUM(CASE WHEN regs[j + 1] = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zeros
          FROM c{r}, UNNEST(range(0, {m})) AS t(j) GROUP BY host),
        es{r} AS (
          SELECT host, zeros,
                 {alpha_ppm}::BIGINT * (({m * m}::BIGINT * (1::BIGINT << 40)) // s)
                   // 1000000 AS raw
          FROM ag{r}),
        bl{r} AS (
          SELECT host,
                 CAST(CASE WHEN zeros > 0 AND raw <= {5 * m // 2}
                           THEN ([{lc}])[CAST(zeros AS INTEGER)]
                           ELSE raw END AS BIGINT) AS ball
          FROM es{r})"""
        )
    return "".join(parts)


def _effective_diameter_oracle(n_rounds: int = 3, p: int = 4, pct_ppm: int = 900000) -> str:
    """min r with N(r) >= pct of N(max) over the shared ball chain."""
    chain = _hyperball_cte_chain(n_rounds, p)
    nfs = "\n            UNION ALL ".join(
        f"SELECT CAST({r} AS INT) AS r, CAST(SUM(ball) AS BIGINT) AS nf_units"
        f" FROM bl{r}"
        for r in range(0, n_rounds + 1)
    )
    return chain + f""",
        nf AS ({nfs}),
        mx AS (SELECT MAX(nf_units) AS nf_max FROM nf)
        SELECT r AS eff_diameter, nf_units AS nf_at_r, nf_max
        FROM nf, mx
        WHERE nf_units * 1000000 >= {pct_ppm} * nf_max
        ORDER BY r ASC LIMIT 1"""


def _hyperball_oracle(n_rounds: int = 3, p: int = 4) -> str:
    """Neighborhood function N(r) from the per-host ball CTEs."""
    chain = _hyperball_cte_chain(n_rounds, p)
    sel = "\n            UNION ALL ".join(
        f"SELECT CAST({r} AS INT) AS r, CAST(COUNT(*) AS BIGINT) AS n_nodes,"
        f" CAST(SUM(ball) AS BIGINT) AS nf_units FROM bl{r}"
        for r in range(0, n_rounds + 1)
    )
    return chain + f"\n        {sel}"


def _harmonic_oracle(n_rounds: int = 3, p: int = 4, k: int = 20) -> str:
    """Harmonic centrality from REVERSED-edge ball growth deltas —
    mirrors datapipe.graph.harmonic_centrality_topk (greatest(Δ,0)
    clamp at the linear-counting branch boundary)."""
    chain = _hyperball_cte_chain(n_rounds, p, reverse=True)
    from_clause = "bl0 b0" + "".join(
        f" JOIN bl{r} b{r} USING (host)" for r in range(1, n_rounds + 1)
    )
    cols = ", ".join(f"b{r}.ball AS b{r}" for r in range(0, n_rounds + 1))
    terms = " + ".join(
        f"greatest(b{r} - b{r - 1}, 0::BIGINT) * 1000000::BIGINT // {r}"
        for r in range(1, n_rounds + 1)
    )
    return chain + f""",
        w AS (SELECT host, {cols} FROM {from_clause})
        SELECT host, CAST({terms} AS BIGINT) AS hc_units
        FROM w ORDER BY hc_units DESC, host ASC LIMIT {k}"""


def q_host_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label-propagation communities (4 rounds) over the
    undirected deterministic host graph (datapipe.graph.
    label_propagation_communities)."""
    from docrawl_spark.datapipe.graph import label_propagation_communities

    edges, hosts = _hb_host_graph(spark, sf_dir)
    return label_propagation_communities(edges, hosts, n_rounds=4)


def _lpa_oracle(n_rounds: int = 4) -> str:
    """Fixed-round synchronous LPA CTE chain mirroring
    label_propagation_communities: undirected distinct edges, per
    round neighbor-label counts -> max count -> MIN label tiebreak,
    isolated nodes keep their label."""
    parts = [
        """WITH u AS (
          SELECT source || '.test' AS host, CAST(doc_id AS VARCHAR) AS did
          FROM documents),
        hosts AS (SELECT DISTINCT host FROM u),
        cnt AS (SELECT COUNT(*) AS n_hosts FROM hosts),
        idx AS (
          SELECT host, ROW_NUMBER() OVER (ORDER BY host) - 1 AS host_idx
          FROM hosts),
        raw AS (
          SELECT u.host AS src_host,
                 ('0x' || substr(md5(u.did || ':' || CAST(k AS VARCHAR)), 1, 15))::BIGINT
                   % (SELECT n_hosts FROM cnt) AS dst_idx
          FROM u, UNNEST([0, 1, 2]) AS t(k)),
        e0 AS (
          SELECT DISTINCT r.src_host, i.host AS dst_host
          FROM raw r JOIN idx i ON r.dst_idx = i.host_idx
          WHERE r.src_host <> i.host),
        eu AS (
          SELECT src_host, dst_host FROM e0
          UNION
          SELECT dst_host AS src_host, src_host AS dst_host FROM e0),
        l0 AS (SELECT host, host AS label FROM hosts)"""
    ]
    for i in range(1, n_rounds + 1):
        parts.append(f""",
        nb{i} AS (
          SELECT e.dst_host AS host, l.label, CAST(COUNT(*) AS BIGINT) AS c
          FROM eu e JOIN l{i - 1} l ON l.host = e.src_host
          GROUP BY 1, 2),
        mx{i} AS (SELECT host, MAX(c) AS cmax FROM nb{i} GROUP BY host),
        tp{i} AS (
          SELECT n.host, MIN(n.label) AS top_label
          FROM nb{i} n JOIN mx{i} m ON n.host = m.host AND n.c = m.cmax
          GROUP BY n.host),
        l{i} AS (
          SELECT p.host, COALESCE(t.top_label, p.label) AS label
          FROM l{i - 1} p LEFT JOIN tp{i} t ON t.host = p.host)""")
    parts.append(f"""
        SELECT host, label AS community FROM l{n_rounds}""")
    return "".join(parts)


def q_bowtie_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bow-tie decomposition (Broder 2000) of the deterministic host
    graph relative to the lexicographic-min pivot's SCC
    (datapipe.graph.bowtie_decomposition)."""
    from docrawl_spark.datapipe.graph import bowtie_decomposition

    edges, hosts = _hb_host_graph(spark, sf_dir)
    e = edges.where(F.col("src_host") != F.col("dst_host")).distinct()
    return bowtie_decomposition(e, hosts)


def q_media_captions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAION-style image-caption pair mining (datapipe.multimodal.
    media_caption_pairs) over a deterministic synthetic interleaved
    span derivation of the documents table (every 5th token becomes an
    image span, offsets = 7·index — same derivation in the oracle):
    nearest text span by offset, earlier-span tiebreak."""
    from docrawl_spark.datapipe.multimodal import media_caption_pairs

    docs = _docs_par(spark, sf_dir)
    spans = docs.select(
        "doc_id",
        F.expr(
            "transform(split(trim(lower(text)), '\\\\s+'), (tok, j) -> struct("
            " CASE WHEN (j + 1) % 5 = 1 THEN 'image' ELSE 'text' END AS kind,"
            " CASE WHEN (j + 1) % 5 = 1 THEN CAST(NULL AS STRING) ELSE tok END AS text,"
            " CASE WHEN (j + 1) % 5 = 1 THEN concat('img://', substring(md5(tok), 1, 8), '.jpg')"
            "      ELSE CAST(NULL AS STRING) END AS media_ref,"
            " CAST((j + 1) * 7 AS INT) AS `offset`))"
        ).alias("spans"),
    )
    return media_caption_pairs(spans)


def q_effective_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90%-effective diameter of the deterministic host graph from the
    HyperBall neighborhood function (datapipe.graph.effective_diameter)."""
    from docrawl_spark.datapipe.graph import effective_diameter

    edges, hosts = _hb_host_graph(spark, sf_dir)
    return effective_diameter(edges, hosts, n_rounds=3, p=4)


def q_host_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-host triangle counts + clustering coefficients over
    the undirected deterministic host graph (datapipe.graph.
    host_triangles, degree-ordered orientation)."""
    from docrawl_spark.datapipe.graph import host_triangles

    edges, hosts = _hb_host_graph(spark, sf_dir)
    return host_triangles(edges, hosts)


def q_kcore_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core membership (k=12, 4 peel rounds) over the undirected
    deterministic host graph (datapipe.graph.kcore_members)."""
    from docrawl_spark.datapipe.graph import kcore_members

    edges, hosts = _hb_host_graph(spark, sf_dir)
    return kcore_members(edges, hosts, k=12, n_rounds=4)


def _kcore_oracle(k: int, n_rounds: int = 4) -> str:
    """Fixed-round synchronous peel mirroring kcore_members."""
    parts = [
        """WITH u AS (
          SELECT source || '.test' AS host, CAST(doc_id AS VARCHAR) AS did
          FROM documents),
        hosts AS (SELECT DISTINCT host FROM u),
        cnt AS (SELECT COUNT(*) AS n_hosts FROM hosts),
        idx AS (
          SELECT host, ROW_NUMBER() OVER (ORDER BY host) - 1 AS host_idx
          FROM hosts),
        raw AS (
          SELECT u.host AS src_host,
                 ('0x' || substr(md5(u.did || ':' || CAST(k AS VARCHAR)), 1, 15))::BIGINT
                   % (SELECT n_hosts FROM cnt) AS dst_idx
          FROM u, UNNEST([0, 1, 2]) AS t(k)),
        e0 AS (
          SELECT DISTINCT r.src_host, i.host AS dst_host
          FROM raw r JOIN idx i ON r.dst_idx = i.host_idx
          WHERE r.src_host <> i.host),
        und AS (
          SELECT DISTINCT LEAST(src_host, dst_host) AS a,
                          GREATEST(src_host, dst_host) AS b
          FROM e0),
        a0 AS (SELECT host FROM hosts)"""
    ]
    for i in range(1, n_rounds + 1):
        parts.append(f""",
        d{i} AS (
          SELECT h, CAST(COUNT(*) AS BIGINT) AS deg
          FROM (
            SELECT e.a AS h FROM und e
            JOIN a{i - 1} x ON x.host = e.a JOIN a{i - 1} y ON y.host = e.b
            UNION ALL
            SELECT e.b AS h FROM und e
            JOIN a{i - 1} x ON x.host = e.a JOIN a{i - 1} y ON y.host = e.b)
          GROUP BY h),
        a{i} AS (
          SELECT p.host FROM a{i - 1} p
          JOIN d{i} d ON d.h = p.host AND d.deg >= {k})""")
    parts.append(f"""
        SELECT h.host, (a.host IS NOT NULL) AS in_kcore
        FROM hosts h LEFT JOIN a{n_rounds} a ON a.host = h.host""")
    return "".join(parts)


def q_ktruss_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-truss (k=4, 3 peel rounds) edge membership over the
    undirected deterministic host graph (datapipe.graph.ktruss_edges)."""
    from docrawl_spark.datapipe.graph import ktruss_edges

    edges, _hosts = _hb_host_graph(spark, sf_dir)
    return ktruss_edges(edges, k=4, n_rounds=3)


def _ktruss_oracle(k: int, n_rounds: int = 3) -> str:
    """Fixed-round synchronous truss peel mirroring ktruss_edges."""
    floor = k - 2
    parts = [
        """WITH u AS (
          SELECT source || '.test' AS host, CAST(doc_id AS VARCHAR) AS did
          FROM documents),
        hosts AS (SELECT DISTINCT host FROM u),
        cnt AS (SELECT COUNT(*) AS n_hosts FROM hosts),
        idx AS (
          SELECT host, ROW_NUMBER() OVER (ORDER BY host) - 1 AS host_idx
          FROM hosts),
        raw AS (
          SELECT u.host AS src_host,
                 ('0x' || substr(md5(u.did || ':' || CAST(k AS VARCHAR)), 1, 15))::BIGINT
                   % (SELECT n_hosts FROM cnt) AS dst_idx
          FROM u, UNNEST([0, 1, 2]) AS t(k)),
        e0 AS (
          SELECT DISTINCT r.src_host, i.host AS dst_host
          FROM raw r JOIN idx i ON r.dst_idx = i.host_idx
          WHERE r.src_host <> i.host),
        und AS (
          SELECT DISTINCT LEAST(src_host, dst_host) AS a,
                          GREATEST(src_host, dst_host) AS b
          FROM e0),
        t0 AS (SELECT a, b FROM und)"""
    ]
    for i in range(1, n_rounds + 1):
        parts.append(f""",
        tri{i} AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM t{i - 1} e1
          JOIN t{i - 1} e2 ON e2.a = e1.b
          JOIN t{i - 1} e3 ON e3.a = e1.a AND e3.b = e2.b),
        sup{i} AS (
          SELECT a, b, CAST(COUNT(*) AS BIGINT) AS sup FROM (
            SELECT x AS a, y AS b FROM tri{i}
            UNION ALL SELECT x AS a, z AS b FROM tri{i}
            UNION ALL SELECT y AS a, z AS b FROM tri{i})
          GROUP BY a, b),
        t{i} AS (
          SELECT t.a, t.b FROM t{i - 1} t
          LEFT JOIN sup{i} s ON s.a = t.a AND s.b = t.b
          WHERE COALESCE(s.sup, 0) >= {floor})""")
    parts.append(f"""
        SELECT u.a, u.b, (t.a IS NOT NULL) AS in_ktruss
        FROM und u LEFT JOIN t{n_rounds} t ON t.a = u.a AND t.b = u.b""")
    return "".join(parts)


def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact degree-assortativity sufficient statistics of the
    undirected deterministic host graph
    (datapipe.graph.degree_assortativity_stats)."""
    from docrawl_spark.datapipe.graph import degree_assortativity_stats

    edges, _hosts = _hb_host_graph(spark, sf_dir)
    return degree_assortativity_stats(edges)


def q_lsh_incremental_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup probe (datapipe.dedup.lsh_probe_index,
    md5 oracle mode, 8 hashes / 4 bands): docs with doc_id % 5 == 0
    play the newly crawled batch, the rest the already-indexed corpus
    (datapipe.dedup.minhash_band_index) — candidates are new-vs-corpus
    band collisions only, never a corpus self-join."""
    from docrawl_spark.datapipe.dedup import lsh_probe_index, minhash_band_index

    docs = _docs_par(spark, sf_dir)
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    new = docs.where(F.col("doc_id") % 5 == 0)
    idx = minhash_band_index(corpus, n_hashes=8, n_bands=4, hash_mode="md5hex")
    return lsh_probe_index(new, idx, n_hashes=8, n_bands=4, hash_mode="md5hex")


def q_host_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pseudo-random walks (datapipe.graph.
    host_random_walks, 2 walks × 4 steps per host) over the directed
    deterministic host graph — the DeepWalk/node2vec corpus-prep
    step, bit-reproducible via md5 position hashing."""
    from docrawl_spark.datapipe.graph import host_random_walks

    edges, hosts = _hb_host_graph(spark, sf_dir)
    return host_random_walks(edges, hosts, walk_len=4, n_walks=2)


def _host_walks_oracle(walk_len: int = 4, n_walks: int = 2) -> str:
    ks = ", ".join(str(k) for k in range(n_walks))
    parts = [
        f"""WITH u AS (
          SELECT source || '.test' AS host, CAST(doc_id AS VARCHAR) AS did
          FROM documents),
        hosts AS (SELECT DISTINCT host FROM u),
        cnt AS (SELECT COUNT(*) AS n_hosts FROM hosts),
        idx AS (
          SELECT host, ROW_NUMBER() OVER (ORDER BY host) - 1 AS host_idx
          FROM hosts),
        raw AS (
          SELECT u.host AS src_host,
                 ('0x' || substr(md5(u.did || ':' || CAST(k AS VARCHAR)), 1, 15))::BIGINT
                   % (SELECT n_hosts FROM cnt) AS dst_idx
          FROM u, UNNEST([0, 1, 2]) AS t(k)),
        e AS (
          SELECT DISTINCT r.src_host AS src, i.host AS dst
          FROM raw r JOIN idx i ON r.dst_idx = i.host_idx
          WHERE r.src_host <> i.host),
        nbr AS (
          SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS i
          FROM e),
        deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY src),
        w0 AS (
          SELECT host || '#' || CAST(k AS VARCHAR) AS walk_id, host AS cur
          FROM hosts, UNNEST([{ks}]) AS t(k))"""
    ]
    for s in range(1, walk_len):
        parts.append(f""",
        s{s} AS (
          SELECT w.walk_id, n.dst AS cur
          FROM {"s" + str(s - 1) if s > 1 else "w0"} w
          JOIN deg d ON d.src = w.cur
          JOIN nbr n ON n.src = w.cur
            AND n.i = ('0x' || substr(md5(w.walk_id || ':{s}:' || w.cur), 1, 15))::BIGINT % d.d)""")
    sel = ["SELECT walk_id, 0 AS step, cur AS host FROM w0"]
    for s in range(1, walk_len):
        sel.append(f"SELECT walk_id, {s} AS step, cur AS host FROM s{s}")
    parts.append("\n" + "\nUNION ALL ".join(sel))
    return "".join(parts)


def q_host_coreness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full coreness per host (datapipe.graph.host_coreness, h-index
    iteration, 4 rounds) over the SPARSE slice of the deterministic
    host graph (same derivation as host_components: docs with
    doc_id % 37 == 0 contribute one hashed out-link) — sparse so the
    decomposition is non-uniform, unlike the dense 3-link graph."""
    from docrawl_spark.datapipe.graph import host_coreness
    from docrawl_spark.operators.ranking import with_global_rank

    urls = _doc_urls(spark, sf_dir)
    hosts = urls.select("host").distinct()
    idx = with_global_rank(hosts, ["host"], rank_col="host_idx")
    cnt = hosts.agg(F.count("*").alias("n_hosts"))
    links = (
        urls.where(F.col("doc_id") % 37 == 0)
        .select("host", F.col("doc_id").cast("string").alias("did"))
        .crossJoin(F.broadcast(cnt))
        .select(
            F.col("host").alias("src_host"),
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("did"), F.lit(":0"))), 1, 15
                    ),
                    16,
                    10,
                ).cast("long"),
                F.col("n_hosts"),
            ).alias("dst_idx"),
        )
    )
    edges = (
        links.join(F.broadcast(idx), links.dst_idx == idx.host_idx)
        .where(F.col("src_host") != F.col("host"))
        .select("src_host", F.col("host").alias("dst_host"))
    )
    return host_coreness(edges, hosts, n_rounds=4)


def _host_coreness_oracle(n_rounds: int = 4) -> str:
    """Unrolled h-index iteration mirroring host_coreness over the
    sparse host-graph slice."""
    parts = [
        """WITH u AS (
          SELECT source || '.test' AS host, CAST(doc_id AS VARCHAR) AS did
          FROM documents WHERE doc_id % 37 = 0),
        hosts AS (SELECT DISTINCT source || '.test' AS host FROM documents),
        cnt AS (SELECT COUNT(*) AS n_hosts FROM hosts),
        idx AS (
          SELECT host, ROW_NUMBER() OVER (ORDER BY host) - 1 AS host_idx
          FROM hosts),
        raw AS (
          SELECT u.host AS src_host,
                 ('0x' || substr(md5(u.did || ':0'), 1, 15))::BIGINT
                   % (SELECT n_hosts FROM cnt) AS dst_idx
          FROM u),
        e0 AS (
          SELECT DISTINCT r.src_host AS src, i.host AS dst
          FROM raw r JOIN idx i ON r.dst_idx = i.host_idx
          WHERE r.src_host <> i.host),
        und AS (
          SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
          FROM e0),
        sym AS (SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und),
        c0 AS (
          SELECT h.host AS h, CAST(COALESCE(d.v, 0) AS BIGINT) AS v
          FROM hosts h LEFT JOIN (
            SELECT a AS h2, CAST(COUNT(*) AS BIGINT) AS v FROM sym GROUP BY a
          ) d ON d.h2 = h.host)"""
    ]
    for i in range(1, n_rounds + 1):
        parts.append(f""",
        nv{i} AS (
          SELECT s.a AS h, c.v AS nbr_v
          FROM sym s JOIN c{i - 1} c ON c.h = s.b),
        hi{i} AS (
          SELECT h, MAX(LEAST(rn, nbr_v)) AS v FROM (
            SELECT h, nbr_v,
                   CAST(ROW_NUMBER() OVER (PARTITION BY h ORDER BY nbr_v DESC)
                        AS BIGINT) AS rn
            FROM nv{i})
          GROUP BY h),
        c{i} AS (
          SELECT h.host AS h, CAST(COALESCE(x.v, 0) AS BIGINT) AS v
          FROM hosts h LEFT JOIN hi{i} x ON x.h = h.host)""")
    parts.append(f"""
        SELECT h AS host, v AS coreness FROM c{n_rounds}""")
    return "".join(parts)


def q_snm_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood candidate pairs (datapipe.dedup.
    sorted_neighborhood_pairs): blocking key = first 8 chars of the
    normalized text, 2-char blocks, window 4."""
    from docrawl_spark.datapipe.dedup import sorted_neighborhood_pairs

    docs = _docs_par(spark, sf_dir)
    key = F.substring(F.lower(F.trim(F.col("text"))), 1, 8)
    return sorted_neighborhood_pairs(docs, key, window=4, block_chars=2)


def q_section_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Section-level corpus filter (datapipe.structure.filter_sections,
    min 5 text spans / 25 chars per section) over the same
    deterministic interleaved span derivation as doc_sections — full
    interior sections survive, the 4-text-span preamble and ragged
    tail sections drop, and the doc text reassembles in offset order."""
    from docrawl_spark.datapipe.structure import filter_sections

    docs = _docs_par(spark, sf_dir)
    spans = docs.select(
        "doc_id",
        F.expr(
            "transform(split(trim(lower(text)), '\\\\s+'), (tok, j) -> struct("
            " CASE WHEN j % 7 = 5 THEN 'headline'"
            "      WHEN j % 7 = 2 THEN 'image' ELSE 'text' END AS kind,"
            " CASE WHEN j % 7 = 2 THEN CAST(NULL AS STRING) ELSE tok END AS text,"
            " CASE WHEN j % 7 = 2 THEN concat('img://', substring(md5(tok), 1, 8), '.jpg')"
            "      ELSE CAST(NULL AS STRING) END AS media_ref,"
            " CAST(j AS INT) AS `offset`))"
        ).alias("spans"),
    )
    return filter_sections(spans, min_text_spans=5, min_chars=25)


def q_component_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed component-size histogram
    (datapipe.graph.component_size_histogram) over the same sparse
    host-graph component labeling as host_components."""
    from docrawl_spark.datapipe.graph import component_size_histogram

    return component_size_histogram(
        q_host_components(spark, sf_dir), label_col="component"
    )


def q_neardup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed size histogram of the near-dup clusters
    (datapipe.graph.component_size_histogram over
    q_neardup_components) — the dedup-audit summary: how much of the
    corpus sits in big duplicate families vs isolated pairs."""
    from docrawl_spark.datapipe.graph import component_size_histogram

    return component_size_histogram(
        q_neardup_components(spark, sf_dir), label_col="component"
    )


def q_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimate-vs-exact calibration over the md5-mode LSH
    candidates (datapipe.dedup.minhash_estimate_calibration, 8 hashes
    / 4 bands): per candidate pair, signature-agreement estimate and
    exact shingle Jaccard, both in exact ppm."""
    from docrawl_spark.datapipe.dedup import (
        minhash_estimate_calibration,
        minhash_lsh_pairs,
    )

    docs = _docs_par(spark, sf_dir)
    pairs = minhash_lsh_pairs(docs, n_hashes=8, n_bands=4, hash_mode="md5hex")
    return minhash_estimate_calibration(
        docs, pairs, n_hashes=8, hash_mode="md5hex"
    )


def q_host_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host batch novelty (datapipe.dedup.host_novelty_rates):
    docs with doc_id % 4 == 0 play the new crawl batch (host =
    source.test), the rest the corpus — novelty_ppm = distinct batch
    shingles absent from the corpus per host."""
    from docrawl_spark.datapipe.dedup import host_novelty_rates

    docs = _docs_par(spark, sf_dir).withColumn(
        "host", F.concat(F.col("source"), F.lit(".test"))
    )
    new = docs.where(F.col("doc_id") % 4 == 0)
    corpus = docs.where(F.col("doc_id") % 4 != 0)
    return host_novelty_rates(new, corpus)


def q_benford_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit deviation of the numeric content of event
    props, per event type (datapipe.text.benford_deviation) — exact
    ppm arithmetic against the shared floored-literal Benford table."""
    from docrawl_spark.datapipe.text import benford_deviation

    return benford_deviation(
        _t(spark, sf_dir, "events"), group_col="event_type", text_col="props"
    )


def q_strand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRAND URL-structure bitext candidates (datapipe.bitext.
    strand_url_pairs) over a deterministic lang-marker URL derivation:
    url = https://<source>.test/<lang>/page/<doc_id % 37> — cross-lang
    pairs of per-(template, lang) min-URL representatives."""
    from docrawl_spark.datapipe.bitext import strand_url_pairs

    docs = _t(spark, sf_dir, "documents")
    urls = docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".test/"),
            F.col("lang"), F.lit("/page/"),
            (F.col("doc_id") % 37).cast("string"),
        ).alias("url")
    )
    return strand_url_pairs(urls, ["en", "zh", "es", "de", "fr"])


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-Kincaid grade level in centi-units over documents
    (datapipe.text.readability_scores)."""
    from docrawl_spark.datapipe.text import readability_scores

    return readability_scores(_docs_par(spark, sf_dir))


def q_doc_sections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Section segmentation of a deterministic synthetic interleaved
    span derivation of the documents table (every token j: j%7==5 →
    headline, j%7==2 → image, else text; offset = j — so tokens 0-4
    are a preamble) via datapipe.structure.section_stats: every span
    assigned to the nearest preceding headline, per-section span mix."""
    from docrawl_spark.datapipe.structure import section_stats

    docs = _docs_par(spark, sf_dir)
    spans = docs.select(
        "doc_id",
        F.expr(
            "transform(split(trim(lower(text)), '\\\\s+'), (tok, j) -> struct("
            " CASE WHEN j % 7 = 5 THEN 'headline'"
            "      WHEN j % 7 = 2 THEN 'image' ELSE 'text' END AS kind,"
            " CASE WHEN j % 7 = 2 THEN CAST(NULL AS STRING) ELSE tok END AS text,"
            " CASE WHEN j % 7 = 2 THEN concat('img://', substring(md5(tok), 1, 8), '.jpg')"
            "      ELSE CAST(NULL AS STRING) END AS media_ref,"
            " CAST(j AS INT) AS `offset`))"
        ).alias("spans"),
    )
    return section_stats(spans)


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed linear quality classifier
    (datapipe.classifier.linear_quality_scores): 512 hashed unigram
    buckets, deterministic md5-seeded weights (seed 3), keep iff mean
    feature weight ≥ 50 milli-units."""
    from docrawl_spark.datapipe.classifier import (
        linear_quality_scores,
        synthetic_weights,
    )

    docs = _docs_par(spark, sf_dir)
    w = synthetic_weights(spark, n_buckets=512, seed=3)
    return linear_quality_scores(docs, w, n_buckets=512, threshold_fp=50)


def q_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall of the md5-mode MinHash-LSH candidate set
    (8 hashes, 4 bands) vs exact shingle-Jaccard ≥ 0.5 truth
    (datapipe.dedup.lsh_recall_eval)."""
    from docrawl_spark.datapipe.dedup import lsh_recall_eval

    return lsh_recall_eval(_docs_par(spark, sf_dir), t_ppm=500000)


def q_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus compression under the 6 learned BPE merges
    (datapipe.text.bpe_encode_stats): chars vs BPE tokens, saved ppm."""
    from docrawl_spark.datapipe.text import bpe_encode_stats

    return bpe_encode_stats(_docs_par(spark, sf_dir), n_merges=6)


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy BPE merge training, first 6 rules (datapipe.text.
    bpe_train_merges): per-round argmax pair over the cached
    word-frequency dim + per-row fold re-tokenization."""
    from docrawl_spark.datapipe.text import bpe_train_merges

    return bpe_train_merges(_docs_par(spark, sf_dir), n_merges=6)


def _bpe_merges_oracle(n_merges: int) -> str:
    """Generate the fixed-round BPE-training CTE chain: v0 = the
    symbol-joined word-frequency dim, then per round i: p_i adjacent
    pair counts → b_i argmax (count DESC, left, right) → v_i the
    list_reduce greedy re-tokenization (merge appends with NO
    separator, so a fused token can't re-merge within the round —
    exactly the Spark fold's rule)."""
    parts = [
        r"""WITH wf AS (
          SELECT word, CAST(COUNT(*) AS BIGINT) AS n,
                 array_to_string(string_split(word, ''), chr(31)) AS tokstr
          FROM (
            SELECT s AS word
            FROM (SELECT string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS t
                  FROM documents), UNNEST(t) AS u(s))
          WHERE len(word) >= 2 AND NOT contains(word, chr(31))
          GROUP BY word),
        v0 AS (SELECT * FROM wf)"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            f""",
        p{i} AS (
          SELECT t[j] AS l, t[j + 1] AS r, CAST(SUM(n) AS BIGINT) AS c
          FROM (SELECT string_split(tokstr, chr(31)) AS t, n FROM v{i - 1}) s,
               UNNEST(range(1, len(t))) AS u(j)
          GROUP BY 1, 2),
        b{i} AS (SELECT l, r, c FROM p{i} ORDER BY c DESC, l ASC, r ASC LIMIT 1),
        v{i} AS (
          SELECT word, n,
                 list_reduce(string_split(tokstr, chr(31)),
                   (acc, x) -> CASE WHEN x = b{i}.r
                                     AND (acc = b{i}.l
                                          OR ends_with(acc, chr(31) || b{i}.l))
                               THEN acc || x ELSE acc || chr(31) || x END) AS tokstr
          FROM v{i - 1}, b{i})"""
        )
    unions = "\n            UNION ALL ".join(
        f"SELECT {i} AS merge_rank, l AS left_tok, r AS right_tok,"
        f" c AS pair_count FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    parts.append(f"\n        {unions}")
    return "".join(parts)


def _bpe_encode_oracle(n_merges: int) -> str:
    """Compression stats over the final re-tokenized state v{n} of the
    same fixed-round chain — mirrors datapipe.text.bpe_encode_stats."""
    chain = _bpe_merges_oracle(n_merges)
    # keep the CTE chain, swap the final merge-table UNION for the
    # aggregate over v{n_merges}
    head, _, _ = chain.partition("\n        SELECT 1 AS merge_rank")
    return head + f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_words_distinct,
               CAST(SUM(n) AS BIGINT) AS n_word_instances,
               CAST(SUM(n * length(word)) AS BIGINT) AS chars_total,
               CAST(SUM(n * len(string_split(tokstr, chr(31)))) AS BIGINT)
                 AS tokens_total,
               (CAST(SUM(n * length(word)) AS BIGINT)
                - CAST(SUM(n * len(string_split(tokstr, chr(31)))) AS BIGINT))
                 * 1000000
                 // GREATEST(CAST(SUM(n * length(word)) AS BIGINT), 1)
                 AS saved_ppm
        FROM v{n_merges}"""


def q_orders_transit_weeks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders in flight per calendar week — the bucketized
    interval-overlap join (datapipe/intervals.overlap_join_bucketed).
    Each order's transit interval is [o_orderdate, max l_shipdate] in
    epoch days; the right side is the 7-day week grid spanning the
    corpus, derived from a 1-row bounds agg (explode of a sequence —
    no collect). A naive overlap join is a BNLJ; the bucketized form
    explodes each interval into its week buckets and equi-joins on the
    bucket id, emitting each overlapping pair exactly once via the
    first-common-bucket rule. Crawl analog: recrawl-window occupancy —
    how many URLs are inside their revisit interval per scheduling
    tick.

    Scale shape: fan-out = interval_len/7 + 1 per order (bounded by
    TPC-H transit spans), one equi shuffle on the week id, HashAggregate.
    The week dim is tiny so AQE broadcasts the probe side."""
    from docrawl_spark.datapipe.intervals import overlap_join_bucketed

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    epoch = F.to_date(F.lit("1970-01-01"))
    spans = (
        li.groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("ship_end"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_totalprice").cast("decimal(18,6)").alias("oprice"),
            F.datediff(F.col("o_orderdate"), epoch).cast("long").alias("o_start"),
            F.datediff(F.col("ship_end"), epoch).cast("long").alias("o_end"),
        )
    )
    bounds = spans.select(
        F.expr("o_start div 7").alias("wb0"), F.expr("o_end div 7").alias("wb1")
    ).agg(F.min("wb0").alias("w0"), F.max("wb1").alias("w1"))
    weeks = bounds.select(
        F.explode(F.sequence("w0", "w1")).alias("wk")
    ).select(
        (F.col("wk") * 7).alias("w_start"), (F.col("wk") * 7 + 6).alias("w_end")
    )
    joined = overlap_join_bucketed(
        spans, weeks, "o_start", "o_end", "w_start", "w_end", bucket_width=7
    )
    return (
        joined.groupBy("w_start")
        .agg(
            F.count(F.lit(1)).alias("n_open_orders"),
            F.round(F.sum("oprice"), 4).cast("double").alias("open_value"),
        )
        .select(
            F.col("w_start").cast("long").alias("week_start_day"),
            "n_open_orders",
            "open_value",
        )
    )


def q_typo_alias_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact edit-distance-1 alias pairs over the customer-name string
    universe — SymSpell symmetric-delete blocking + levenshtein verify
    (datapipe/linkage.edit1_pairs). The crawl-side use is host/URL typo
    aliasing; the customer names exercise the same dense one-digit-apart
    neighborhood structure. Recall-complete (every true ed<=1 pair
    shares a deletion variant) and never a cartesian: the only join is
    an equi-join on the variant key, fan-out len+1 per string."""
    from docrawl_spark.datapipe.linkage import edit1_pairs

    c = _t(spark, sf_dir, "customer").select("c_name")
    return edit1_pairs(c, "c_name")


def q_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of the part catalog — maximize p_size, minimize
    retail price (exact integer cents) — via the 2-HashAggregate + dim
    window skyline (datapipe/pareto.skyline_2d), not the quadratic
    NOT-EXISTS self-join. Corpus analog: quality-vs-cost document
    frontier (max quality score, min fetch/storage cost). Ties at a
    skyline point all survive (strict dominance)."""
    from docrawl_spark.datapipe.pareto import skyline_2d

    pc = _t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_size",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_c"),
    )
    return skyline_2d(pc, maximize="p_size", minimize="price_c")


def q_events_trimmed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust 10%-two-sided trimmed mean per event_type, integer-exact:
    values in centi-units (BIGINT), rank-based trim (drop the n div 10
    lowest and highest), mean in micro-units via BIGINT div. Ties at
    the trim boundary are sum-invariant (equal values), so the
    row_number tie-break cannot change the result. Complements
    events_mad_outliers: the trimmed mean is the estimator you feed a
    latency SLO when the tails are bot bursts.

    Scale note: the per-type window sorts one event_type per task —
    same buffer bound as events_value_quantiles; for heavy-tailed
    100 TB telemetry pre-aggregate into the log-histogram first."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("event_type").orderBy("vc", "event_id")
    ranked = ev.withColumn("rn", F.row_number().over(w)).join(
        F.broadcast(counts), "event_type"
    )
    kept = ranked.where(
        (F.col("rn") > F.expr("n_events div 10"))
        & (F.col("rn") <= F.col("n_events") - F.expr("n_events div 10"))
    )
    return (
        kept.groupBy("event_type", "n_events")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("vc").alias("trimmed_sum_c"),
            F.min("vc").alias("lo_c"),
            F.max("vc").alias("hi_c"),
        )
        .select(
            "event_type",
            "n_events",
            "n_kept",
            F.col("trimmed_sum_c").cast("long").alias("trimmed_sum_c"),
            F.expr("(trimmed_sum_c * 10000) div n_kept").alias(
                "trimmed_mean_micro"
            ),
            "lo_c",
            "hi_c",
        )
    )


def q_events_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson-bootstrap confidence interval for the mean
    value per event_type (datapipe/stats.poisson_bootstrap_means): 24
    hash-weighted replicates (md5-ppm weights, Poisson(1) inverse CDF),
    replicate means in exact micro-cents via BIGINT div, bounds as the
    2nd/23rd order statistics. The error-bar primitive for corpus
    telemetry at 100 TB: one map-side weighting pass + one
    HashAggregate on (event_type, rep) — no resampling data movement,
    no fact-table window, bit-reproducible across engines and cluster
    sizes."""
    from docrawl_spark.datapipe.stats import poisson_bootstrap_means

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    return poisson_bootstrap_means(
        ev, "event_type", "vc", "event_id", n_reps=24, salt="boot1"
    )


def q_events_bootstrap_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for the per-event-type MEDIAN
    value (datapipe/stats.poisson_bootstrap_quantiles) — the statistic
    with no CLT standard error, where the bootstrap is the standard
    answer. Same deterministic Poisson-weight replicates as
    events_bootstrap_ci; each replicate's median is the exact weighted
    quantile of its resample, in integer cents."""
    from docrawl_spark.datapipe.stats import poisson_bootstrap_quantiles

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    return poisson_bootstrap_quantiles(
        ev, "event_type", "vc", "event_id", n_reps=24, salt="bootq1"
    )


def q_pan_luhn_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Card-number (PAN) detection with Luhn mod-10 validation
    (datapipe/text.luhn_pan_audit): per doc, candidate digit runs vs
    runs that survive the checksum — the precision layer that keeps a
    PII redactor from destroying ids/timestamps/serials. Fixture: each
    doc embeds a dashed 16-digit and a spaced 15-digit md5-derived run
    (validity falls where the checksum says — identically in both
    engines) plus an 8-digit decoy below the candidate floor."""
    from docrawl_spark.datapipe.text import luhn_pan_audit

    d = _t(spark, sf_dir, "documents").select("doc_id")

    def _digits(salt: str, n: int):
        h = F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(10**n),
        )
        return F.lpad(h.cast("string"), n, "0")

    p16 = _digits("pan|", 16)
    p15 = _digits("pan2|", 15)
    dashed = F.concat_ws(
        "-",
        F.substring(p16, 1, 4),
        F.substring(p16, 5, 4),
        F.substring(p16, 9, 4),
        F.substring(p16, 13, 4),
    )
    spaced = F.concat_ws(
        " ", F.substring(p15, 1, 4), F.substring(p15, 5, 6), F.substring(p15, 11, 5)
    )
    docs = d.select(
        "doc_id",
        F.concat(
            F.lit("doc "),
            F.col("doc_id").cast("string"),
            F.lit(" pay "),
            dashed,
            F.lit(" ref 12345678 alt "),
            spaced,
            F.lit(" end"),
        ).alias("text"),
    )
    return luhn_pan_audit(docs)


def q_source_lang_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell chi-square decomposition of the source x lang
    contingency table (datapipe/stats.chisq_cells) — the corpus-drift
    audit: which (source, language) cells run over/under the
    independence expectation, INCLUDING zero cells (a source that
    stops emitting a language still shows its deviation). Integer-exact
    in DECIMAL(38,0)/HUGEINT micro-units."""
    from docrawl_spark.datapipe.stats import chisq_cells

    docs = _t(spark, sf_dir, "documents")
    return chisq_cells(docs, "source", "lang")


def q_source_drift_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source drift ranking: exact integer sum of the source's
    chi2 cells (datapipe/stats.chisq_row_scores) — 'which source
    changed its language mix' in one number per source."""
    from docrawl_spark.datapipe.stats import chisq_row_scores

    docs = _t(spark, sf_dir, "documents")
    return chisq_row_scores(docs, "source", "lang")


def q_source_lang_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Gini impurity of the language mix in exact ppm
    (datapipe/stats.gini_impurity) — the diversity audit: impurity
    collapsing toward 0 flags a feed gone monolingual. Integer-exact
    (single truncating division on aggregated sums)."""
    from docrawl_spark.datapipe.stats import gini_impurity

    docs = _t(spark, sf_dir, "documents")
    return gini_impurity(docs, "source", "lang")


def q_rank_rbo_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap between two per-event-type user rankings —
    count-rank vs spend-rank (datapipe/search.rbo_overlap, exact
    integer RBO@10, p=0.9): the 'did the ranker change reorder
    anything' diagnostic. One equi-join on (query, item) + one
    HashAggregate via precomputed suffix weights — no per-depth pass."""
    from docrawl_spark.datapipe.search import rbo_overlap

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    per = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("vc").alias("s")
    )
    wa = Window.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("user_id").asc()
    )
    wb = Window.partitionBy("event_type").orderBy(
        F.col("s").desc(), F.col("user_id").asc()
    )
    a = per.select(
        "event_type", "user_id", F.row_number().over(wa).alias("rank")
    )
    b = per.select(
        "event_type", "user_id", F.row_number().over(wb).alias("rank")
    )
    return rbo_overlap(
        a, b, query_col="event_type", item_col="user_id", rank_col="rank",
        k=10, p_num=9, p_den=10,
    )


def q_vocab_source_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources in exact ppm
    (datapipe/text.group_vocab_jaccard) — the corpus-mixing audit:
    which feeds share a vocabulary. Inverted-index self-join on the
    token (pair fan-out bounded by #sources², never corpus²); sparse
    output (zero-overlap pairs absent)."""
    from docrawl_spark.datapipe.text import group_vocab_jaccard

    docs = _t(spark, sf_dir, "documents")
    return group_vocab_jaccard(docs, group_col="source", min_len=1)


def q_order_budget_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-constrained greedy selection
    (datapipe/sampling.greedy_budget_select) exercised on lineitem:
    per order, keep the best price-per-quantity lines while the
    cumulative quantity stays within 60 — the corpus analog is
    quality-per-byte selection under a per-source byte budget.
    Integer-exact ratio (cents * 2^20 div qty), deterministic
    linenumber tie-break."""
    from docrawl_spark.datapipe.sampling import greedy_budget_select

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("score_c"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    return greedy_budget_select(
        li,
        group_col="l_orderkey",
        id_col="l_linenumber",
        score_col="score_c",
        cost_col="qty",
        budget=60,
    ).withColumnRenamed("score", "score_c").withColumnRenamed("cost", "qty")


def q_events_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type early-vs-late-month distribution drift of value
    (datapipe/stats.rank_drift_stats): exact-integer Mann-Whitney
    AUC (P(early > late), ties half-credit, 500000 ppm = no drift)
    plus the exact KS two-sample statistic — the assumption-free 'did
    this metric's distribution move' audit. Values in centi-units;
    sample A = day-of-month <= 15."""
    from docrawl_spark.datapipe.stats import rank_drift_stats

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        (F.dayofmonth("ts") <= 15).alias("early"),
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    return rank_drift_stats(ev, "event_type", "early", "vc")


def q_events_cusum_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type CUSUM changepoint over daily event counts
    (datapipe/stats.cusum_changepoint): the day where the cumulative
    count deviates most from the uniform-rate line (exact integer
    numerator, ppm scale) — the 'when did the feed's rate shift'
    audit. date_trunc day grain (TIMESTAMP on both engines)."""
    from docrawl_spark.datapipe.stats import cusum_changepoint

    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", "ts").alias("day")
    )
    return cusum_changepoint(ev, "event_type", "day")


def q_docs_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the documents release slice over the
    (source, lang, size-KB bucket) quasi-identifier tuple
    (datapipe/stats.k_anonymity): for k in {2, 5, 10}, equivalence
    classes below k and rows at re-identification risk. NULL counts
    as a real quasi value."""
    from docrawl_spark.datapipe.stats import k_anonymity

    docs = _t(spark, sf_dir, "documents").select(
        "source", "lang", F.expr("n_chars div 1000").alias("size_kb")
    )
    return k_anonymity(docs, ["source", "lang", "size_kb"], [2, 5, 10])


def q_events_user_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz concentration curve of events over users
    (datapipe/stats.lorenz_deciles): exact cumulative event share
    (ppm) held by the bottom d/10 of users — the traffic-concentration
    / bot-dominance audit. Windows run over the count-value histogram
    (never the user dim), deciles range-join in."""
    from docrawl_spark.datapipe.stats import lorenz_deciles

    ev = _t(spark, sf_dir, "events").select("user_id")
    return lorenz_deciles(ev, "user_id")


def q_events_user_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini coefficient (ppm) of the per-user event-count
    allocation (datapipe/stats.gini_concentration) — the scalar
    inequality companion to events_user_lorenz, block-exact over the
    count histogram vs the oracle's textbook rank-weighted form."""
    from docrawl_spark.datapipe.stats import gini_concentration

    ev = _t(spark, sf_dir, "events").select("user_id")
    return gini_concentration(ev, "user_id")


def q_events_mk_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Mann-Kendall trend over daily event counts
    (datapipe/stats.mann_kendall_trend): exact S statistic and
    sign-symmetric tau-a ppm — the nonparametric 'is this feed's rate
    monotonically trending' audit (complements events_cusum_day's
    level-shift detector). Pair fan-out over the day DIM only."""
    from docrawl_spark.datapipe.stats import mann_kendall_trend

    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", "ts").alias("day")
    )
    return mann_kendall_trend(ev, "event_type", "day")


def q_events_daily_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type exact OLS trend slope of daily counts against
    the day rank (datapipe/stats.trend_ols): integer slope num/den
    plus sign-symmetric micro-slope — the 'rows per day per day' drift
    magnitude next to Mann-Kendall's direction."""
    from docrawl_spark.datapipe.stats import trend_ols

    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", "ts").alias("day")
    )
    return trend_ols(ev, "event_type", "day")


def q_events_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend-vs-weekday value-distribution drift per event_type:
    exact two-sample Kolmogorov-Smirnov distance in ppm over
    centi-quantized values (datapipe/stats.ks_two_sample) — the
    LOCATION drill-down next to events_value_drift's magnitude panel
    (rank_drift_stats: MW-AUC/KS/TV): this one names the centi-value
    where the cumulative gap peaks. Day-of-week derives from
    epoch-day mod 7 (day 0 = Thu 1970-01-01, so weekend Sat/Sun =
    {2, 3}) — engine-neutral, unlike dayofweek() whose origin differs
    between Spark (1=Sun) and DuckDB (0=Sun). ``ks_at`` is the
    smallest centi-value attaining the max gap."""
    from docrawl_spark.datapipe.stats import ks_two_sample

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') % 7"
            " IN (2, 3) AS INT)"
        ).alias("side"),
    )
    return ks_two_sample(ev, "event_type", "vc", "side")


def q_events_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Theil-Sen trend over daily counts on the REAL
    epoch-day axis (datapipe/stats.theil_sen_trend): median pairwise
    micro-slope, robust where one bot-storm day drags the OLS slope
    (events_daily_ols) arbitrarily. Pair fan-out over the day DIM
    only; doubled-domain median keeps it integer-exact cross-engine."""
    from docrawl_spark.datapipe.stats import theil_sen_trend

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.datediff(
            F.to_date("ts"), F.lit("1970-01-01").cast("date")
        ).alias("day_idx"),
    )
    return theil_sen_trend(ev, "event_type", "day_idx")


def q_contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised contrastive triplet mining over the embeddings table
    (datapipe/similarity.triplet_mining): per anchor, best same-label
    positive + hardest different-label negative from SRP hamming-1
    bucket candidates, with the margin-violation flag trainers sample
    first. Packed-BIGINT argmax keeps it one HashAggregate and
    hash-exact cross-engine."""
    from docrawl_spark.datapipe.similarity import triplet_mining

    return triplet_mining(_t(spark, sf_dir, "embeddings"), dim=64)


def q_host_status_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 host-dimension build (datapipe/intervals.
    scd2_intervals): per-host daily event-volume class observations
    (low/mid/high by daily count) collapsed gaps-and-islands style
    into versioned validity intervals (valid_from, valid_to, version,
    is_current) — how per-wave host observations become a warehouse
    dimension joinable AS OF any tick. Hosts simulated as user_id %
    50; day is the engine-neutral epoch-day index."""
    from docrawl_spark.datapipe.intervals import scd2_intervals

    daily = (
        _t(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .groupBy(
            (F.col("user_id") % 50).alias("host_id"),
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).alias("day_idx"),
        )
        .agg(F.count(F.lit(1)).alias("y"))
    )
    obs = daily.select(
        "host_id",
        "day_idx",
        F.when(F.col("y") < 5, "low")
        .when(F.col("y") < 9, "mid")
        .otherwise("high")
        .alias("volume_class"),
    )
    return scd2_intervals(obs, "host_id", "day_idx", "volume_class")


def q_events_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension time-travel: every event joined AS OF its day against
    the versioned SCD2 host dimension (q_host_status_scd2) via the
    bucketized interval join with the host as an extra equi-key
    (datapipe/intervals.overlap_join_bucketed keys=...) — the pattern
    that answers "what policy/state governed this fact when it
    happened" without a full-history window. Events are day-point
    intervals; the composite (host, bucket) shuffle key keeps hot days
    spread across hosts. Aggregated to per-class totals; every event
    lands in exactly one validity run by construction, so
    SUM(n_events) equals the event count — the exactly-once invariant
    the oracle re-checks with a BETWEEN join."""
    from docrawl_spark.datapipe.intervals import overlap_join_bucketed

    dim = q_host_status_scd2(spark, sf_dir).select(
        F.col("host_id").alias("dim_host"),
        "volume_class",
        "valid_from",
        "valid_to",
    )
    facts = (
        _t(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            (F.col("user_id") % 50).alias("f_host"),
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).alias("f_day"),
        )
    )
    joined = overlap_join_bucketed(
        facts,
        dim,
        "f_day",
        "f_day",
        "valid_from",
        "valid_to",
        bucket_width=8,
        keys=[("f_host", "dim_host")],
    )
    return joined.groupBy("volume_class").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("f_host", "f_day").alias("n_host_days"),
    )


def q_source_vocab_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-vocabulary overlap via KMV/theta sketches
    (functions/sketches.kmv_mins + kmv_pair_overlap, k=64): union /
    intersection / Jaccard ESTIMATES from k-minimum-values sketch
    algebra — the constant-memory twin of the exact
    vocab_source_jaccard inverted-index join (at 10^5 sources the
    exact token fan-out explodes; sketches keep 64 longs per source).
    Accuracy vs the exact query is property-tested in
    test_sketches_search.py; the oracle pins the sketch construction
    bit-for-bit (shared md5 60-bit hash)."""
    from docrawl_spark.datapipe.text import tokens_col
    from docrawl_spark.functions.sketches import kmv_mins, kmv_pair_overlap

    docs = _t(spark, sf_dir, "documents")
    toks = (
        docs.where(F.col("source").isNotNull() & F.col("text").isNotNull())
        .select(
            F.col("source").alias("src"),
            F.explode(tokens_col(F.col("text"))).alias("token"),
        )
        .where(F.length("token") >= 1)
    )
    mins = kmv_mins(toks, "src", "token", k=64)
    return kmv_pair_overlap(mins, k=64).select(
        F.col("g_a").alias("source_a"),
        F.col("g_b").alias("source_b"),
        "k_u",
        "theta",
        "inter_in_uk",
        "est_union",
        "jaccard_ppm",
        "est_inter",
    )


def q_docs_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-weighted systematic PPS sample of documents per source
    (datapipe/sampling.pps_systematic_sample, step=1000 chars):
    inclusion probability proportional to n_chars, zero randomness
    state, Horvitz-Thompson multiplicities in n_hits — the
    curation-time "sample 0.1% of bytes, not 0.1% of docs" primitive
    (doc-uniform sampling over-represents short docs in byte space).
    """
    from docrawl_spark.datapipe.sampling import pps_systematic_sample

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    out = pps_systematic_sample(
        docs, "source", "doc_id", "n_chars", step=1000
    )
    return out.select(
        "source",
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("cum_w").cast("long").alias("cum_w"),
        "n_hits",
    )


def q_docs_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l-diversity release audit over documents
    (datapipe/stats.l_diversity): quasi-identifier = (lang,
    100-char length bucket), sensitive attribute = source — how many
    quasi classes would reveal their members' source because every
    member shares it. The k-anonymity companion (docs_k_anonymity):
    size protects identity, diversity protects the attribute."""
    from docrawl_spark.datapipe.stats import l_diversity

    docs = _t(spark, sf_dir, "documents").select(
        "lang", F.expr("n_chars div 100").alias("len_bucket"), "source"
    )
    return l_diversity(docs, ["lang", "len_bucket"], "source", [2, 3, 5, 10])


def q_retrieval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-judged retrieval eval (datapipe/search.retrieval_mrr)
    over the SAME synthetic rankings/qrels as retrieval_ndcg: per
    query the first-relevant rank, reciprocal-rank ppm, hits@10 and
    textbook precision@10 — the metric pair (MRR for known-item,
    NDCG for graded) every retrieval stack reports together."""
    from pyspark.sql import Window

    from docrawl_spark.datapipe.search import retrieval_mrr

    d = _t(spark, sf_dir, "documents").select("doc_id")
    qd = d.select(
        "doc_id",
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("query_id"),
    )
    cand = qd.where(F.col("doc_id") % 5 == F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.md5(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit("|"),
                F.col("query_id").cast("string"),
            )
        ),
        F.col("doc_id"),
    )
    ranked = cand.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= 10
    )
    qrels = qd.where(F.col("doc_id") % 2 == 0).select(
        "query_id",
        "doc_id",
        ((F.col("doc_id") + F.col("query_id")) % 4).cast("int").alias("rel"),
    )
    return retrieval_mrr(ranked, qrels, k=10)


def q_session_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete session-survival table (datapipe/stats.discrete_hazard)
    over 30-min-gap session durations in whole minutes: per observed
    duration, at-risk/ended counts, hazard ppm (die NOW given
    survived here) and exact empirical survival ppm — constant hazard
    means geometric session decay; spikes mark timeout cliffs. Shares
    _with_session_ids, the one session definition."""
    from docrawl_spark.datapipe.stats import discrete_hazard

    sess = _with_session_ids(_t(spark, sf_dir, "events"))
    # ts is TIMESTAMP_NTZ in the parquet: ANSI forbids NTZ -> BIGINT
    # directly; route through TIMESTAMP like _with_session_ids does
    durs = sess.groupBy("user_id", "session_id").agg(
        F.expr(
            "(max(CAST(CAST(ts AS TIMESTAMP) AS LONG))"
            " - min(CAST(CAST(ts AS TIMESTAMP) AS LONG))) div 60"
        ).alias("duration_min")
    )
    return discrete_hazard(durs, "duration_min")


def q_warehouse_cdc_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-changelog apply (sources/storage.cdc_compact +
    cdc_apply): a deterministic I/U/D changelog over the documents
    content-signature table — two stacked updates (last-wins), late
    deletes (tombstone beats same-key updates by sequence), and
    fresh-key inserts — compacted to one op per key and applied to
    the base state. The batch twin of a streaming CDC sink; the
    oracle re-derives the final state relationally."""
    from docrawl_spark.sources.storage import cdc_apply

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.select("doc_id", F.md5("text").alias("sig"))
    u1 = docs.where(F.col("doc_id") % 7 == 0).select(
        "doc_id",
        F.md5(F.concat(F.col("text"), F.lit("v2"))).alias("sig"),
        F.lit("U").alias("op"),
        F.lit(1).alias("seq"),
    )
    u2 = docs.where(F.col("doc_id") % 14 == 0).select(
        "doc_id",
        F.md5(F.concat(F.col("text"), F.lit("v3"))).alias("sig"),
        F.lit("U").alias("op"),
        F.lit(2).alias("seq"),
    )
    dels = docs.where(F.col("doc_id") % 11 == 3).select(
        "doc_id",
        F.lit(None).cast("string").alias("sig"),
        F.lit("D").alias("op"),
        F.lit(3).alias("seq"),
    )
    ins = docs.where(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.md5(F.concat(F.col("text"), F.lit("new"))).alias("sig"),
        F.lit("I").alias("op"),
        F.lit(1).alias("seq"),
    )
    changelog = u1.unionByName(u2).unionByName(dels).unionByName(ins)
    return cdc_apply(base, changelog, ["doc_id"], "seq")


def q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution per funnel step pair (the time
    companion to events_funnel's counts): for users who progressed
    view→click and click→purchase under the same strictly-after step
    rule, the whole-second delta's NEAREST-RANK median and p90 —
    nearest-rank (value at rank ceil(q·n), pure integers) instead of
    interpolated percentiles, so both engines agree to the bit with
    no float quantile in sight. Epoch seconds truncate (Spark ts→long
    convention; oracle mirrors with floor(epoch()))."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.max("t1").alias("t1"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2.select("user_id", "t2"), "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"), F.max("t2").alias("t2"))
    )

    def _ep(c: str) -> str:
        return f"CAST(CAST({c} AS TIMESTAMP) AS LONG)"

    d12 = s2.select(
        F.lit("view_to_click").alias("pair"),
        F.expr(f"{_ep('t2')} - {_ep('t1')}").alias("delta_s"),
    )
    d23 = s3.select(
        F.lit("click_to_purchase").alias("pair"),
        F.expr(f"{_ep('t3')} - {_ep('t2')}").alias("delta_s"),
    )
    deltas = d12.unionByName(d23)
    wo = Window.partitionBy("pair").orderBy("delta_s")
    wp = Window.partitionBy("pair")
    r = deltas.select(
        "pair",
        "delta_s",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    return r.groupBy("pair").agg(
        F.max("n").cast("long").alias("n_users"),
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("delta_s"))
        )
        .cast("long")
        .alias("med_s"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(9 * n + 9) div 10"), F.col("delta_s")
            )
        )
        .cast("long")
        .alias("p90_s"),
    )


def q_linkpred_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-prediction evaluation: hold out a deterministic 20% of
    the co-citation fixture's edges (md5(src>dst) % 5), score
    Adamic-Adar on the TRAIN split only, label each scored pair
    positive iff a HELD-OUT source co-cites it, and report the exact
    Mann-Whitney AUC of the score separating future co-citations from
    non-co-citations (datapipe/stats.rank_drift_stats does the exact
    ROC-AUC with tie half-credit — this is the standard temporal
    link-prediction protocol, integer-exact end to end). AUC >> 0.5
    = AA predicts unseen co-citation structure."""
    from docrawl_spark.datapipe.graph import adamic_adar_pairs
    from docrawl_spark.datapipe.stats import rank_drift_stats

    e = _cocite_fixture_edges(spark, sf_dir).distinct()
    flag = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("src_host"), F.lit(">"), F.col("dst_host")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 5
        == 0
    )
    train = e.where(~flag)
    hd = e.where(flag)
    aa = adamic_adar_pairs(train, min_cocite=1)
    ha = hd.select(F.col("src_host").alias("s"), F.col("dst_host").alias("a"))
    hb = hd.select(F.col("src_host").alias("s"), F.col("dst_host").alias("b"))
    pos = (
        ha.join(hb, "s")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .withColumn("_pos", F.lit(True))
    )
    labeled = aa.join(pos, ["a", "b"], "left").select(
        F.lit("aa").alias("g"),
        F.coalesce(F.col("_pos"), F.lit(False)).alias("is_pos"),
        "aa_ppm",
    )
    return rank_drift_stats(labeled, "g", "is_pos", "aa_ppm").withColumnRenamed(
        "g", "model"
    )


def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style equi-depth statistics (datapipe/stats.
    equi_depth_histogram, k=8) over lineitem extended price in exact
    cents: nearest-rank bucket boundaries + exact per-bucket counts —
    the optimizer/skew-planner stats artifact (a bucket holding far
    more than n/k rows is the hot-value signal)."""
    from docrawl_spark.datapipe.stats import equi_depth_histogram

    li = _t(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )
    return equi_depth_histogram(li, "cents", k=8)


def q_kmv_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV estimator calibration per source: the k=64 sketch's
    distinct-token estimate vs the exact distinct count, with signed
    error ppm — the companion audit that tells an operator what the
    sketch's real error looks like on THEIR corpus before trusting
    overlap numbers (mirrors minhash_calibration for MinHash). Exact
    below k by construction; the estimate formula engages only when a
    source's vocabulary exceeds k."""
    from docrawl_spark.datapipe.stats import _signed_ppm
    from docrawl_spark.datapipe.text import tokens_col
    from docrawl_spark.functions.sketches import kmv_mins

    docs = _t(spark, sf_dir, "documents")
    toks = (
        docs.where(F.col("source").isNotNull() & F.col("text").isNotNull())
        .select(
            F.col("source").alias("src"),
            F.explode(tokens_col(F.col("text"))).alias("token"),
        )
        .where(F.length("token") >= 1)
    )
    mins = kmv_mins(toks, "src", "token", k=64)
    sk = mins.groupBy("g").agg(
        F.count(F.lit(1)).alias("k_u"), F.max("h").alias("theta")
    )
    est = sk.select(
        "g",
        F.when(F.col("k_u") < 64, F.col("k_u"))
        .otherwise(
            F.expr(
                f"CAST((k_u - 1) AS DECIMAL(38,0)) * {1 << 60} div theta"
            )
        )
        .cast("long")
        .alias("est_distinct"),
    )
    exact = toks.groupBy(F.col("src").alias("g")).agg(
        F.countDistinct("token").alias("n_exact")
    )
    out = est.join(exact, "g").withColumn(
        "err", F.col("est_distinct") - F.col("n_exact")
    )
    return out.select(
        F.col("g").alias("source"),
        F.col("n_exact").cast("long").alias("n_exact"),
        "est_distinct",
        F.expr(_signed_ppm("err", "n_exact")).cast("long").alias("err_ppm"),
    )


def q_events_day_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-gap (outage) detection per event type: days with NO
    events between two active days, as (gap_start, gap_end, gap_days)
    islands from a lead() over the active-day dim — the feed-outage
    audit a rate CUSUM smooths over. Only interior gaps count (before
    first / after last activity is unknown, not an outage)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.datediff(
            F.to_date("ts"), F.lit("1970-01-01").cast("date")
        ).alias("d"),
    )
    days = ev.where(
        F.col("event_type").isNotNull() & F.col("d").isNotNull()
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("d")
    gaps = days.select(
        "event_type", "d", F.lead("d").over(w).alias("next_d")
    ).where(F.col("next_d") > F.col("d") + 1)
    return gaps.select(
        "event_type",
        (F.col("d") + 1).cast("long").alias("gap_start"),
        (F.col("next_d") - 1).cast("long").alias("gap_end"),
        (F.col("next_d") - F.col("d") - 1).cast("long").alias("gap_days"),
    )


def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation over orders —
    the classic warehouse customer-scoring pattern, built on the
    SCALABLE NTILE (operators/ranking.with_ntile — three distributed
    range-sort quintiles, never a single-partition window): per
    customer the days since last order vs the corpus max date, order
    count, lifetime cents, and 1-5 quintile scores (5 = best: most
    recent / most frequent / highest spend) folded into the standard
    3-digit rfm_code. Oracle runs DuckDB's native NTILE(5) with the
    identical deterministic (metric, custkey) order — hash equality
    proves the distributed NTILE reproduces SQL semantics on all
    three metrics at once."""
    from docrawl_spark.operators.ranking import with_ntile

    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    ref = o.agg(F.max("o_orderdate").alias("_ref"))
    per = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("_last"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("monetary_c"),
        )
        .crossJoin(F.broadcast(ref))
        .withColumn(
            "recency_days",
            F.datediff(F.to_date("_ref"), F.to_date("_last")).cast("long"),
        )
        .drop("_ref", "_last")
    )
    per = with_ntile(per, ["recency_days", "o_custkey"], 5, "rb")
    per = with_ntile(per, ["frequency", "o_custkey"], 5, "fb")
    per = with_ntile(per, ["monetary_c", "o_custkey"], 5, "mb")
    return per.select(
        "o_custkey",
        "recency_days",
        F.col("frequency").cast("long").alias("frequency"),
        "monetary_c",
        (6 - F.col("rb")).cast("int").alias("r_score"),
        F.col("fb").cast("int").alias("f_score"),
        F.col("mb").cast("int").alias("m_score"),
        ((6 - F.col("rb")) * 100 + F.col("fb") * 10 + F.col("mb"))
        .cast("int")
        .alias("rfm_code"),
    )


def q_parts_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) inventory classification over part revenue: parts
    ranked by lineitem revenue (cents, desc), cumulative share in
    exact ppm, class A while cum <= 80%, B to 95%, C beyond — the
    classic "which 20% of parts carry 80% of revenue" warehouse op
    (the CLASSIFICATION companion to events_user_lorenz's curve).
    Boundary rule pinned integer-exact: class by the cumulative ppm
    AT the part's own rank (a part straddling a boundary lands in the
    lower class). Window runs over the PART DIM ranked by revenue —
    dim-sized, deterministic (revenue desc, partkey asc)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        )
        .cast("long")
        .alias("rev_c"),
    )
    per = li.groupBy("l_partkey").agg(F.sum("rev_c").alias("revenue_c"))
    w = (
        Window.orderBy(F.col("revenue_c").desc(), F.col("l_partkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = per.agg(F.sum("revenue_c").alias("_t"))
    ranked = per.crossJoin(F.broadcast(tot)).select(
        "l_partkey",
        F.col("revenue_c").cast("long").alias("revenue_c"),
        F.expr("CAST(1 AS BIGINT)").alias("_one"),
        F.sum("revenue_c").over(w).alias("_cum"),
        F.col("_t"),
    )
    cum_ppm = F.expr("CAST(_cum AS DECIMAL(38,0)) * 1000000 div _t")
    return ranked.select(
        "l_partkey",
        "revenue_c",
        cum_ppm.cast("long").alias("cum_ppm"),
        F.when(cum_ppm <= 800000, "A")
        .when(cum_ppm <= 950000, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


def q_events_rate_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type index of dispersion (Fano factor) of daily
    event counts over the integer day-index span, zero days included
    (datapipe/stats.dispersion_stats): ~1e6 ppm = Poisson-like
    arrivals, >>1e6 = bursty bot storms / batch re-feeds."""
    from docrawl_spark.datapipe.stats import dispersion_stats

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.datediff(
            F.to_date("ts"), F.lit("1970-01-01").cast("date")
        ).alias("day_idx"),
    )
    return dispersion_stats(ev, "event_type", "day_idx")


def q_lineitem_price_wmedian(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag quantity-weighted median of the lineitem price
    in cents (datapipe/stats.weighted_quantile): the price below
    which half the shipped QUANTITY sits (vs the row median's half
    the lines) — the corpus analog is the doc size below which half
    the corpus BYTES sit. Cross-multiplied threshold, integer-exact."""
    from docrawl_spark.datapipe.stats import weighted_quantile

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_c"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    return weighted_quantile(
        li, "l_returnflag", "price_c", "qty", q_num=1, q_den=2
    )


def q_docs_rater_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Cohen's kappa between two cheap binary quality
    raters (datapipe/stats.agreement_kappa) — rater A = char-length
    gate (n_chars > 400), rater B = word-count gate (> 60 spaces):
    the chance-corrected 'do the filters agree' audit run before
    swapping one quality gate for another. Exact ppm, sign-symmetric
    (negative kappa = below-chance agreement)."""
    from docrawl_spark.datapipe.stats import agreement_kappa

    docs = _t(spark, sf_dir, "documents").where(
        F.col("n_chars").isNotNull() & F.col("text").isNotNull()
    )
    rated = docs.select(
        "source",
        (F.col("n_chars") > 400).cast("int").alias("a"),
        (
            F.length("text") - F.length(F.expr("replace(text, ' ', '')"))
            > 60
        )
        .cast("int")
        .alias("b"),
    )
    return agreement_kappa(rated, "source", "a", "b")


def q_events_weekly_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type lag-7 autocorrelation of daily event counts
    (datapipe/stats.autocorr_lag) — the weekly-seasonality audit:
    r2_signed_ppm near +1e6 means the feed breathes on a weekly
    cycle; zero days inside the span count as zeros (a Mondays-only
    feed IS perfectly weekly). Exact signed squared Pearson over the
    aligned pairs; integer day index from the epoch (datediff ≡
    DuckDB date_diff on dates)."""
    from docrawl_spark.datapipe.stats import autocorr_lag

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.datediff(
            F.to_date("ts"), F.lit("1970-01-01").cast("date")
        ).alias("day_idx"),
    )
    return autocorr_lag(ev, "event_type", "day_idx", lag=7)


def q_docs_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile of the documents snapshot
    (datapipe/audit.column_profile): per column, rows / nulls / exact
    distinct count / min-max — the 'what actually landed' audit run
    on every new ingest (n_distinct(lang) exploding flags a broken
    tagger). One agg, stack() unpivot; exact distinct here (the
    oracle-checkable form), approx_count_distinct on the 100 TB path."""
    from docrawl_spark.datapipe.audit import column_profile

    docs = _t(spark, sf_dir, "documents")
    return column_profile(
        docs, ["doc_id", "text", "lang", "source", "n_chars"]
    )


def q_ref_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the warehouse FK edges
    (datapipe/audit.fk_orphan_audit): orphan row counts for
    lineitem→orders/part/supplier, orders→customer, customer→nation.
    Non-zero orphans = corrupt upstream snapshot. Anti-join on key
    dims, orphans weighted by fact multiplicity."""
    from docrawl_spark.datapipe.audit import fk_orphan_audit

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    return fk_orphan_audit(
        [
            ("lineitem_orders", li, "l_orderkey", orders, "o_orderkey"),
            ("lineitem_part", li, "l_partkey",
             _t(spark, sf_dir, "part"), "p_partkey"),
            ("lineitem_supplier", li, "l_suppkey",
             _t(spark, sf_dir, "supplier"), "s_suppkey"),
            ("orders_customer", orders, "o_custkey",
             _t(spark, sf_dir, "customer"), "c_custkey"),
            ("customer_nation", _t(spark, sf_dir, "customer"), "c_nationkey",
             _t(spark, sf_dir, "nation"), "n_nationkey"),
        ]
    )


def q_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the hashed linear quality classifier
    (datapipe/classifier.calibration_bins) against the char-length
    gate as reference label: mean feature weight mapped to a [0,1e6]
    ppm confidence (weights are uniform in ±1000 milli-units, so
    conf = (score_fp + 1000·n_feats)·500 div n_feats — numerator
    non-negative, cross-engine-safe truncation), decile bins, exact
    per-bin accuracy / mean-confidence / gap / ECE numerator. The
    'is the score honest before it gates admission' audit."""
    from docrawl_spark.datapipe.classifier import (
        calibration_bins,
        linear_quality_scores,
        synthetic_weights,
    )

    docs = _docs_par(spark, sf_dir)
    w = synthetic_weights(spark, n_buckets=512, seed=3)
    scores = linear_quality_scores(docs, w, n_buckets=512, threshold_fp=50)
    chars = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    conf = (
        scores.where(F.col("n_feats") > 0)
        .join(chars, "doc_id")
        .where(F.col("n_chars").isNotNull())
        .select(
            F.least(
                F.lit(1000000).cast("long"),
                F.greatest(
                    F.lit(0).cast("long"),
                    F.expr(
                        "(score_fp + 1000 * n_feats) * 500 div n_feats"
                    ),
                ),
            ).alias("conf_ppm"),
            (F.col("n_chars") > 400).alias("label"),
        )
    )
    return calibration_bins(conf, "conf_ppm", "label", n_bins=10)


def q_shard_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resharding movement audit 8→10 shards over documents
    (datapipe/audit.rebalance_audit): exact fraction of the corpus
    that moves under mod-hash (~80%) vs rendezvous/HRW hashing
    (~20%, the minimal-movement bound) — the quantified argument for
    consistent placement before resharding 100 TB. Packed-BIGINT
    HashAggregate argmax, explode ×10 fan-out, no window."""
    from docrawl_spark.datapipe.audit import rebalance_audit

    docs = _t(spark, sf_dir, "documents")
    return rebalance_audit(docs, "doc_id", n_old=8, n_new=10)


def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch vs last-touch conversion attribution: for every
    'purchase' event, the earliest and the most recent preceding
    non-purchase event_type by the same user (running
    first/last-ignore-nulls carries over (ts, event_id) order — the
    cross-engine-exact IGNORE NULLS window pair), rolled up to
    (model, touch_type, n_conversions). Conversions with no preceding
    touch attribute to 'none'. Per-user windows — partition size is a
    user's history, never the corpus."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
        # event_id is the order tiebreaker: Spark sorts NULLS FIRST,
        # DuckDB NULLS LAST — exclude nulls so the carry agrees
        & F.col("event_id").isNotNull()
    ).select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") != "purchase", F.col("event_type")).alias(
            "touch"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ev.select(
        "event_type",
        F.first("touch", ignorenulls=True).over(w).alias("first_touch"),
        F.last("touch", ignorenulls=True).over(w).alias("last_touch"),
    ).where(F.col("event_type") == "purchase")
    first = carried.select(
        F.lit("first").alias("model"),
        F.coalesce("first_touch", F.lit("none")).alias("touch_type"),
    )
    last = carried.select(
        F.lit("last").alias("model"),
        F.coalesce("last_touch", F.lit("none")).alias("touch_type"),
    )
    return (
        first.unionByName(last)
        .groupBy("model", "touch_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_conversions"))
    )


# Names the external driver has already hash-checked in rounds 1-3
# (union of CORRECTNESS_r01..r03 keys). The driver samples ~50 queries
# per round IN REGISTRY ORDER, so queries() enumerates the frontier
# sentinels first, then the three freshly-oracled xxhash scale paths,
# then every never-driver-checked name, then the rest — rotating
# first-time coverage to the front each round (VERDICT r3 item 4).
_DRIVER_CHECKED: frozenset[str] = frozenset([
    'bpe_pair_stats',
    'char_runs',
    'customer_intersect',
    'customer_semijoin',
    'customer_set_ops',
    'decontaminate_overlap',
    'doc_keywords',
    'embedding_neardup',
    'embedding_topk',
    'events_asof_order',
    'events_cube',
    'events_hourly',
    'events_json_props',
    'events_session_window',
    'events_sessionize',
    'events_type_pivot',
    'events_value_quantiles',
    'exact_dedup_docs',
    'extract_matrix',
    'fetch_cookies',
    'fetch_headers',
    'fetch_json_requests',
    'frontier_candidates',
    'frontier_host_metrics',
    'frontier_politeness_topk',
    'frontier_seen_antijoin',
    'gopher_repetition',
    'host_components',
    'host_pagerank',
    'host_seed_distance',
    'langid',
    'line_dedup_docs',
    'minhash_band_minima',
    'minhash_lsh_pairs',
    'minhash_lsh_pairs_md5',
    'neardup_best_reps',
    'neardup_components',
    'neardup_dedup_docs',
    'ngram_containment_pairs',
    'ngram_jaccard_pairs',
    'oov_rates',
    'order_ship_lag',
    'orders_date_parts',
    'pagination_chains',
    'pq_codes',
    'pricing_summary',
    'quality_scores',
    'revenue_by_nation',
    'revenue_rollup',
    'robots_change_impact',
    'robots_gate',
    'script_mix',
    'seed_normalize_quirk',
    'semantic_clusters',
    'semantic_dedup_docs',
    'shipping_priority',
    'simhash_neardup',
    'simhash_neardup_md5',
    'sitemap_coverage',
    'soft404_pages',
    'source_lang_map',
    'token_counts',
    'top_parts_per_brand',
    'url_dedup_normalize',
    'vocab_growth',
    'vocab_top_tokens',
    'winnow_fingerprints',
    'winnow_fingerprints_md5',
    'within_wave_dedup',
    'zorder_keys'
])

# always enumerated first: the crawl-engine sentinels plus the three
# xxhash scale paths whose brand-new side-table oracles need a driver
# CORRECTNESS row to retire their historical `no_oracle` status
_PINNED_FIRST = [
    "frontier_candidates",
    "frontier_seen_antijoin",
    "frontier_politeness_topk",
    "frontier_host_metrics",
    "minhash_lsh_pairs",
    "simhash_neardup",
    "winnow_fingerprints",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    alls = _all_queries()
    order = list(_PINNED_FIRST)
    order += [
        n for n in alls
        if n not in order and n not in _DRIVER_CHECKED
    ]
    order += [n for n in alls if n not in order]
    return {n: alls[n] for n in order}


def _all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "frontier_candidates": q_frontier_candidates,
        "frontier_seen_antijoin": q_frontier_seen_antijoin,
        "frontier_politeness_topk": q_frontier_politeness_topk,
        "frontier_host_metrics": q_frontier_host_metrics,
        "seed_normalize_quirk": q_seed_normalize_quirk,
        "robots_gate": q_robots_gate,
        "within_wave_dedup": q_within_wave_dedup,
        "pricing_summary": q_pricing_summary,
        "revenue_by_nation": q_revenue_by_nation,
        "top_parts_per_brand": q_top_parts_per_brand,
        "events_hourly": q_events_hourly,
        "exact_dedup_docs": q_exact_dedup_docs,
        "token_counts": q_token_counts,
        "langid": q_langid,
        "quality_scores": q_quality_scores,
        "gopher_repetition": q_gopher_repetition,
        "decontaminate_overlap": q_decontaminate_overlap,
        "vocab_top_tokens": q_vocab_top_tokens,
        "doc_keywords": q_doc_keywords,
        "bpe_pair_stats": q_bpe_pair_stats,
        "ngram_containment_pairs": q_ngram_containment_pairs,
        "script_mix": q_script_mix,
        "pagination_chains": q_pagination_chains,
        "host_seed_distance": q_host_seed_distance,
        "zorder_keys": q_zorder_keys,
        "robots_change_impact": q_robots_change_impact,
        "sitemap_coverage": q_sitemap_coverage,
        "soft404_pages": q_soft404_pages,
        "host_components": q_host_components,
        "minhash_band_minima": q_minhash_band_minima,
        "embedding_topk": q_embedding_topk,
        "fetch_headers": q_fetch_headers,
        "fetch_cookies": q_fetch_cookies,
        "fetch_json_requests": q_fetch_json_requests,
        "extract_matrix": q_extract_matrix,
        "o4_txt_render": q_o4_txt_render,
        "o5_txt_render": q_o5_txt_render,
        "embedding_neardup": q_embedding_neardup,
        "semantic_clusters": q_semantic_clusters,
        "semantic_dedup_docs": q_semantic_dedup_docs,
        "pq_codes": q_pq_codes,
        "oov_rates": q_oov_rates,
        "simhash_neardup": q_simhash_neardup,
        "simhash_neardup_md5": q_simhash_neardup_md5,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "minhash_lsh_pairs_md5": q_minhash_lsh_pairs_md5,
        "neardup_components": q_neardup_components,
        "neardup_dedup_docs": q_neardup_dedup_docs,
        "neardup_best_reps": q_neardup_best_reps,
        "vocab_growth": q_vocab_growth,
        "char_runs": q_char_runs,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "winnow_fingerprints": q_winnow_fingerprints,
        "winnow_fingerprints_md5": q_winnow_fingerprints_md5,
        "events_cube": q_events_cube,
        "source_lang_map": q_source_lang_map,
        "events_json_props": q_events_json_props,
        "orders_date_parts": q_orders_date_parts,
        "order_ship_lag": q_order_ship_lag,
        "events_sessionize": q_events_sessionize,
        "events_session_window": q_events_session_window,
        "events_asof_order": q_events_asof_order,
        "events_type_pivot": q_events_type_pivot,
        "customer_set_ops": q_customer_set_ops,
        "customer_intersect": q_customer_intersect,
        "customer_semijoin": q_customer_semijoin,
        "events_value_quantiles": q_events_value_quantiles,
        "events_mad_outliers": q_events_mad_outliers,
        "events_funnel": q_events_funnel,
        "events_transitions": q_events_transitions,
        "doc_length_ntiles": q_doc_length_ntiles,
        "events_unpivot": q_events_unpivot,
        "events_retention": q_events_retention,
        "events_grouping_sets": q_events_grouping_sets,
        "events_moving_sum": q_events_moving_sum,
        "source_sample_k": q_source_sample_k,
        "session_paths": q_session_paths,
        "session_associations": q_session_associations,
        "label_centroid_sim": q_label_centroid_sim,
        "shipping_priority": q_shipping_priority,
        "revenue_rollup": q_revenue_rollup,
        "host_pagerank": q_host_pagerank,
        "line_dedup_docs": q_line_dedup_docs,
        "url_dedup_normalize": q_url_dedup_normalize,
        "clean_text": q_clean_text,
        "doc_length_outliers": q_doc_length_outliers,
        "corpus_sample_mix": q_corpus_sample_mix,
        "corpus_split": q_corpus_split,
        "robots_rfc_gate": q_robots_rfc_gate,
        "sitemap_entries": q_sitemap_entries,
        "sitemap_index_entries": q_sitemap_index_entries,
        "crawl_delay_budgets": q_crawl_delay_budgets,
        "anchor_terms": q_anchor_terms,
        "pii_scrub": q_pii_scrub,
        "sitemap_discovery": q_sitemap_discovery,
        "temperature_mix": q_temperature_mix,
        "temperature_resample": q_temperature_resample,
        "change_rate_recrawl": q_change_rate_recrawl,
        "corpus_filter_pipeline": q_corpus_filter_pipeline,
        "trap_signatures": q_trap_signatures,
        "trap_gate_survivors": q_trap_gate_survivors,
        "politeness_schedule": q_politeness_schedule,
        "events_sessions": q_events_sessions,
        "redirect_resolution": q_redirect_resolution,
        "dust_clusters": q_dust_clusters,
        "mirror_hosts": q_mirror_hosts,
        "revalidation_wave": q_revalidation_wave,
        "adaptive_delays": q_adaptive_delays,
        "frontier_priority": q_frontier_priority,
        "hll_registers": q_hll_registers,
        "hll_estimate": q_hll_estimate,
        "hll_host_cardinality": q_hll_host_cardinality,
        "hll_union_estimate": q_hll_union_estimate,
        "events_rolling_distinct": q_events_rolling_distinct,
        "bloom_fpr_audit": q_bloom_fpr_audit,
        "cms_hot_hosts": q_cms_hot_hosts,
        "bm25_search": q_bm25_search,
        "snapshot_diff": q_snapshot_diff,
        "hybrid_search": q_hybrid_search,
        "corpus_shard_manifest": q_corpus_shard_manifest,
        "latency_histogram": q_latency_histogram,
        "latency_percentiles": q_latency_percentiles,
        "incremental_rollup": q_incremental_rollup,
        "host_hits": q_host_hits,
        "registrable_domains": q_registrable_domains,
        "frontier_fairness": q_frontier_fairness,
        "media_sniff": q_media_sniff,
        "substring_dup_spans": q_substring_dup_spans,
        "substring_dedup_docs": q_substring_dedup_docs,
        "lm_bits_score": q_lm_bits_score,
        "phrase_search": q_phrase_search,
        "doc_chunks": q_doc_chunks,
        "pack_manifest": q_pack_manifest,
        "waterfill_budgets": q_waterfill_budgets,
        "host_template_lines": q_host_template_lines,
        "host_template_strip": q_host_template_strip,
        "host_lang_profile": q_host_lang_profile,
        "robots_refetch": q_robots_refetch,
        "host_opic": q_host_opic,
        "host_reciprocity": q_host_reciprocity,
        "feed_entries": q_feed_entries,
        "robots_meta": q_robots_meta,
        "http_cache_plan": q_http_cache_plan,
        "charset_sniff": q_charset_sniff,
        "circuit_breaker": q_circuit_breaker,
        "content_blocks": q_content_blocks,
        "main_text": q_main_text,
        "pmi_collocations": q_pmi_collocations,
        "canonical_clusters": q_canonical_clusters,
        "host_trustrank": q_host_trustrank,
        "snapshot_change": q_snapshot_change,
        "robots_agent_groups": q_robots_agent_groups,
        "corpus_mix_report": q_corpus_mix_report,
        "path_prefix_profile": q_path_prefix_profile,
        "lang_metadata_audit": q_lang_metadata_audit,
        "robots_full_gate": q_robots_full_gate,
        "percent_normalize": q_percent_normalize,
        "retry_after": q_retry_after,
        "html_unescape": q_html_unescape,
        "hreflang_alternates": q_hreflang_alternates,
        "url_templates": q_url_templates,
        "c4_line_filters": q_c4_line_filters,
        "dsir_weights": q_dsir_weights,
        "outlink_diversity": q_outlink_diversity,
        "fetch_shards": q_fetch_shards,
        "clean_param_urls": q_clean_param_urls,
        "structured_data": q_structured_data,
        "postings_gaps": q_postings_gaps,
        "cocitation_pairs": q_cocitation_pairs,
        "adamic_adar_pairs": q_adamic_adar_pairs,
        "wand_bounds": q_wand_bounds,
        "domain_caps": q_domain_caps,
        "surt_keys": q_surt_keys,
        "link_headers": q_link_headers,
        "hreflang_recip": q_hreflang_recip,
        "ip_budgets": q_ip_budgets,
        "semantic_decontam": q_semantic_decontam,
        "dedup_threshold_sweep": q_dedup_threshold_sweep,
        "delay_compliance": q_delay_compliance,
        "sitemap_images": q_sitemap_images,
        "ucb_allocation": q_ucb_allocation,
        "retrieval_ndcg": q_retrieval_ndcg,
        "blocklist_filter": q_blocklist_filter,
        "domain_leakage": q_domain_leakage,
        "margin_bitext": q_margin_bitext,
        "crawl_completeness": q_crawl_completeness,
        "cdc_chunks": q_cdc_chunks,
        "bpe_merges": q_bpe_merges,
        "prefix_jaccard_pairs": q_prefix_jaccard_pairs,
        "lsh_recall_eval": q_lsh_recall_eval,
        "hyperball_nf": q_hyperball_nf,
        "harmonic_centrality": q_harmonic_centrality,
        "bpe_encode_stats": q_bpe_encode_stats,
        "host_communities": q_host_communities,
        "bowtie_classes": q_bowtie_classes,
        "media_captions": q_media_captions,
        "effective_diameter": q_effective_diameter,
        "host_triangles": q_host_triangles,
        "kcore_members": q_kcore_members,
        "doc_sections": q_doc_sections,
        "quality_classifier": q_quality_classifier,
        "ktruss_edges": q_ktruss_edges,
        "readability": q_readability,
        "degree_assortativity": q_degree_assortativity,
        "strand_pairs": q_strand_pairs,
        "lsh_incremental_probe": q_lsh_incremental_probe,
        "benford_events": q_benford_events,
        "host_novelty": q_host_novelty,
        "minhash_calibration": q_minhash_calibration,
        "component_histogram": q_component_histogram,
        "section_filter": q_section_filter,
        "snm_pairs": q_snm_pairs,
        "host_walks": q_host_walks,
        "host_coreness": q_host_coreness,
        "neardup_cluster_histogram": q_neardup_cluster_histogram,
        "orders_transit_weeks": q_orders_transit_weeks,
        "typo_alias_pairs": q_typo_alias_pairs,
        "skyline_parts": q_skyline_parts,
        "events_trimmed_stats": q_events_trimmed_stats,
        "events_bootstrap_ci": q_events_bootstrap_ci,
        "events_bootstrap_median": q_events_bootstrap_median,
        "pan_luhn_audit": q_pan_luhn_audit,
        "source_lang_chisq": q_source_lang_chisq,
        "source_drift_scores": q_source_drift_scores,
        "vocab_source_jaccard": q_vocab_source_jaccard,
        "order_budget_lines": q_order_budget_lines,
        "source_lang_gini": q_source_lang_gini,
        "rank_rbo_events": q_rank_rbo_events,
        "events_value_drift": q_events_value_drift,
        "events_cusum_day": q_events_cusum_day,
        "docs_k_anonymity": q_docs_k_anonymity,
        "events_user_lorenz": q_events_user_lorenz,
        "events_user_gini": q_events_user_gini,
        "events_mk_trend": q_events_mk_trend,
        "events_daily_ols": q_events_daily_ols,
        "events_ks_drift": q_events_ks_drift,
        "events_theilsen_trend": q_events_theilsen_trend,
        "host_status_scd2": q_host_status_scd2,
        "contrastive_triplets": q_contrastive_triplets,
        "events_scd2_asof": q_events_scd2_asof,
        "source_vocab_kmv": q_source_vocab_kmv,
        "docs_pps_sample": q_docs_pps_sample,
        "docs_l_diversity": q_docs_l_diversity,
        "retrieval_mrr": q_retrieval_mrr,
        "session_hazard": q_session_hazard,
        "warehouse_cdc_state": q_warehouse_cdc_state,
        "funnel_latency": q_funnel_latency,
        "linkpred_eval": q_linkpred_eval,
        "price_histogram": q_price_histogram,
        "kmv_calibration": q_kmv_calibration,
        "events_day_gaps": q_events_day_gaps,
        "customer_rfm": q_customer_rfm,
        "parts_abc_classes": q_parts_abc_classes,
        "events_rate_dispersion": q_events_rate_dispersion,
        "lineitem_price_wmedian": q_lineitem_price_wmedian,
        "docs_rater_kappa": q_docs_rater_kappa,
        "events_weekly_autocorr": q_events_weekly_autocorr,
        "docs_profile": q_docs_profile,
        "ref_integrity": q_ref_integrity,
        "classifier_calibration": q_classifier_calibration,
        "shard_rebalance": q_shard_rebalance,
        "events_attribution": q_events_attribution,
    }


# hashed linear classifier scoring CTE — shared by the
# quality_classifier and classifier_calibration oracles (identical
# tokens/buckets/weights by construction)
_CLF_SCORED_CTE = r"""
            WITH toks AS (
              SELECT doc_id, t[i] AS tok
              FROM (SELECT doc_id,
                           string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS t
                    FROM documents),
                   UNNEST(range(1, len(t) + 1)) AS u(i)
              WHERE t[i] <> ''),
            feats AS (
              SELECT doc_id,
                     ('0x' || substr(md5(tok), 1, 15))::BIGINT % 512 AS bucket
              FROM toks),
            w AS (
              SELECT b AS bucket,
                     ('0x' || substr(md5('w:3:' || CAST(b AS VARCHAR)), 1, 15))::BIGINT
                       % 2001 - 1000 AS weight_fp
              FROM UNNEST(range(0, 512)) AS t(b)),
            scored AS (
              SELECT f.doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
                     CAST(SUM(w.weight_fp) AS BIGINT) AS score_fp
              FROM feats f JOIN w USING (bucket) GROUP BY f.doc_id)
"""


_JACCARD_PAIRS_SQL = r"""
            -- mine (MinHash-LSH md5 mode, same params as the Spark
            -- entry: 8 hashes, 4 bands x 2 rows, 3-gram shingles) ...
            WITH toks AS (
              SELECT doc_id,
                     string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS t
              FROM documents),
            sh3 AS (
              SELECT DISTINCT doc_id, s
              FROM toks,
                   UNNEST(list_transform(range(1, GREATEST(len(t) - 2, 0) + 1),
                                         i -> array_to_string(t[i:i+2], ' '))) AS u(s)
              WHERE len(t) >= 3),
            seeds AS (SELECT UNNEST(range(0, 8)) AS seed),
            sig AS (
              SELECT doc_id, seed,
                     MIN(substr(md5(CAST(seed AS VARCHAR) || '|' || s), 1, 15)) AS mh
              FROM sh3, seeds GROUP BY doc_id, seed),
            bands AS (
              SELECT doc_id, CAST(seed // 2 AS INT) AS band_idx,
                     string_agg(mh, ',' ORDER BY seed) AS band_key
              FROM sig GROUP BY doc_id, band_idx),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM bands a JOIN bands b USING (band_idx, band_key)
              WHERE a.doc_id < b.doc_id),
            -- ... then verify: exact 2-gram Jaccard on candidates only
            d AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, GREATEST(len(t) - 1, 0) + 1),
                       i -> array_to_string(t[i:i+1], ' '))) AS sh
              FROM toks)
            SELECT c.id_a, c.id_b,
                   ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                         / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
            FROM cand c
            JOIN d a ON a.doc_id = c.id_a
            JOIN d b ON b.doc_id = c.id_b
            WHERE ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                  / len(list_distinct(list_concat(a.sh, b.sh))), 6) >= 0.05
        """


def _rbo_oracle(k: int = 10, p_num: int = 9, p_den: int = 10) -> str:
    """DuckDB mirror of datapipe/search.rbo_overlap over the events
    count-rank vs spend-rank pair — the suffix weights are the SAME
    pure-Python exact integers the Spark operator bakes in."""
    from math import lcm

    big_l = lcm(*range(1, k + 1))
    d_scale = p_den**k * big_l
    w = [
        (p_den - p_num) * p_num ** (d - 1) * p_den ** (k - d) * (big_l // d)
        for d in range(1, k + 1)
    ]
    suffix = [sum(w[m:]) for m in range(k)]
    arr = "[" + ", ".join(f"{s}::HUGEINT" for s in suffix) + "]"
    return f"""
            WITH per AS (
              SELECT event_type, user_id, COUNT(*) AS n,
                     SUM(CAST(ROUND(value * 100) AS BIGINT)) AS s
              FROM events GROUP BY 1, 2),
            a AS (
              SELECT event_type, user_id,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                                        ORDER BY n DESC, user_id) AS ra
              FROM per),
            b AS (
              SELECT event_type, user_id,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                                        ORDER BY s DESC, user_id) AS rb
              FROM per),
            j AS (
              SELECT a.event_type,
                     GREATEST(a.ra, b.rb) AS dm
              FROM a JOIN b ON a.event_type = b.event_type
                           AND a.user_id = b.user_id
              WHERE a.ra <= {k} AND b.rb <= {k})
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_common,
                   CAST((SUM(({arr})[dm]) * 1000000) // {d_scale}
                        AS BIGINT) AS rbo_ppm
            FROM j GROUP BY event_type
        """


_CHISQ_CELLS_SQL = """
            WITH facts AS (
              SELECT source AS r, lang AS c FROM documents
              WHERE source IS NOT NULL AND lang IS NOT NULL),
            cells AS (SELECT r, c, COUNT(*) AS o FROM facts GROUP BY r, c),
            rows_m AS (SELECT r, SUM(o) AS rt FROM cells GROUP BY r),
            cols_m AS (SELECT c, SUM(o) AS ct FROM cells GROUP BY c),
            tot AS (SELECT SUM(rt) AS n FROM rows_m),
            full_t AS (
              SELECT rm.r, cm.c, COALESCE(cl.o, 0) AS o, rm.rt, cm.ct, t.n
              FROM rows_m rm CROSS JOIN cols_m cm
              LEFT JOIN cells cl ON cl.r = rm.r AND cl.c = cm.c
              CROSS JOIN tot t),
            d AS (
              SELECT r, c, o, rt, ct, n,
                     CAST(o AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct
                       AS diff
              FROM full_t),
            chisq_cells AS (
              SELECT r AS source, c AS lang,
                     CAST(o AS BIGINT) AS observed,
                     CAST((CAST(rt AS HUGEINT) * ct * 1000000) // n
                          AS BIGINT) AS expected_micro,
                     CAST((diff * diff * 1000000)
                          // (CAST(n AS HUGEINT) * rt * ct)
                          AS BIGINT) AS chi2_cell_micro
              FROM d)
        """


def oracle_sql() -> dict[str, str]:
    import os

    from docrawl_spark.datapipe.export import zorder_sql_expr

    # xxhash64 side tables (see _ensure_oracle_aux): the oracle runs at
    # the driver's sf (0.01 / ORACLE_SF_DIR) — the matching Spark query
    # materializes these paths when it runs, always before the oracle.
    _aux = _oracle_aux_dir(os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01"))
    _tokhash = f"{_aux}/tokhash_v1.parquet/*.parquet"
    _mh_tokhash = f"{_aux}/mh_tokhash_v1_h32k3.parquet/*.parquet"
    _mh_bandkey = f"{_aux}/mh_bandkey_v1_h32b16k3.parquet/*.parquet"

    return {
        "frontier_candidates": f"""
            SELECT doc_id, url, host, path FROM ({_DOC_URLS_SQL})
        """,
        "frontier_seen_antijoin": f"""
            SELECT doc_id, url, host FROM ({_DOC_URLS_SQL}) u
            WHERE NOT EXISTS (
              SELECT 1 FROM ({_DOC_URLS_SQL}) s
              WHERE s.doc_id % 3 = 0 AND s.url = u.url)
        """,
        "frontier_politeness_topk": f"""
            SELECT host, doc_id, n_chars, rn FROM (
              SELECT host, doc_id, n_chars,
                     ROW_NUMBER() OVER (PARTITION BY host
                                        ORDER BY n_chars DESC, doc_id ASC) AS rn
              FROM ({_DOC_URLS_SQL})) WHERE rn <= 3
        """,
        "extract_matrix": r"""
            WITH t AS (
              SELECT doc_id, source,
                     string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS tk,
                     'https://' || source || '.test/doc/' || CAST(doc_id AS VARCHAR) AS url
              FROM documents),
            lines AS (
              SELECT url, doc_id, source,
                     CASE WHEN doc_id % 5 = 0 THEN ''
                          ELSE array_to_string(tk[1:3], ' ') END AS t1,
                     array_to_string(tk[4:5], ' ') AS t2
              FROM t)
            SELECT url AS doc_id, 0 AS kind_idx, 'headline' AS kind,
                   'Doc ' || CAST(doc_id AS VARCHAR) AS line_0,
                   CAST(NULL AS VARCHAR) AS line_1
            FROM lines
            UNION ALL
            SELECT url, 1, 'text',
                   CASE WHEN t1 <> '' THEN t1
                        WHEN t2 <> '' THEN t2
                        ELSE 'None' END,
                   CASE WHEN t1 <> '' AND t2 <> '' THEN t2 END
            FROM lines
            UNION ALL
            SELECT url, 2, 'link',
                   'https://' || source || '.test/rel/' || CAST(doc_id % 7 AS VARCHAR),
                   CAST(NULL AS VARCHAR)
            FROM lines
            UNION ALL
            SELECT url, 3, 'bullet', 'None', CAST(NULL AS VARCHAR) FROM lines
        """,
        "o4_txt_render": r"""
            WITH t AS (
              SELECT doc_id,
                     string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS tk,
                     'https://' || source || '.test/doc/' || CAST(doc_id AS VARCHAR) AS url
              FROM documents),
            lines AS (
              SELECT url,
                     CASE WHEN doc_id % 5 = 0 THEN ''
                          ELSE COALESCE(array_to_string(tk[1:3], ' '), '') END AS t1,
                     COALESCE(array_to_string(tk[4:5], ' '), '') AS t2
              FROM t)
            SELECT url AS doc_id,
                   CASE WHEN t1 <> '' AND t2 <> '' THEN t1 || chr(10) || t2 || chr(10)
                        WHEN t1 <> '' THEN t1 || chr(10)
                        WHEN t2 <> '' THEN t2 || chr(10)
                        ELSE 'None' || chr(10) END AS txt
            FROM lines
        """,
        "o5_txt_render": r"""
            WITH t AS (
              SELECT doc_id, source,
                     string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS tk,
                     'https://' || source || '.test/doc/' || CAST(doc_id AS VARCHAR) AS url
              FROM documents),
            lines AS (
              SELECT url, doc_id, source,
                     CASE WHEN doc_id % 5 = 0 THEN ''
                          ELSE COALESCE(array_to_string(tk[1:3], ' '), '') END AS t1,
                     COALESCE(array_to_string(tk[4:5], ' '), '') AS t2
              FROM t)
            SELECT url AS doc_id,
                   'Doc ' || CAST(doc_id AS VARCHAR) || chr(10)
                   || CASE WHEN t1 <> '' AND t2 <> '' THEN t1 || chr(10) || t2
                           WHEN t1 <> '' THEN t1
                           WHEN t2 <> '' THEN t2
                           ELSE 'None' END || chr(10)
                   || 'https://' || source || '.test/rel/' || CAST(doc_id % 7 AS VARCHAR) || chr(10)
                   || 'None' AS txt
            FROM lines
        """,
        "fetch_headers": """
            SELECT 'synth/' || source || '.test' AS server,
                   CASE WHEN n_chars > 0 THEN 'text/html; charset=utf-8'
                        ELSE 'text/plain' END AS content_type,
                   COUNT(*) AS n_pages,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_len,
                   MIN(doc_id) AS min_doc
            FROM documents GROUP BY 1, 2
        """,
        "fetch_cookies": f"""
            WITH j AS (
              SELECT doc_id, host,
                     CASE WHEN n_chars > 0 THEN
                       [{{'name': 'session_id',
                          'value': substr(md5('sess|' || host), 1, 16),
                          'domain': host}},
                        {{'name': 'last_visit',
                          'value': CAST(doc_id AS VARCHAR),
                          'domain': host}}]
                     ELSE
                       [{{'name': 'session_id',
                          'value': substr(md5('sess|' || host), 1, 16),
                          'domain': host}}]
                     END AS cookies
              FROM ({_DOC_URLS_SQL})),
            c AS (
              SELECT x.name AS name, x.value AS value, x.domain AS domain
              FROM j, UNNEST(cookies) AS t(x))
            SELECT domain, name,
                   COUNT(*) AS n_cookies,
                   MIN(value) AS min_value,
                   MAX(value) AS max_value
            FROM c GROUP BY domain, name
        """,
        "fetch_json_requests": f"""
            WITH r AS (
              SELECT doc_id, host,
                     CASE WHEN n_chars > 0 AND (doc_id % 5) >= 1 THEN
                       list_transform(range(1, CAST(LEAST(doc_id % 5, 3) AS INT) + 1),
                         i -> {{'url': 'https://' || host || '/api/v'
                                       || CAST(i AS VARCHAR) || '?page='
                                       || substr(md5(url), 1, 12),
                                'status': 200,
                                'content_type': 'application/json'}})
                     ELSE CAST([] AS STRUCT(url VARCHAR, status INTEGER,
                                            content_type VARCHAR)[])
                     END AS json_requests
              FROM ({_DOC_URLS_SQL}))
            SELECT host,
                   COUNT(*) AS n_docs,
                   CAST(SUM(len(json_requests)) AS BIGINT) AS sum_reqs,
                   CAST(SUM(CASE WHEN len(json_requests) = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_silent,
                   MIN(json_requests[1].url) AS min_first_req
            FROM r GROUP BY host
        """,
        "frontier_host_metrics": f"""
            SELECT host,
                   COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   ROUND(AVG(n_chars), 4) AS avg_chars,
                   COUNT(DISTINCT lang) AS n_langs,
                   MIN(doc_id) AS min_doc,
                   MAX(doc_id) AS max_doc
            FROM ({_DOC_URLS_SQL}) GROUP BY host
        """,
        "seed_normalize_quirk": f"""
            SELECT doc_id, raw_url,
                   CASE WHEN raw_url LIKE '%http%' THEN raw_url
                        ELSE 'http://' || raw_url END AS seed_url
            FROM (
              SELECT doc_id,
                     CASE WHEN doc_id % 2 = 0 THEN url
                          ELSE host || '/doc/' || CAST(doc_id AS VARCHAR) END AS raw_url
              FROM ({_DOC_URLS_SQL}))
        """,
        "robots_gate": f"""
            SELECT doc_id, url, host FROM ({_DOC_URLS_SQL})
            WHERE NOT (
              CAST(substr(source, length(source), 1) AS INT) % 2 = 0
              AND (path LIKE '/doc/1%' OR path LIKE '/doc/3%'))
        """,
        "robots_change_impact": f"""
            WITH v AS (
              SELECT doc_id, url, host,
                     NOT (CAST(substr(source, length(source), 1) AS INT) % 2 = 0
                          AND (path LIKE '/doc/1%' OR path LIKE '/doc/3%'))
                       AS was_allowed,
                     NOT (CASE
                            WHEN CAST(substr(source, length(source), 1) AS INT) % 2 = 0
                            THEN (path LIKE '/doc/1%' OR path LIKE '/doc/2%')
                            ELSE path LIKE '/doc/5%'
                          END) AS now_allowed
              FROM ({_DOC_URLS_SQL}))
            SELECT doc_id, url, host, was_allowed, now_allowed,
                   CASE WHEN now_allowed THEN 'allowed' ELSE 'blocked' END
                     AS transition
            FROM v WHERE was_allowed <> now_allowed
        """,
        "sitemap_coverage": f"""
            WITH c AS (SELECT host, url FROM ({_DOC_URLS_SQL})),
            s AS (
              SELECT host, url FROM ({_DOC_URLS_SQL}) WHERE doc_id % 4 <> 0
              UNION ALL
              SELECT host, url || '/x' FROM ({_DOC_URLS_SQL}) WHERE doc_id % 10 = 0),
            j AS (
              SELECT COALESCE(c.host, s.host) AS host,
                     (c.url IS NOT NULL) AS in_c, (s.url IS NOT NULL) AS in_s
              FROM c FULL OUTER JOIN s ON c.url = s.url),
            a AS (
              SELECT host,
                     CAST(SUM(CASE WHEN in_c THEN 1 ELSE 0 END) AS BIGINT) AS n_crawled,
                     CAST(SUM(CASE WHEN in_c AND in_s THEN 1 ELSE 0 END) AS BIGINT) AS n_in_sitemap,
                     CAST(SUM(CASE WHEN in_c AND NOT in_s THEN 1 ELSE 0 END) AS BIGINT) AS n_organic_only,
                     CAST(SUM(CASE WHEN NOT in_c AND in_s THEN 1 ELSE 0 END) AS BIGINT) AS n_sitemap_only
              FROM j GROUP BY host)
            SELECT host, n_crawled, n_in_sitemap, n_organic_only, n_sitemap_only,
                   n_in_sitemap * CAST(1000000 AS BIGINT)
                     // GREATEST(n_crawled, CAST(1 AS BIGINT)) AS coverage_ppm
            FROM a
        """,
        "within_wave_dedup": """
            SELECT url, parent_rank, offset_ AS "offset" FROM (
              SELECT url, parent_rank, offset_,
                     ROW_NUMBER() OVER (PARTITION BY url
                                        ORDER BY parent_rank, offset_) AS rn
              FROM (
                SELECT 'https://t.test/p' || CAST(doc_id % 50 AS VARCHAR) AS url,
                       doc_id % 7 AS parent_rank, doc_id % 5 AS offset_
                FROM documents)) WHERE rn = 1
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_qty,
                   CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_base_price,
                   CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                        * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))), 4) AS DOUBLE) AS sum_disc_price,
                   CAST(ROUND(AVG(CAST(l_quantity AS DECIMAL(18,6))), 4) AS DOUBLE) AS avg_qty,
                   CAST(ROUND(AVG(CAST(l_discount AS DECIMAL(18,6))), 4) AS DOUBLE) AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "revenue_by_nation": """
            SELECT n_name,
                   CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                        * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))), 4) AS DOUBLE) AS revenue,
                   COUNT(*) AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "top_parts_per_brand": """
            SELECT p_brand, p_partkey, p_retailprice, rn FROM (
              SELECT p_brand, p_partkey, p_retailprice,
                     ROW_NUMBER() OVER (PARTITION BY p_brand
                                        ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
              FROM part) WHERE rn <= 2
        """,
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 4) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "exact_dedup_docs": r"""
            SELECT MIN(doc_id) AS doc_id FROM documents
            GROUP BY lower(regexp_replace(trim(text), '\s+', ' ', 'g'))
        """,
        "token_counts": r"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
                   CAST(GREATEST(
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+')) END,
                     CEIL(length(trim(text)) / 4.0)) AS INT) AS n_subword_est
            FROM documents
        """,
        "langid": r"""
            WITH t AS (
              SELECT doc_id,
                     list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS toks
              FROM documents),
            h AS (
              SELECT doc_id,
                len(list_intersect(toks, ['the','and','of','to','a','in','is','that'])) AS en,
                len(list_intersect(toks, ['der','die','das','und','ist','nicht','ein','zu'])) AS de,
                len(list_intersect(toks, ['le','la','les','et','est','un','une','que'])) AS fr,
                len(list_intersect(toks, ['el','la','los','de','que','es','un','una'])) AS es,
                len(list_intersect(toks, ['的','是','了','在','我','有','和','不'])) AS zh
              FROM t)
            SELECT doc_id,
                   CASE WHEN GREATEST(en,de,fr,es,zh) = 0 THEN 'und'
                        WHEN de = GREATEST(en,de,fr,es,zh) THEN 'de'
                        WHEN en = GREATEST(en,de,fr,es,zh) THEN 'en'
                        WHEN es = GREATEST(en,de,fr,es,zh) THEN 'es'
                        WHEN fr = GREATEST(en,de,fr,es,zh) THEN 'fr'
                        ELSE 'zh' END AS lang_pred
            FROM h
        """,
        "quality_scores": r"""
            WITH b AS (
              SELECT doc_id, trim(text) AS t,
                     string_split_regex(lower(trim(text)), '\s+') AS toks
              FROM documents),
            m AS (
              SELECT doc_id,
                     length(t) AS n_chars,
                     CASE WHEN t = '' THEN 0 ELSE len(toks) END AS n_tok,
                     len(list_distinct(toks)) AS n_distinct,
                     length(regexp_replace(t, '[^!-/:-@\[-`{-~]', '', 'g')) AS punct,
                     len(list_intersect(list_distinct(toks),
                         ['the','and','of','to','a','in','is','that'])) AS stop_hits
              FROM b)
            SELECT doc_id, CAST(
                     FLOOR(350 * LEAST(n_chars, 500) / 500.0)
                   + (CASE WHEN n_tok > 0 THEN FLOOR(250.0 * n_distinct / n_tok) ELSE 0 END)
                   + FLOOR(250 * LEAST(stop_hits, 4) / 4.0)
                   + (CASE WHEN n_chars > 0
                           THEN FLOOR(150.0 * GREATEST(n_chars - LEAST(punct * 5, n_chars), 0) / n_chars)
                           ELSE 0 END)
                   AS INT) AS quality
            FROM m
        """,
        "minhash_band_minima": r"""
            WITH toks AS (
              SELECT doc_id,
                     string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS t
              FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, s
              FROM toks,
                   UNNEST(list_transform(range(1, GREATEST(len(t) - 2, 0) + 1),
                                         i -> array_to_string(t[i:i+2], ' '))) AS u(s)),
            seeds AS (SELECT UNNEST(range(0, 8)) AS seed)
            SELECT doc_id, CAST(seed AS INT) AS seed,
                   MIN(substr(md5(CAST(seed AS VARCHAR) || '|' || s), 1, 15)) AS minhash_hex
            FROM sh, seeds GROUP BY doc_id, seed
        """,
        "gopher_repetition": r"""
            WITH t AS (
              SELECT doc_id, trim(text) AS tt,
                     string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS tk
              FROM documents),
            base AS (
              SELECT doc_id,
                     CAST(CASE WHEN tt = '' THEN 0 ELSE len(tk) END AS BIGINT) AS n_tokens,
                     CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct
              FROM t),
            bgc AS (
              SELECT doc_id, s, COUNT(*) AS c
              FROM t, UNNEST(list_transform(range(1, GREATEST(len(tk) - 1, 0) + 1),
                                            i -> array_to_string(tk[i:i+1], ' '))) AS u(s)
              GROUP BY 1, 2),
            top AS (
              SELECT doc_id, MAX(c) AS top_bigram_count, SUM(c) AS total
              FROM bgc GROUP BY 1)
            SELECT b.doc_id, b.n_tokens, b.n_distinct,
                   ROUND(CASE WHEN b.n_tokens > 0
                              THEN 1.0 - CAST(b.n_distinct AS DOUBLE) / b.n_tokens
                              ELSE 0.0 END, 6) AS dup_token_frac,
                   CAST(COALESCE(tp.top_bigram_count, 0) AS BIGINT) AS top_bigram_count,
                   ROUND(CASE WHEN COALESCE(tp.total, 0) > 0
                              THEN CAST(tp.top_bigram_count AS DOUBLE) / tp.total
                              ELSE 0.0 END, 6) AS top_bigram_frac
            FROM base b LEFT JOIN top tp USING (doc_id)
        """,
        "decontaminate_overlap": r"""
            WITH t AS (
              SELECT doc_id,
                     string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS tk
              FROM documents),
            g AS (
              SELECT doc_id, s
              FROM (SELECT doc_id,
                           list_distinct(list_transform(range(1, GREATEST(len(tk) - 4, 0) + 1),
                                                        i -> array_to_string(tk[i:i+4], ' '))) AS gs
                    FROM t), UNNEST(gs) AS u(s))
            SELECT c.doc_id AS doc_id, b.doc_id AS bench_id, COUNT(*) AS n_shared
            FROM g c JOIN g b ON c.s = b.s
            WHERE b.doc_id % 97 = 0 AND c.doc_id % 97 <> 0
            GROUP BY 1, 2
        """,
        "script_mix": r"""
            WITH d AS (
              SELECT doc_id,
                     text || CASE lang
                       WHEN 'zh' THEN ' 你好世界'
                       WHEN 'de' THEN ' straße groß'
                       WHEN 'fr' THEN ' café déjà vu'
                       WHEN 'es' THEN ' mañana niño'
                       ELSE '' END AS t
              FROM documents),
            c AS (
              SELECT doc_id,
                     CAST(length(t) AS BIGINT) AS n_chars_total,
                     CAST(length(t) - length(regexp_replace(t, '\p{Latin}', '', 'g')) AS BIGINT) AS n_latin,
                     CAST(length(t) - length(regexp_replace(t, '\p{Han}', '', 'g')) AS BIGINT) AS n_han,
                     CAST(length(t) - length(regexp_replace(t, '[0-9]', '', 'g')) AS BIGINT) AS n_digit,
                     CAST(length(t) - length(regexp_replace(t, '\s', '', 'g')) AS BIGINT) AS n_space
              FROM d)
            SELECT doc_id, n_chars_total, n_latin, n_han, n_digit, n_space,
                   n_chars_total - n_latin - n_han - n_digit - n_space AS n_other,
                   CASE WHEN n_han >= n_latin AND n_han >= n_digit AND n_han > 0
                        THEN 'han'
                        WHEN n_latin >= n_digit THEN 'latin'
                        ELSE 'digit' END AS dominant,
                   (n_han * CAST(1000000 AS BIGINT))
                     // GREATEST(n_chars_total, CAST(1 AS BIGINT)) AS han_ppm
            FROM c
        """,
        "host_seed_distance": r"""
            WITH RECURSIVE u AS (
              SELECT source || '.test' AS host, CAST(doc_id AS VARCHAR) AS did
              FROM documents),
            hosts AS (SELECT DISTINCT host FROM u),
            cnt AS (SELECT COUNT(*) AS n_hosts FROM hosts),
            idx AS (
              SELECT host, ROW_NUMBER() OVER (ORDER BY host) - 1 AS host_idx
              FROM hosts),
            raw AS (
              SELECT u.host AS src_host,
                     ('0x' || substr(md5(u.did || ':' || CAST(k AS VARCHAR)), 1, 15))::BIGINT
                       % (SELECT n_hosts FROM cnt) AS dst_idx
              FROM u, UNNEST([0, 1, 2]) AS t(k)),
            edges AS (
              SELECT DISTINCT r.src_host AS src, i.host AS dst
              FROM raw r JOIN idx i ON r.dst_idx = i.host_idx
              WHERE r.src_host <> i.host),
            seeds AS (
              SELECT host FROM hosts
              WHERE ('0x' || substr(md5(host), 1, 1))::BIGINT % 5 = 0),
            walk(host, dist) AS (
              SELECT host, 0 FROM seeds
              UNION
              SELECT e.dst, w.dist + 1
              FROM walk w JOIN edges e ON w.host = e.src
              WHERE w.dist < 30)
            SELECT host, CAST(MIN(dist) AS BIGINT) AS dist
            FROM walk GROUP BY host
        """,
        "zorder_keys": f"""
            WITH sx AS (
              SELECT source, ROW_NUMBER() OVER (ORDER BY source) - 1 AS x
              FROM (SELECT DISTINCT source FROM documents)),
            sy AS (
              SELECT lang, ROW_NUMBER() OVER (ORDER BY lang) - 1 AS y
              FROM (SELECT DISTINCT lang FROM documents)),
            d AS (
              SELECT doc_id, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y
              FROM documents JOIN sx USING (source) JOIN sy USING (lang)),
            z AS (
              SELECT doc_id, x, y,
                     CAST({zorder_sql_expr('x', 'y', 8)} AS BIGINT) AS zkey
              FROM d)
            SELECT doc_id, x, y, zkey, zkey // 16 AS zbucket FROM z
        """,
        "pagination_chains": r"""
            WITH u AS (
              SELECT doc_id,
                     CASE
                       WHEN doc_id % 3 = 0 THEN
                         'https://src' || CAST((doc_id // 7) % 7 AS VARCHAR)
                           || '.test/list/' || CAST(doc_id // 7 AS VARCHAR)
                           || '?page=' || CAST(doc_id % 7 AS VARCHAR) || '&sort=asc'
                       WHEN doc_id % 3 = 1 THEN
                         'https://src' || CAST((doc_id // 7) % 7 AS VARCHAR)
                           || '.test/list/' || CAST(doc_id // 7 AS VARCHAR)
                           || '?sort=asc&page=' || CAST(doc_id % 7 AS VARCHAR)
                       ELSE 'https://src' || CAST((doc_id // 7) % 7 AS VARCHAR)
                           || '.test/list/' || CAST(doc_id // 7 AS VARCHAR)
                     END AS url
              FROM documents),
            parsed AS (
              SELECT doc_id,
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(url, '([?&])page=[0-9]+', '\1', 'g'),
                         '\?&', '?', 'g'),
                       '[?&]+$', '', 'g') AS series_key,
                     CAST(NULLIF(regexp_extract(url, '[?&]page=([0-9]+)', 1), '')
                          AS BIGINT) AS page_no
              FROM u),
            p AS (SELECT * FROM parsed WHERE page_no IS NOT NULL),
            r AS (
              SELECT doc_id, series_key, page_no,
                     CAST(ROW_NUMBER() OVER (PARTITION BY series_key
                          ORDER BY page_no ASC, doc_id ASC) AS INT) AS pos,
                     CAST(COUNT(*) OVER (PARTITION BY series_key) AS BIGINT)
                       AS chain_len
              FROM p)
            SELECT doc_id, series_key, page_no, chain_len, pos,
                   (pos = 1) AS is_first,
                   (pos = chain_len) AS is_last
            FROM r
        """,
        "soft404_pages": r"""
            WITH p AS (
              SELECT doc_id, source || '.test' AS host,
                     CASE WHEN doc_id % 19 = 0 THEN 404 ELSE 200 END AS status,
                     CASE WHEN doc_id % 19 = 0 OR doc_id % 23 = 0
                          THEN 'Page Not Found - ' || source || '.test'
                          ELSE text END AS body
              FROM documents),
            s AS (
              SELECT doc_id, host, status,
                     md5(lower(regexp_replace(trim(body), '\s+', ' ', 'g'))) AS sig
              FROM p),
            t AS (SELECT DISTINCT host, sig FROM s WHERE status = 404)
            SELECT s.doc_id, s.host, (t.sig IS NOT NULL) AS soft_404
            FROM s LEFT JOIN t ON s.host = t.host AND s.sig = t.sig
            WHERE s.status = 200
        """,
        "host_components": r"""
            WITH RECURSIVE u AS (
              SELECT source || '.test' AS host, CAST(doc_id AS VARCHAR) AS did
              FROM documents WHERE doc_id % 37 = 0),
            hosts AS (SELECT DISTINCT source || '.test' AS host FROM documents),
            cnt AS (SELECT COUNT(*) AS n_hosts FROM hosts),
            idx AS (
              SELECT host, ROW_NUMBER() OVER (ORDER BY host) - 1 AS host_idx
              FROM hosts),
            raw AS (
              SELECT u.host AS src_host,
                     ('0x' || substr(md5(u.did || ':' || CAST(k AS VARCHAR)), 1, 15))::BIGINT
                       % (SELECT n_hosts FROM cnt) AS dst_idx
              FROM u, UNNEST([0]) AS t(k)),
            e0 AS (
              SELECT DISTINCT r.src_host AS src, i.host AS dst
              FROM raw r JOIN idx i ON r.dst_idx = i.host_idx
              WHERE r.src_host <> i.host),
            edges AS (
              SELECT src, dst FROM e0
              UNION
              SELECT dst, src FROM e0),
            reach(src, dst) AS (
              SELECT src, dst FROM edges
              UNION
              SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
              WHERE r.src <> e.dst)
            SELECT src AS host, LEAST(src, MIN(dst)) AS component
            FROM reach GROUP BY src
        """,
        "doc_keywords": r"""
            WITH toks AS (
              SELECT doc_id,
                     string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS t
              FROM documents),
            tk AS (
              SELECT doc_id, s AS token
              FROM toks, UNNEST(t) AS u(s) WHERE len(s) >= 2),
            tf AS (
              SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
              FROM tk GROUP BY 1, 2),
            dfq AS (
              SELECT token, CAST(COUNT(*) AS BIGINT) AS dfreq
              FROM tf GROUP BY 1),
            n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
            sc AS (
              SELECT tf.doc_id, tf.token, tf.tf,
                     CAST(length(bin(nd // dfreq)) AS BIGINT) AS idf_bits,
                     tf.tf * CAST(length(bin(nd // dfreq)) AS BIGINT) AS score
              FROM tf JOIN dfq USING (token), n)
            SELECT doc_id, token, tf, idf_bits, score, rnk FROM (
              SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                             ORDER BY score DESC, token ASC) AS INT) AS rnk
              FROM sc)
            WHERE rnk <= 3
        """,
        "vocab_top_tokens": r"""
            SELECT token, n FROM (
              SELECT u.token AS token, COUNT(*) AS n
              FROM (SELECT string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS tk
                    FROM documents), UNNEST(tk) AS u(token)
              WHERE length(u.token) >= 1
              GROUP BY 1)
            ORDER BY n DESC, token ASC LIMIT 100
        """,
        "minhash_lsh_pairs_md5": r"""
            WITH toks AS (
              SELECT doc_id,
                     string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS t
              FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, s
              FROM toks,
                   UNNEST(list_transform(range(1, GREATEST(len(t) - 2, 0) + 1),
                                         i -> array_to_string(t[i:i+2], ' '))) AS u(s)
              WHERE len(t) >= 3),
            seeds AS (SELECT UNNEST(range(0, 8)) AS seed),
            sig AS (
              SELECT doc_id, seed,
                     MIN(substr(md5(CAST(seed AS VARCHAR) || '|' || s), 1, 15)) AS mh
              FROM sh, seeds GROUP BY doc_id, seed),
            bands AS (
              SELECT doc_id, CAST(seed // 2 AS INT) AS band_idx,
                     string_agg(mh, ',' ORDER BY seed) AS band_key
              FROM sig GROUP BY doc_id, band_idx)
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM bands a JOIN bands b USING (band_idx, band_key)
            WHERE a.doc_id < b.doc_id
        """,
        "minhash_lsh_pairs": f"""
            WITH toks AS (
              SELECT doc_id,
                     string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ') AS t
              FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, s
              FROM toks,
                   UNNEST(list_transform(range(1, GREATEST(len(t) - 2, 0) + 1),
                                         i -> array_to_string(t[i:i+2], ' '))) AS u(s)
              WHERE len(t) >= 3),
            th AS (SELECT s, seed, h FROM read_parquet('{_mh_tokhash}')),
            sig AS (
              SELECT doc_id, seed, MIN(h) AS mh
              FROM sh JOIN th USING (s) GROUP BY doc_id, seed),
            bands AS (
              SELECT doc_id,
                     CAST(seed // 2 AS INT) AS band_idx,
                     CAST(CAST(seed // 2 AS INT) AS VARCHAR) || '|' ||
                       string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS pre
              FROM sig GROUP BY doc_id, band_idx),
            bk AS (
              SELECT doc_id, band_key
              FROM bands JOIN read_parquet('{_mh_bandkey}') USING (pre))
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM bk a JOIN bk b USING (band_key)
            WHERE a.doc_id < b.doc_id
        """,
        "simhash_neardup": f"""
            WITH t AS (
              SELECT doc_id,
                     list_distinct(string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) AS toks
              FROM documents),
            th AS (SELECT tok, hv FROM read_parquet('{_tokhash}')),
            h AS (
              SELECT doc_id, hv
              FROM (SELECT doc_id, u.tok AS tok FROM t, UNNEST(toks) AS u(tok)) x
              JOIN th USING (tok)),
            bits AS (
              SELECT doc_id, b, SUM(((hv >> CAST(b AS INT)) & 1) * 2 - 1) AS cnt
              FROM h, (SELECT UNNEST(range(0, 64)) AS b) GROUP BY doc_id, b),
            sim AS (
              SELECT doc_id,
                     CAST(SUM(CASE WHEN cnt <= 0 THEN 0
                                   WHEN b = 63 THEN (-9223372036854775807 - 1)
                                   ELSE (1::BIGINT << CAST(b AS INT)) END)
                          AS BIGINT) AS sh
              FROM bits GROUP BY doc_id)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sim a JOIN sim b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.sh, b.sh)) <= 3
        """,
        "winnow_fingerprints": f"""
            WITH toks AS (
              SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk
              FROM documents),
            pos AS (
              SELECT doc_id, CAST(i AS INT) AS pos, tk[CAST(i AS INT)] AS tok,
                     len(tk) AS n
              FROM toks, UNNEST(range(1, len(tk) + 1)) AS r(i)),
            th AS (SELECT tok, hv FROM read_parquet('{_tokhash}')),
            hv AS (SELECT doc_id, pos, n, th.hv FROM pos JOIN th USING (tok)),
            wins AS (
              SELECT doc_id, pos, n,
                     MIN(hv) OVER (PARTITION BY doc_id ORDER BY pos
                                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
              FROM hv)
            SELECT DISTINCT doc_id, fp AS fingerprint
            FROM wins WHERE n >= 4 AND pos <= n - 3
        """,
        "simhash_neardup_md5": r"""
            WITH t AS (
              SELECT doc_id,
                     list_distinct(string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ')) AS toks
              FROM documents),
            h AS (
              SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv
              FROM t, UNNEST(toks) AS u(tok)),
            bits AS (
              SELECT doc_id, b, SUM(((hv >> CAST(b AS INT)) & 1) * 2 - 1) AS cnt
              FROM h, (SELECT UNNEST(range(0, 60)) AS b) GROUP BY doc_id, b),
            sim AS (
              SELECT doc_id,
                     CAST(SUM(CASE WHEN cnt > 0 THEN (1::BIGINT << CAST(b AS INT)) ELSE 0 END) AS BIGINT) AS sh
              FROM bits GROUP BY doc_id)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sim a JOIN sim b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.sh, b.sh)) <= 3
        """,
        "neardup_components": r"""
            WITH RECURSIVE toks AS (
              SELECT doc_id,
                     string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS t
              FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, s
              FROM toks,
                   UNNEST(list_transform(range(1, GREATEST(len(t) - 2, 0) + 1),
                                         i -> array_to_string(t[i:i+2], ' '))) AS u(s)
              WHERE len(t) >= 3),
            seeds AS (SELECT UNNEST(range(0, 8)) AS seed),
            sig AS (
              SELECT doc_id, seed,
                     MIN(substr(md5(CAST(seed AS VARCHAR) || '|' || s), 1, 15)) AS mh
              FROM sh, seeds GROUP BY doc_id, seed),
            bands AS (
              SELECT doc_id, CAST(seed // 2 AS INT) AS band_idx,
                     string_agg(mh, ',' ORDER BY seed) AS band_key
              FROM sig GROUP BY doc_id, band_idx),
            pairs AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM bands a JOIN bands b USING (band_idx, band_key)
              WHERE a.doc_id < b.doc_id),
            edges AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION
              SELECT id_b, id_a FROM pairs),
            reach(src, dst) AS (
              SELECT src, dst FROM edges
              UNION
              SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
              WHERE r.src <> e.dst)
            SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component
            FROM reach GROUP BY src
        """,
        "neardup_cluster_histogram": r"""
            WITH RECURSIVE toks AS (
              SELECT doc_id,
                     string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS t
              FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, s
              FROM toks,
                   UNNEST(list_transform(range(1, GREATEST(len(t) - 2, 0) + 1),
                                         i -> array_to_string(t[i:i+2], ' '))) AS u(s)
              WHERE len(t) >= 3),
            seeds AS (SELECT UNNEST(range(0, 8)) AS seed),
            sig AS (
              SELECT doc_id, seed,
                     MIN(substr(md5(CAST(seed AS VARCHAR) || '|' || s), 1, 15)) AS mh
              FROM sh, seeds GROUP BY doc_id, seed),
            bands AS (
              SELECT doc_id, CAST(seed // 2 AS INT) AS band_idx,
                     string_agg(mh, ',' ORDER BY seed) AS band_key
              FROM sig GROUP BY doc_id, band_idx),
            pairs AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM bands a JOIN bands b USING (band_idx, band_key)
              WHERE a.doc_id < b.doc_id),
            edges AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION
              SELECT id_b, id_a FROM pairs),
            reach(src, dst) AS (
              SELECT src, dst FROM edges
              UNION
              SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
              WHERE r.src <> e.dst),
            comp AS (
              SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component
              FROM reach GROUP BY src),
            sizes AS (
              SELECT component, CAST(COUNT(*) AS BIGINT) AS sz
              FROM comp GROUP BY component)
            SELECT CAST(length(bin(sz)) AS BIGINT) AS bucket_bits,
                   CAST(COUNT(*) AS BIGINT) AS n_components,
                   CAST(SUM(sz) AS BIGINT) AS n_nodes
            FROM sizes GROUP BY 1
        """,
        "neardup_dedup_docs": r"""
            WITH RECURSIVE toks AS (
              SELECT doc_id,
                     string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS t
              FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, s
              FROM toks,
                   UNNEST(list_transform(range(1, GREATEST(len(t) - 2, 0) + 1),
                                         i -> array_to_string(t[i:i+2], ' '))) AS u(s)
              WHERE len(t) >= 3),
            seeds AS (SELECT UNNEST(range(0, 8)) AS seed),
            sig AS (
              SELECT doc_id, seed,
                     MIN(substr(md5(CAST(seed AS VARCHAR) || '|' || s), 1, 15)) AS mh
              FROM sh, seeds GROUP BY doc_id, seed),
            bands AS (
              SELECT doc_id, CAST(seed // 2 AS INT) AS band_idx,
                     string_agg(mh, ',' ORDER BY seed) AS band_key
              FROM sig GROUP BY doc_id, band_idx),
            pairs AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM bands a JOIN bands b USING (band_idx, band_key)
              WHERE a.doc_id < b.doc_id),
            edges AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION
              SELECT id_b, id_a FROM pairs),
            reach(src, dst) AS (
              SELECT src, dst FROM edges
              UNION
              SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
              WHERE r.src <> e.dst)
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (
              SELECT src FROM reach GROUP BY src
              HAVING LEAST(src, MIN(dst)) <> src)
        """,
        "neardup_best_reps": r"""
            WITH RECURSIVE toks AS (
              SELECT doc_id,
                     string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS t
              FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, s
              FROM toks,
                   UNNEST(list_transform(range(1, GREATEST(len(t) - 2, 0) + 1),
                                         i -> array_to_string(t[i:i+2], ' '))) AS u(s)
              WHERE len(t) >= 3),
            seeds AS (SELECT UNNEST(range(0, 8)) AS seed),
            sig AS (
              SELECT doc_id, seed,
                     MIN(substr(md5(CAST(seed AS VARCHAR) || '|' || s), 1, 15)) AS mh
              FROM sh, seeds GROUP BY doc_id, seed),
            bands AS (
              SELECT doc_id, CAST(seed // 2 AS INT) AS band_idx,
                     string_agg(mh, ',' ORDER BY seed) AS band_key
              FROM sig GROUP BY doc_id, band_idx),
            pairs AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM bands a JOIN bands b USING (band_idx, band_key)
              WHERE a.doc_id < b.doc_id),
            edges AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION
              SELECT id_b, id_a FROM pairs),
            reach(src, dst) AS (
              SELECT src, dst FROM edges
              UNION
              SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
              WHERE r.src <> e.dst),
            comp AS (
              SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component
              FROM reach GROUP BY src),
            qb AS (
              SELECT doc_id, trim(text) AS t,
                     string_split_regex(lower(trim(text)), '\s+') AS qtoks
              FROM documents),
            qm AS (
              SELECT doc_id,
                     length(t) AS n_chars,
                     CASE WHEN t = '' THEN 0 ELSE len(qtoks) END AS n_tok,
                     len(list_distinct(qtoks)) AS n_distinct,
                     length(regexp_replace(t, '[^!-/:-@\[-`{-~]', '', 'g')) AS punct,
                     len(list_intersect(list_distinct(qtoks),
                         ['the','and','of','to','a','in','is','that'])) AS stop_hits
              FROM qb),
            q AS (
              SELECT doc_id, CAST(
                       FLOOR(350 * LEAST(n_chars, 500) / 500.0)
                     + (CASE WHEN n_tok > 0 THEN FLOOR(250.0 * n_distinct / n_tok) ELSE 0 END)
                     + FLOOR(250 * LEAST(stop_hits, 4) / 4.0)
                     + (CASE WHEN n_chars > 0
                             THEN FLOOR(150.0 * GREATEST(n_chars - LEAST(punct * 5, n_chars), 0) / n_chars)
                             ELSE 0 END)
                     AS INT) AS quality
              FROM qm),
            m AS (
              SELECT c.doc_id, c.component,
                     (CAST(q.quality AS BIGINT) << 40)
                       + (1099511627775 - c.doc_id) AS packed
              FROM comp c JOIN q USING (doc_id)),
            reps AS (
              SELECT component,
                     1099511627775 - (MAX(packed) & 1099511627775) AS rep
              FROM m GROUP BY component),
            drops AS (
              SELECT m.doc_id FROM m JOIN reps USING (component)
              WHERE m.doc_id <> reps.rep)
            SELECT d.doc_id, q.quality
            FROM documents d JOIN q USING (doc_id)
            WHERE d.doc_id NOT IN (SELECT doc_id FROM drops)
        """,
        "char_runs": r"""
            WITH d AS (SELECT doc_id, trim(text) AS t FROM documents),
            ch AS (
              SELECT doc_id, i, substr(t, CAST(i AS INT), 1) AS c
              FROM d, UNNEST(range(1, length(t) + 1)) AS u(i)),
            lg AS (
              SELECT doc_id, i,
                     CASE WHEN c = LAG(c) OVER (PARTITION BY doc_id ORDER BY i)
                          THEN 0 ELSE 1 END AS brk
              FROM ch),
            runs AS (
              SELECT doc_id, i,
                     SUM(brk) OVER (PARTITION BY doc_id ORDER BY i) AS run_id
              FROM lg),
            rmax AS (
              SELECT doc_id, CAST(MAX(cnt) AS BIGINT) AS max_run
              FROM (SELECT doc_id, run_id, COUNT(*) AS cnt
                    FROM runs GROUP BY doc_id, run_id)
              GROUP BY doc_id),
            cls AS (
              SELECT doc_id,
                     CAST(length(t) AS BIGINT) AS n_chars,
                     CAST(length(regexp_replace(t, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS letters,
                     CAST(length(regexp_replace(t, '[^0-9]', '', 'g')) AS BIGINT) AS digits,
                     CAST(length(regexp_replace(t, '[^ \t\n\r]', '', 'g')) AS BIGINT) AS spaces
              FROM d)
            SELECT c.doc_id, c.n_chars,
                   CAST(COALESCE(r.max_run, 0) AS BIGINT) AS max_run,
                   CAST(CASE WHEN c.n_chars > 0
                        THEN 1000000 * c.letters // c.n_chars ELSE 0 END AS BIGINT) AS letter_ppm,
                   CAST(CASE WHEN c.n_chars > 0
                        THEN 1000000 * c.digits // c.n_chars ELSE 0 END AS BIGINT) AS digit_ppm,
                   CAST(CASE WHEN c.n_chars > 0
                        THEN 1000000 * c.spaces // c.n_chars ELSE 0 END AS BIGINT) AS space_ppm,
                   CAST(CASE WHEN c.n_chars > 0
                        THEN 1000000 * (c.n_chars - c.letters - c.digits - c.spaces) // c.n_chars
                        ELSE 0 END AS BIGINT) AS other_ppm
            FROM cls c LEFT JOIN rmax r USING (doc_id)
        """,
        "vocab_growth": r"""
            WITH d AS (
              SELECT doc_id // 64 AS batch, trim(text) AS t,
                     string_split_regex(lower(trim(text)), '\s+') AS toks
              FROM documents),
            inst AS (
              SELECT batch, CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(CASE WHEN t = '' THEN 0 ELSE len(toks) END) AS BIGINT)
                       AS token_instances
              FROM d GROUP BY batch),
            firsts AS (
              SELECT token, MIN(batch) AS batch
              FROM (SELECT batch, UNNEST(toks) AS token FROM d)
              WHERE token <> '' GROUP BY token),
            nt AS (
              SELECT batch, CAST(COUNT(*) AS BIGINT) AS new_types
              FROM firsts GROUP BY batch)
            SELECT i.batch, i.n_docs, i.token_instances,
                   CAST(COALESCE(nt.new_types, 0) AS BIGINT) AS new_types,
                   CAST(SUM(COALESCE(nt.new_types, 0))
                        OVER (ORDER BY i.batch) AS BIGINT) AS cum_types,
                   CAST(SUM(i.token_instances)
                        OVER (ORDER BY i.batch) AS BIGINT) AS cum_instances
            FROM inst i LEFT JOIN nt USING (batch)
        """,
        "winnow_fingerprints_md5": r"""
            WITH h AS (
              SELECT doc_id,
                     list_transform(string_split_regex(lower(trim(text)), '\s+'),
                                    x -> substr(md5(x), 1, 15)) AS hs
              FROM documents)
            SELECT doc_id, UNNEST(list_distinct(list_transform(
                     range(1, GREATEST(len(hs) - 3, 0) + 1),
                     i -> list_min(hs[i:i+3])))) AS fingerprint
            FROM h WHERE len(hs) >= 4
        """,
        "events_cube": """
            SELECT date_trunc('day', ts) AS day, event_type,
                   COUNT(*) AS n_events,
                   CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
            FROM events
            GROUP BY CUBE (date_trunc('day', ts), event_type)
        """,
        "source_lang_map": """
            SELECT source, lang, COUNT(*) AS n_docs
            FROM documents GROUP BY source, lang
        """,
        "events_json_props": """
            SELECT event_type,
                   CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                   COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_with_k,
                   MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
                   MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
            FROM events GROUP BY event_type
        """,
        "orders_date_parts": """
            SELECT o_orderkey,
                   CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
                   CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS qtr,
                   CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mon,
                   CAST(EXTRACT(DAY FROM o_orderdate) AS INT) AS dom,
                   strftime(o_orderdate, '%Y-%m') AS ym
            FROM orders
        """,
        "embedding_topk": f"""
            WITH c AS (
              SELECT vec_id,
                     ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                           CAST({_QUERY_VEC} AS DOUBLE[])), 6) AS cosine
              FROM embeddings)
            SELECT vec_id, cosine FROM c
            ORDER BY cosine DESC, vec_id ASC LIMIT 10
        """,
        "embedding_neardup": f"""
            WITH bk AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                     {_srp_bucket_sql(64, 8, 42)} AS bucket
              FROM embeddings)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine
            FROM bk a JOIN bk b
              ON a.vec_id < b.vec_id
             AND bit_count(xor(a.bucket, b.bucket)) <= 1
            WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.4
        """,
        "semantic_clusters": """
            WITH c AS (
              SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
                     CAST(embedding AS DOUBLE[]) AS cv
              FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
            e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                  FROM embeddings),
            s AS (
              SELECT e.vec_id, c.cid,
                     ROUND(list_cosine_similarity(v, cv), 6) AS cos
              FROM e, c),
            a AS (
              SELECT vec_id, cid, cos,
                     ROW_NUMBER() OVER (PARTITION BY vec_id
                                        ORDER BY cos DESC, cid ASC) AS rn
              FROM s)
            SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id,
                   ROUND(cos, 6) AS cosine
            FROM a WHERE rn = 1
        """,
        "semantic_dedup_docs": """
            WITH c AS (
              SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
                     CAST(embedding AS DOUBLE[]) AS cv
              FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
            e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                  FROM embeddings),
            s AS (
              SELECT e.vec_id, c.cid,
                     ROUND(list_cosine_similarity(v, cv), 6) AS cos
              FROM e, c),
            a AS (
              SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY cos DESC, cid ASC) AS rn
                FROM s) WHERE rn = 1),
            p AS (
              SELECT y.vec_id AS id_b
              FROM a x
              JOIN a y ON x.cid = y.cid AND x.vec_id < y.vec_id
              JOIN e ex ON ex.vec_id = x.vec_id
              JOIN e ey ON ey.vec_id = y.vec_id
              WHERE ROUND(list_cosine_similarity(ex.v, ey.v), 6) >= 0.4),
            d AS (SELECT DISTINCT id_b FROM p)
            SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cluster_id,
                   (d.id_b IS NULL) AS kept
            FROM a LEFT JOIN d ON a.vec_id = d.id_b
        """,
        "oov_rates": r"""
            WITH toks AS (
              SELECT doc_id, s AS token
              FROM (SELECT doc_id,
                           string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS t
                    FROM documents), UNNEST(t) AS u(s)
              WHERE len(s) >= 1),
            vocab AS (
              SELECT token FROM (
                SELECT token, COUNT(*) AS n FROM toks GROUP BY token)
              ORDER BY n DESC, token ASC LIMIT 12),
            j AS (
              SELECT t.doc_id, (v.token IS NOT NULL) AS in_v
              FROM toks t LEFT JOIN vocab v ON t.token = v.token),
            a AS (
              SELECT doc_id,
                     CAST(COUNT(*) AS BIGINT) AS n_tokens,
                     CAST(SUM(CASE WHEN in_v THEN 0 ELSE 1 END) AS BIGINT) AS n_oov
              FROM j GROUP BY doc_id)
            SELECT doc_id, n_tokens, n_oov,
                   n_oov * CAST(1000000 AS BIGINT)
                     // GREATEST(n_tokens, CAST(1 AS BIGINT)) AS oov_ppm
            FROM a
        """,
        "pq_codes": """
            WITH c0 AS (
              SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code,
                     CAST(embedding AS DOUBLE[]) AS v
              FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
            blocks AS (SELECT UNNEST(range(0, 8)) AS block),
            cb AS (
              SELECT b.block, c0.code,
                     list_transform(range(1, 9),
                                    i -> v[CAST(b.block * 8 + i AS INT)]) AS cv
              FROM c0, blocks b),
            e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                  FROM embeddings),
            eb AS (
              SELECT e.vec_id, b.block,
                     list_transform(range(1, 9),
                                    i -> v[CAST(b.block * 8 + i AS INT)]) AS xv
              FROM e, blocks b),
            d AS (
              SELECT eb.vec_id, eb.block, cb.code,
                     ROUND(list_sum(list_transform(range(1, 9),
                       i -> (xv[CAST(i AS INT)] - cv[CAST(i AS INT)])
                          * (xv[CAST(i AS INT)] - cv[CAST(i AS INT)]))), 6) AS d2
              FROM eb JOIN cb USING (block)),
            a AS (
              SELECT vec_id, block, code, d2,
                     ROW_NUMBER() OVER (PARTITION BY vec_id, block
                                        ORDER BY d2 ASC, code ASC) AS rn
              FROM d)
            SELECT vec_id, CAST(block AS INT) AS block,
                   CAST(code AS BIGINT) AS code, d2 AS dist2
            FROM a WHERE rn = 1
        """,
        "ngram_jaccard_pairs": _JACCARD_PAIRS_SQL,
        "ngram_containment_pairs": r"""
            WITH toks AS (
              SELECT doc_id,
                     string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS t
              FROM documents),
            sh3 AS (
              SELECT DISTINCT doc_id, s
              FROM toks,
                   UNNEST(list_transform(range(1, GREATEST(len(t) - 2, 0) + 1),
                                         i -> array_to_string(t[i:i+2], ' '))) AS u(s)
              WHERE len(t) >= 3),
            seeds AS (SELECT UNNEST(range(0, 8)) AS seed),
            sig AS (
              SELECT doc_id, seed,
                     MIN(substr(md5(CAST(seed AS VARCHAR) || '|' || s), 1, 15)) AS mh
              FROM sh3, seeds GROUP BY doc_id, seed),
            bands AS (
              SELECT doc_id, CAST(seed // 2 AS INT) AS band_idx,
                     string_agg(mh, ',' ORDER BY seed) AS band_key
              FROM sig GROUP BY doc_id, band_idx),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM bands a JOIN bands b USING (band_idx, band_key)
              WHERE a.doc_id < b.doc_id),
            d AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, GREATEST(len(t) - 1, 0) + 1),
                       i -> array_to_string(t[i:i+1], ' '))) AS sh
              FROM toks),
            sized AS (
              SELECT c.id_a, c.id_b,
                     CAST(len(a.sh) AS BIGINT) AS n_a,
                     CAST(len(b.sh) AS BIGINT) AS n_b,
                     CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_inter
              FROM cand c
              JOIN d a ON a.doc_id = c.id_a
              JOIN d b ON b.doc_id = c.id_b),
            o AS (
              SELECT id_a, id_b, n_a, n_b, n_inter,
                     CASE WHEN n_a > 0 THEN n_inter * CAST(1000000 AS BIGINT) // n_a
                          ELSE CAST(0 AS BIGINT) END AS cont_a_ppm,
                     CASE WHEN n_b > 0 THEN n_inter * CAST(1000000 AS BIGINT) // n_b
                          ELSE CAST(0 AS BIGINT) END AS cont_b_ppm
              FROM sized)
            SELECT * FROM o
            WHERE GREATEST(cont_a_ppm, cont_b_ppm) >= 50000
        """,
        "bpe_pair_stats": r"""
            WITH toks AS (
              SELECT string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS t
              FROM documents),
            tk AS (SELECT s AS word FROM toks, UNNEST(t) AS u(s)),
            wf AS (
              SELECT word, CAST(COUNT(*) AS BIGINT) AS n
              FROM tk WHERE len(word) >= 2 GROUP BY word),
            p AS (
              SELECT word[i:i+1] AS pair, n
              FROM wf, UNNEST(range(1, len(word))) AS t(i))
            SELECT pair, CAST(SUM(n) AS BIGINT) AS pair_count
            FROM p GROUP BY pair
            ORDER BY pair_count DESC, pair ASC LIMIT 20
        """,
        "order_ship_lag": """
            SELECT o_orderpriority,
                   COUNT(*) AS n_items,
                   MIN(date_diff('day', o_orderdate, l_shipdate)) AS min_lag,
                   MAX(date_diff('day', o_orderdate, l_shipdate)) AS max_lag,
                   ROUND(AVG(date_diff('day', o_orderdate, l_shipdate)), 4) AS avg_lag
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
        """,
        "events_sessionize": """
            WITH x AS (
              SELECT user_id, value, ts, event_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                          THEN 1 ELSE 0 END AS new_sess
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            y AS (
              SELECT user_id, value,
                     CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
              FROM x)
            SELECT user_id, session_id, COUNT(*) AS n_events,
                   ROUND(SUM(value), 4) AS sum_value
            FROM y GROUP BY user_id, session_id
        """,
        "events_session_window": """
            WITH x AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                          THEN 1 ELSE 0 END AS new_sess
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            y AS (
              SELECT user_id, ts,
                     SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS sid
              FROM x)
            SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
            FROM y GROUP BY user_id, sid
        """,
        "events_asof_order": """
            WITH o AS (
              SELECT o_custkey, o_orderdate, MAX(o_totalprice) AS last_price
              FROM orders GROUP BY o_custkey, o_orderdate)
            SELECT e.event_id, e.user_id, ROUND(o.last_price, 4) AS last_price
            FROM events e
            ASOF LEFT JOIN o
            ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        """,
        "events_type_pivot": """
            SELECT date_trunc('day', ts) AS day,
                   CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
                   CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
                   CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
                   CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
            FROM events GROUP BY 1
        """,
        "customer_set_ops": """
            SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
            EXCEPT
            SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        """,
        "customer_intersect": """
            SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
            INTERSECT
            SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        """,
        "customer_semijoin": """
            SELECT c_custkey, c_name FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        """,
        "events_value_quantiles": """
            SELECT event_type,
                   ROUND(quantile_cont(value, 0.5), 6) AS p50,
                   ROUND(quantile_cont(value, 0.9), 6) AS p90
            FROM events GROUP BY event_type
        """,
        "label_centroid_sim": """
            WITH dims AS (
              SELECT label, i - 1 AS pos,
                     CAST(ROUND(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
                                * 1000000) AS BIGINT) AS v
              FROM embeddings,
                   UNNEST(range(1, len(embedding) + 1)) AS u(i)),
            cent AS (
              SELECT label, pos, CAST(SUM(v) AS BIGINT) AS c
              FROM dims GROUP BY label, pos),
            norms AS (
              SELECT label, CAST(SUM(c * c) AS BIGINT) AS norm2
              FROM cent GROUP BY label),
            dots AS (
              SELECT a.label AS label_a, b.label AS label_b,
                     CAST(SUM(a.c * b.c) AS BIGINT) AS dot
              FROM cent a JOIN cent b
                ON a.pos = b.pos AND a.label < b.label
              GROUP BY 1, 2)
            SELECT d.label_a, d.label_b,
                   ROUND(CAST(d.dot AS DOUBLE)
                         / sqrt(CAST(na.norm2 AS DOUBLE)
                                * CAST(nb.norm2 AS DOUBLE)), 6) AS cosine
            FROM dots d
            JOIN norms na ON na.label = d.label_a
            JOIN norms nb ON nb.label = d.label_b
        """,
        "session_associations": """
            WITH x AS (
              SELECT user_id, ts, event_id, event_type,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                          THEN 1 ELSE 0 END AS new_sess
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            y AS (
              SELECT user_id, event_type,
                     SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS sid
              FROM x),
            st AS (SELECT DISTINCT user_id, sid, event_type FROM y),
            ns AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions
              FROM (SELECT DISTINCT user_id, sid FROM st) s),
            singles AS (
              SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_single
              FROM st GROUP BY event_type),
            pairs AS (
              SELECT a.event_type AS antecedent, b.event_type AS consequent,
                     CAST(COUNT(*) AS BIGINT) AS n_both
              FROM st a JOIN st b
                ON a.user_id = b.user_id AND a.sid = b.sid
               AND a.event_type <> b.event_type
              GROUP BY 1, 2)
            SELECT p.antecedent, p.consequent, p.n_both,
                   CAST(1000000 * p.n_both // ns.n_sessions AS BIGINT) AS support_ppm,
                   CAST(1000000 * p.n_both // sa.n_single AS BIGINT) AS confidence_ppm,
                   CAST((1000000 * p.n_both * ns.n_sessions)
                        // (sa.n_single * sc.n_single) AS BIGINT) AS lift_ppm
            FROM pairs p
            JOIN singles sa ON sa.event_type = p.antecedent
            JOIN singles sc ON sc.event_type = p.consequent
            CROSS JOIN ns
        """,
        "source_sample_k": """
            SELECT source, doc_id FROM (
              SELECT source, doc_id,
                     ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY md5('sample|' || CAST(doc_id AS VARCHAR))
                     ) AS rn
              FROM documents) t
            WHERE rn <= 3
        """,
        "session_paths": """
            WITH x AS (
              SELECT user_id, ts, event_id, event_type,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                          THEN 1 ELSE 0 END AS new_sess
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            y AS (
              SELECT user_id, ts, event_id, event_type,
                     SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS sid
              FROM x),
            p AS (
              SELECT user_id, sid,
                     string_agg(event_type, '>' ORDER BY ts, event_id) AS path
              FROM y GROUP BY user_id, sid)
            SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
            FROM p GROUP BY path
            ORDER BY n_sessions DESC, path ASC LIMIT 20
        """,
        "events_retention": """
            WITH d AS (
              SELECT user_id, date_trunc('day', ts) AS day FROM events),
            cohort AS (
              SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id),
            act AS (
              SELECT DISTINCT d.user_id, c.cohort_day,
                     CAST(date_diff('day', c.cohort_day, d.day) AS BIGINT)
                       AS offset_days
              FROM d JOIN cohort c USING (user_id))
            SELECT cohort_day, offset_days,
                   CAST(COUNT(*) AS BIGINT) AS n_active_users
            FROM act GROUP BY cohort_day, offset_days
        """,
        "events_grouping_sets": """
            SELECT date_trunc('day', ts) AS day, event_type,
                   CAST(GROUPING(date_trunc('day', ts)) * 2
                        + GROUPING(event_type) AS BIGINT) AS gid,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events
            GROUP BY GROUPING SETS ((date_trunc('day', ts)), (event_type), ())
        """,
        "events_moving_sum": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS day,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2)
            SELECT event_type, day, n,
                   CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
                     AS n_7d
            FROM daily
        """,
        "doc_length_ntiles": """
            WITH tiled AS (
              SELECT NTILE(10) OVER (ORDER BY n_chars, doc_id) AS bucket,
                     n_chars
              FROM documents)
            SELECT CAST(bucket AS INT) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   MIN(n_chars) AS min_chars,
                   MAX(n_chars) AS max_chars,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM tiled GROUP BY bucket
        """,
        "events_unpivot": """
            SELECT CAST(user_id % 10 AS INT) AS bucket, event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1, 2
        """,
        "events_funnel": """
            WITH s1 AS (
              SELECT user_id, MIN(ts) AS t1 FROM events
              WHERE event_type = 'view' GROUP BY user_id),
            s2 AS (
              SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
              JOIN s1 USING (user_id)
              WHERE e.event_type = 'click' AND e.ts > s1.t1
              GROUP BY e.user_id),
            s3 AS (
              SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
              JOIN s2 USING (user_id)
              WHERE e.event_type = 'purchase' AND e.ts > s2.t2
              GROUP BY e.user_id)
            SELECT CAST(1 AS INT) AS step, 'view' AS step_name,
                   CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
            UNION ALL
            SELECT CAST(2 AS INT), 'click', CAST(COUNT(*) AS BIGINT) FROM s2
            UNION ALL
            SELECT CAST(3 AS INT), 'purchase', CAST(COUNT(*) AS BIGINT) FROM s3
        """,
        "events_transitions": """
            WITH lagged AS (
              SELECT user_id,
                     LAG(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS src_type,
                     event_type AS dst_type
              FROM events)
            SELECT src_type, dst_type,
                   CAST(COUNT(*) AS BIGINT) AS n_transitions,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM lagged WHERE src_type IS NOT NULL
            GROUP BY src_type, dst_type
        """,
        "events_mad_outliers": """
            WITH v AS (
              SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS vc
              FROM events),
            med AS (
              SELECT event_type,
                     CAST(quantile_cont(vc * 2, 0.5) AS BIGINT) AS med2c
              FROM v GROUP BY event_type),
            dev AS (
              SELECT v.event_type, med.med2c,
                     ABS(v.vc * 2 - med.med2c) AS dev2c
              FROM v JOIN med USING (event_type)),
            mad AS (
              SELECT event_type,
                     CAST(quantile_cont(dev2c * 2, 0.5) AS BIGINT) AS mad4c,
                     CAST(COUNT(*) AS BIGINT) AS n_events
              FROM dev GROUP BY event_type)
            SELECT d.event_type, m.n_events,
                   CAST(d.med2c * 5000 AS BIGINT) AS med_micro,
                   CAST(m.mad4c * 2500 AS BIGINT) AS mad_micro,
                   CAST(SUM(CASE WHEN 2 * d.dev2c > 3 * m.mad4c
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
            FROM dev d JOIN mad m USING (event_type)
            GROUP BY d.event_type, m.n_events, d.med2c, m.mad4c
        """,
        "shipping_priority": """
            SELECT l_orderkey, o_orderdate,
                   CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                        * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))), 4) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
              AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC, l_orderkey ASC
            LIMIT 10
        """,
        "revenue_rollup": """
            SELECT l_returnflag, l_linestatus,
                   CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                        * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))), 4) AS DOUBLE) AS revenue,
                   COUNT(*) AS n_rows
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        # 3-iteration weighted PageRank, BIGINT fixed-point (10^12 units,
        # truncating //): summation order cannot change a bit, so this
        # matches the Spark integer pipeline exactly.
        "host_pagerank": _PAGERANK_SQL + """
            SELECT host, rank_units FROM i3
        """,
        "line_dedup_docs": r"""
            WITH d AS (
              SELECT doc_id,
                     regexp_replace(trim(text), '(\S+ \S+) ', '\1' || chr(10), 'g') AS text
              FROM documents),
            parts AS (SELECT doc_id, string_split(text, chr(10)) AS p FROM d),
            l0 AS (
              SELECT doc_id, CAST(i AS INT) AS pos, trim(p[i]) AS line
              FROM parts, UNNEST(range(1, len(p) + 1)) AS t(i)),
            heavy AS (
              SELECT line FROM l0 GROUP BY line HAVING COUNT(*) >= 20)
            SELECT l.doc_id,
                   COALESCE(string_agg(CASE WHEN h.line IS NULL THEN l.line END,
                                       chr(10) ORDER BY l.pos), '') AS text_clean,
                   COUNT(*) AS n_lines,
                   CAST(SUM(CASE WHEN h.line IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_dropped
            FROM l0 l LEFT JOIN heavy h ON l.line = h.line
            GROUP BY l.doc_id
        """,
        "url_dedup_normalize": r"""
            WITH u AS (
              SELECT doc_id,
                     'https://' || source || '.test/doc/' || CAST(doc_id AS VARCHAR) AS url
              FROM documents),
            r AS (
              SELECT doc_id,
                     url || CASE CAST(doc_id % 4 AS INT)
                              WHEN 0 THEN '?utm_source=feed&b=2&a=1#frag'
                              WHEN 1 THEN '?b=2&utm_medium=email&a=1'
                              WHEN 2 THEN '?a=1&b=2'
                              ELSE '#section' END AS url_raw
              FROM u),
            n AS (
              SELECT doc_id, url_raw,
                     regexp_extract(url_raw, '^([^#]*)', 1) AS no_frag
              FROM r),
            p AS (
              SELECT doc_id, url_raw,
                     regexp_extract(no_frag, '^([^?]*)', 1) AS pre,
                     COALESCE(regexp_extract(no_frag, '^[^?]*\?(.*)$', 1), '') AS q
              FROM n),
            sh AS (
              SELECT doc_id, url_raw, pre, q,
                     regexp_extract(pre, '^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/]*)', 1)
                       AS scheme_host
              FROM p),
            norm AS (
              SELECT doc_id, url_raw,
                     CASE WHEN scheme_host = '' THEN pre
                          ELSE lower(scheme_host) || substr(pre, len(scheme_host) + 1)
                     END AS pre_norm,
                     COALESCE(array_to_string(
                       list_sort(list_filter(string_split(q, '&'),
                         x -> x <> '' AND NOT regexp_matches(
                           x, '^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid|igshid)='))),
                       '&'), '') AS qs
              FROM sh)
            SELECT doc_id, url_raw,
                   CASE WHEN qs = '' THEN pre_norm
                        ELSE pre_norm || '?' || qs END AS url_norm
            FROM norm
        """,
        # NFC composes 'e' + chr(769) (combining acute) to 'é'; control
        # bytes stripped; whitespace runs collapsed; trimmed.
        "clean_text": r"""
            SELECT doc_id,
                   trim(regexp_replace(
                     regexp_replace(
                       nfc_normalize(chr(9) || ' ' || text || ' ' || chr(1) || chr(1)
                                     || ' caf' || 'e' || chr(769)),
                       '[\x00-\x08\x0b-\x1f\x7f]', '', 'g'),
                     '\s+', ' ', 'g')) AS text_clean
            FROM documents
        """,
        "doc_length_outliers": """
            WITH u AS (
              SELECT source || '.test' AS host, doc_id, n_chars FROM documents),
            pr AS (
              SELECT host, doc_id, n_chars,
                     ROUND(percent_rank() OVER (
                       PARTITION BY host ORDER BY n_chars ASC, doc_id ASC), 6)
                       AS len_pr
              FROM u)
            SELECT host, doc_id, n_chars, len_pr
            FROM pr WHERE len_pr >= 0.05 AND len_pr <= 0.95
        """,
        "corpus_sample_mix": """
            WITH h AS (
              SELECT *,
                     ('0x' || substr(md5('mix1|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                       % 1000000 AS ppm
              FROM documents),
            kept AS (
              SELECT * FROM h
              WHERE ppm < CASE source
                            WHEN 'src0' THEN 1000000
                            WHEN 'src1' THEN 500000
                            WHEN 'src2' THEN 250000
                            ELSE 100000 END)
            SELECT source, COUNT(*) AS n_sampled,
                   MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
            FROM kept GROUP BY source
        """,
        "corpus_split": """
            WITH h AS (
              SELECT *,
                     ('0x' || substr(md5('split1|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                       % 1000000 AS ppm
              FROM documents),
            s AS (
              SELECT *, CASE
                          WHEN ppm >= 0 AND ppm < 100000 THEN 'test'
                          WHEN ppm >= 100000 AND ppm < 900000 THEN 'train'
                          WHEN ppm >= 900000 AND ppm < 1000000 THEN 'val'
                        END AS split
              FROM h)
            SELECT split, lang, COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM s GROUP BY split, lang
        """,
        # RFC 9309 robots algebra mirrored in DuckDB list lambdas:
        # parse rule lines -> compile to anchored regex (escape specials,
        # '*' -> '.*', trailing '$' anchors) -> longest-match, Allow wins
        # spec ties (spec*2+allow max-packing), no match -> allowed.
        "robots_rfc_gate": r"""
            WITH u AS (
              SELECT doc_id, source || '.test' AS host,
                     '/doc/' || CAST(doc_id AS VARCHAR) AS path,
                     CAST(regexp_extract(source, '(\d+)', 1) AS INT) % 3 AS g
              FROM documents),
            b AS (
              SELECT *,
                     CASE g
                       WHEN 0 THEN 'User-agent: *' || chr(10) || 'Disallow: /doc/1*'
                                   || chr(10) || 'Allow: /doc/1$' || chr(10) || 'Allow: /doc/12*'
                       WHEN 1 THEN 'Disallow: /doc/*3$' || chr(10) || 'Allow: /doc/3$'
                                   || chr(10) || 'Disallow: /doc/4*' || chr(10) || 'Allow: /doc/4*'
                       ELSE '' END AS blob
              FROM u),
            r AS (
              SELECT *,
                     list_transform(
                       list_filter(string_split(blob, chr(10)),
                                   l -> regexp_matches(l, '^(Allow|Disallow):\s*\S')),
                       l -> {'allow': starts_with(l, 'Allow'),
                             'path': regexp_replace(l, '^(Allow|Disallow):\s*', '')}
                     ) AS rules
              FROM b),
            c AS (
              SELECT *,
                     list_transform(rules, x -> {
                       'allow': x.allow,
                       'spec': len(x.path),
                       'pattern': '^' ||
                         regexp_replace(
                           regexp_replace(
                             CASE WHEN x.path LIKE '%$'
                                  THEN substr(x.path, 1, len(x.path) - 1)
                                  ELSE x.path END,
                             '([.\\+?(){}\[\]|^$])', '\\\1', 'g'),
                           '\*', '.*', 'g')
                         || CASE WHEN x.path LIKE '%$' THEN '$' ELSE '' END
                     }) AS compiled
              FROM r),
            m AS (
              SELECT doc_id, host,
                     list_transform(
                       list_filter(compiled, x -> regexp_matches(path, x.pattern)),
                       x -> x.spec * 2 + CAST(x.allow AS INT)) AS packed
              FROM c)
            SELECT doc_id, host,
                   CASE WHEN len(packed) = 0 THEN true
                        ELSE list_aggregate(packed, 'max') % 2 = 1 END AS allowed
            FROM m
        """,
        # identical XML built both sides; the oracle extracts by regex,
        # Spark parses with native from_xml — the parser is the DUT
        "sitemap_entries": """
            WITH u AS (
              SELECT doc_id, source || '.test' AS host,
                     'https://' || source || '.test/doc/' || CAST(doc_id AS VARCHAR) AS url
              FROM documents),
            e AS (
              SELECT host, doc_id,
                     '<url><loc>' || url || '</loc><lastmod>2026-0'
                     || CAST(doc_id % 9 + 1 AS VARCHAR)
                     || '-15</lastmod><priority>0.'
                     || CAST(doc_id % 9 AS VARCHAR) || '</priority></url>' AS entry
              FROM u),
            x AS (
              SELECT host,
                     '<urlset>' || string_agg(entry, '' ORDER BY doc_id) || '</urlset>' AS xml
              FROM e GROUP BY host),
            p AS (
              SELECT host,
                     regexp_extract_all(xml, '<loc>([^<]*)</loc>', 1) AS locs,
                     regexp_extract_all(xml, '<lastmod>([^<]*)</lastmod>', 1) AS lms,
                     regexp_extract_all(xml, '<priority>([^<]*)</priority>', 1) AS prs
              FROM x)
            SELECT host, trim(locs[i]) AS loc, lms[i] AS lastmod,
                   CAST(prs[i] AS DOUBLE) AS priority
            FROM p, UNNEST(range(1, len(locs) + 1)) AS t(i)
            WHERE trim(locs[i]) <> ''
        """,
        # Index-hop pipeline vs directly-computed expected entries: the
        # Spark side must parse the <sitemapindex>, join the child
        # corpus, and parse children to reproduce exactly these rows.
        "sitemap_index_entries": """
            WITH u AS (
              SELECT doc_id, source || '.test' AS host,
                     'https://' || source || '.test/doc/'
                       || CAST(doc_id AS VARCHAR) AS url
              FROM documents)
            SELECT host, url AS loc,
                   '2026-0' || CAST(doc_id % 9 + 1 AS VARCHAR) || '-15'
                     AS lastmod,
                   CAST('0.' || CAST(doc_id % 9 AS VARCHAR) AS DOUBLE)
                     AS priority
            FROM u
        """,
        "crawl_delay_budgets": r"""
            WITH h AS (
              SELECT DISTINCT source || '.test' AS host FROM documents),
            g AS (
              SELECT host,
                     CAST(regexp_extract(host, '(\d+)', 1) AS INT) % 4 AS grp
              FROM h),
            b AS (
              SELECT host,
                     CASE grp
                       WHEN 0 THEN 'User-agent: *' || chr(10) || 'Crawl-delay: 10'
                                   || chr(10) || 'Disallow: /x'
                       WHEN 1 THEN 'crawl-Delay: 0.5'
                       WHEN 2 THEN 'Disallow: /y'
                       ELSE 'CRAWL-DELAY: 7200' END AS blob
              FROM g),
            d AS (
              SELECT host,
                     COALESCE(
                       TRY_CAST(regexp_extract(blob, '(?mi)^crawl-delay:\s*([0-9]+(?:\.[0-9]+)?)', 1)
                                AS DOUBLE), 0.0) AS delay
              FROM b)
            SELECT host, ROUND(delay, 4) AS crawl_delay,
                   CASE WHEN delay <= 0 THEN 100
                        ELSE GREATEST(CAST(FLOOR(3600.0 / delay) AS BIGINT), 1)
                   END AS budget
            FROM d
        """,
        "anchor_terms": r"""
            WITH l AS (
              SELECT 'https://t.test/p' || CAST(doc_id % 20 AS VARCHAR) AS target,
                     array_to_string(
                       string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ')[1:3],
                       ' ') AS anchor_text
              FROM documents),
            t AS (
              SELECT target, term
              FROM l, UNNEST(list_filter(string_split(
                     lower(regexp_replace(trim(anchor_text), '\s+', ' ', 'g')), ' '),
                     x -> x <> '')) AS u(term)),
            c AS (
              SELECT target, term, COUNT(*) AS n FROM t GROUP BY target, term),
            r AS (
              SELECT target, term, n,
                     ROW_NUMBER() OVER (PARTITION BY target
                                        ORDER BY n DESC, term ASC) AS rank
              FROM c)
            SELECT target, term, n, CAST(rank AS INT) AS rank
            FROM r WHERE rank <= 3
        """,
        "pii_scrub": """
            WITH p AS (
              SELECT doc_id,
                     substr(text, 1, 40)
                     || CASE WHEN doc_id % 3 = 0 THEN
                          ' mail ' || source || '_' || CAST(doc_id AS VARCHAR)
                          || '@ex' || CAST(doc_id % 7 AS VARCHAR) || '.org'
                        ELSE '' END
                     || CASE WHEN doc_id % 4 = 1 THEN
                          ' from 10.' || CAST(doc_id % 200 AS VARCHAR)
                          || '.3.' || CAST(doc_id % 250 AS VARCHAR)
                        ELSE '' END
                     || CASE WHEN doc_id % 5 = 2 THEN
                          ' call +1 (202) 555-01'
                          || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                        ELSE '' END AS t
              FROM documents)
            SELECT doc_id,
                   CAST(len(regexp_extract_all(t,
                     '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}'))
                     AS BIGINT) AS n_email,
                   CAST(len(regexp_extract_all(t,
                     '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b')) AS BIGINT) AS n_ipv4,
                   CAST(len(regexp_extract_all(t,
                     '\\+\\d[\\d ().\\-]{5,16}\\d')) AS BIGINT) AS n_phone,
                   md5(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(t,
                           '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g'),
                         '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'),
                       '\\+\\d[\\d ().\\-]{5,16}\\d', '<PHONE>', 'g')
                   ) AS scrub_md5
            FROM p
        """,
        "sitemap_discovery": f"""
            WITH h AS (SELECT DISTINCT host FROM ({_DOC_URLS_SQL})),
            g AS (
              SELECT host,
                     CAST(regexp_extract(host, '(\\d+)', 1) AS INT) % 4 AS grp
              FROM h),
            b AS (
              SELECT host,
                     CASE grp
                       WHEN 0 THEN 'User-agent: *' || chr(10)
                                   || 'Sitemap: https://' || host || '/sitemap.xml'
                                   || chr(10) || 'Disallow: /x'
                       WHEN 1 THEN 'sitemap: https://' || host || '/sm1.xml'
                                   || chr(13) || chr(10) || 'SITEMAP:' || chr(9)
                                   || 'https://' || host || '/sm2.xml'
                       WHEN 2 THEN 'Disallow: /y'
                       ELSE '  Sitemap: https://' || host || '/a.xml#frag'
                     END AS blob
              FROM g),
            l AS (
              SELECT host,
                     regexp_extract_all(blob,
                       '(?mi)^[ \\t]*sitemap:[ \\t]*(\\S+)', 1) AS urls
              FROM b)
            SELECT host,
                   urls[CAST(i AS INT) + 1] AS sitemap_url,
                   CAST(i AS BIGINT) AS sitemap_order
            FROM l, UNNEST(range(len(urls))) AS t(i)
        """,
        "temperature_mix": """
            WITH c AS (
              SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
            w AS (
              SELECT source, n_docs,
                     CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT)
                       AS w
              FROM c)
            SELECT source, n_docs,
                   (w * 1000000) // CAST(SUM(w) OVER () AS BIGINT) AS weight_ppm
            FROM w
        """,
        "temperature_resample": """
            WITH c AS (
              SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
            w AS (
              SELECT source, n_docs,
                     CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT)
                       AS w
              FROM c),
            wp AS (
              SELECT source, n_docs,
                     (w * 1000000) // CAST(SUM(w) OVER () AS BIGINT) AS weight_ppm
              FROM w),
            k AS (
              SELECT source,
                     LEAST(CAST(1000000 AS BIGINT),
                           (weight_ppm * 2000) // n_docs) AS keep_ppm
              FROM wp),
            kept AS (
              SELECT d.source, d.doc_id
              FROM documents d JOIN k USING (source)
              WHERE ('0x' || substr(md5('temp1|' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
                      % 1000000 < keep_ppm)
            SELECT source, COUNT(*) AS n_kept,
                   MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
            FROM kept GROUP BY source
        """,
        "change_rate_recrawl": """
            WITH h AS (
              SELECT user_id AS url_hash, ts,
                     event_type AS content_hash,
                     epoch_us(ts) AS us,
                     LAG(event_type) OVER w AS prev_hash,
                     LAG(epoch_us(ts)) OVER w AS prev_us
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            per AS (
              SELECT url_hash,
                     COUNT(*) AS n_fetches,
                     COUNT(prev_us) AS n_intervals,
                     CAST(SUM(CASE WHEN content_hash <> prev_hash
                                   THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
                     CAST(SUM(us - prev_us) AS BIGINT) AS total_gap_us,
                     MAX(ts) AS last_fetch
              FROM h GROUP BY url_hash),
            est AS (
              SELECT *,
                     CASE WHEN n_intervals > 0 THEN
                       -ln((CAST(n_intervals AS DOUBLE) - n_changes + 0.5)
                           / (n_intervals + 0.5))
                       / (CAST(total_gap_us AS DOUBLE) / n_intervals
                          / 86400000000.0)
                     END AS rate
              FROM per)
            SELECT url_hash, n_fetches, n_intervals, n_changes, total_gap_us,
                   ROUND(rate, 6) AS rate_per_day,
                   ROUND(1.0 - exp(-rate * GREATEST(
                     (epoch_us(TIMESTAMP '2024-01-31 06:00:00')
                      - epoch_us(last_fetch)) / 86400000000.0, 0.0)), 6)
                     AS stale_prob
            FROM est
        """,
        "corpus_filter_pipeline": """
            WITH b AS (
              SELECT doc_id, trim(text) AS t,
                     string_split_regex(lower(trim(text)), '\\s+') AS toks
              FROM documents),
            m AS (
              SELECT doc_id,
                     length(t) AS n_chars,
                     CASE WHEN t = '' THEN 0 ELSE len(toks) END AS n_tok,
                     len(list_distinct(toks)) AS n_distinct,
                     length(regexp_replace(t, '[^!-/:-@\\[-`{-~]', '', 'g')) AS punct,
                     len(list_intersect(list_distinct(toks),
                         ['the','and','of','to','a','in','is','that'])) AS stop_hits,
                     len(list_intersect(list_distinct(toks),
                         ['der','die','das','und','ist','nicht','ein','zu'])) AS de,
                     len(list_intersect(list_distinct(toks),
                         ['the','and','of','to','a','in','is','that'])) AS en,
                     len(list_intersect(list_distinct(toks),
                         ['le','la','les','et','est','un','une','que'])) AS fr,
                     len(list_intersect(list_distinct(toks),
                         ['el','la','los','de','que','es','un','una'])) AS es,
                     len(list_intersect(list_distinct(toks),
                         ['\u7684','\u662f','\u4e86','\u5728','\u6211','\u6709','\u548c','\u4e0d'])) AS zh
              FROM b),
            q AS (
              SELECT doc_id, n_tok,
                     CAST(
                       FLOOR(350 * LEAST(n_chars, 500) / 500.0)
                     + (CASE WHEN n_tok > 0 THEN FLOOR(250.0 * n_distinct / n_tok) ELSE 0 END)
                     + FLOOR(250 * LEAST(stop_hits, 4) / 4.0)
                     + (CASE WHEN n_chars > 0
                             THEN FLOOR(150.0 * GREATEST(n_chars - LEAST(punct * 5, n_chars), 0) / n_chars)
                             ELSE 0 END)
                     AS INT) AS quality,
                     CASE WHEN GREATEST(en,de,fr,es,zh) = 0 THEN 'und'
                          WHEN de = GREATEST(en,de,fr,es,zh) THEN 'de'
                          WHEN en = GREATEST(en,de,fr,es,zh) THEN 'en'
                          WHEN es = GREATEST(en,de,fr,es,zh) THEN 'es'
                          WHEN fr = GREATEST(en,de,fr,es,zh) THEN 'fr'
                          ELSE 'zh' END AS lang_id
              FROM m)
            SELECT doc_id, n_tok AS n_tokens, quality, lang_id,
                   CASE WHEN n_tok < 5 THEN 'too_short'
                        WHEN quality < 300 THEN 'low_quality'
                        WHEN lang_id = 'und' THEN 'unknown_lang' END AS drop_reason,
                   (n_tok >= 5 AND quality >= 300 AND lang_id <> 'und') AS keep
            FROM q
        """,
        "trap_signatures": _TRAP_CAND_SQL + """
            per AS (
              SELECT host, sig, CAST(COUNT(*) AS BIGINT) AS n_urls,
                     CAST(COUNT(DISTINCT discovered_by) AS BIGINT) AS n_parents,
                     MAX(depth) AS max_depth
              FROM sig3 GROUP BY host, sig),
            ph AS (SELECT host, CAST(SUM(n_urls) AS BIGINT) AS host_urls
                   FROM per GROUP BY host)
            SELECT per.host, sig, n_urls, n_parents, max_depth, host_urls,
                   ROUND(CAST(n_urls AS DOUBLE) / host_urls, 6) AS host_share,
                   (n_urls > 30 AND CAST(n_urls AS DOUBLE) / host_urls > 0.5)
                     AS is_trap
            FROM per JOIN ph USING (host)
        """,
        "trap_gate_survivors": _TRAP_CAND_SQL + """
            per AS (
              SELECT host, sig, COUNT(*) AS n_urls
              FROM sig3 GROUP BY host, sig),
            ph AS (SELECT host, CAST(SUM(n_urls) AS BIGINT) AS host_urls
                   FROM per GROUP BY host),
            trapped AS (
              SELECT per.host, sig FROM per JOIN ph USING (host)
              WHERE n_urls > 30 AND CAST(n_urls AS DOUBLE) / host_urls > 0.5)
            SELECT s.host, s.url
            FROM sig3 s
            LEFT JOIN trapped t ON s.host = t.host AND s.sig = t.sig
            WHERE t.sig IS NULL
              AND NOT COALESCE(list_max(list_transform(
                    list_distinct(list_filter(string_split(s.path, '/'),
                                              seg -> seg <> '')),
                    d -> len(list_filter(list_filter(string_split(s.path, '/'),
                                                     seg -> seg <> ''),
                             seg -> seg = d)))) >= 3, FALSE)
        """,
        "politeness_schedule": """
            WITH u AS (""" + _DOC_URLS_SQL + """),
            sel AS (
              SELECT host, doc_id, source,
                     ROW_NUMBER() OVER (
                       PARTITION BY host
                       ORDER BY n_chars DESC, doc_id ASC) AS rn
              FROM u)
            SELECT host, doc_id,
                   CAST(rn - 1 AS BIGINT) AS fetch_seq,
                   CAST((rn - 1) * CAST(FLOOR(
                     ((CAST(regexp_extract(source, '([0-9]+)', 1) AS BIGINT) % 4)
                      * 0.5 + 0.5) * 1000 + 0.5) AS BIGINT) AS BIGINT)
                     AS scheduled_at_ms
            FROM sel WHERE rn <= 5
        """,
        "events_sessions": """
            WITH o AS (
              SELECT user_id, event_id, ts, value,
                     CASE WHEN LAG(ts) OVER w IS NULL
                          OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            g AS (
              SELECT *, SUM(new_s) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS sid
              FROM o)
            SELECT user_id,
                   MIN(ts) AS session_start,
                   MAX(ts) + INTERVAL 30 MINUTE AS session_end,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   ROUND(CAST(SUM(value) AS DOUBLE), 4) AS sum_value
            FROM g GROUP BY user_id, sid
        """,
        "redirect_resolution": _REDIRECT_WALK_SQL + """
            fin2 AS (SELECT 1)
            SELECT u.doc_id, u.url,
                   CASE WHEN f.src IS NULL OR f.mh > 8 THEN u.url
                        ELSE f.fin_url END AS final_url,
                   CAST(CASE WHEN f.src IS NULL OR f.mh > 8 THEN 0
                             ELSE f.mh END AS BIGINT) AS n_hops,
                   CASE WHEN f.src IS NULL THEN 'direct'
                        WHEN f.mh > 8 THEN 'too_many'
                        ELSE 'redirected' END AS status
            FROM u LEFT JOIN fin f ON u.url = f.src
        """,
        "dust_clusters": f"""
            WITH ad AS ({_ALIASED_DOCS_SQL}),
            h AS (SELECT md5(text) AS content_hash, url, host FROM ad)
            SELECT content_hash,
                   MIN(url) AS canonical_url,
                   CAST(COUNT(*) AS BIGINT) AS n_aliases,
                   CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts
            FROM h GROUP BY content_hash
            HAVING COUNT(*) >= 2
        """,
        "mirror_hosts": f"""
            WITH ad AS ({_ALIASED_DOCS_SQL}),
            hh AS (SELECT DISTINCT md5(text) AS content_hash, host FROM ad),
            sized AS (
              SELECT content_hash FROM hh GROUP BY content_hash
              HAVING COUNT(*) BETWEEN 2 AND 64)
            SELECT a.host AS host_a, b.host AS host_b,
                   CAST(COUNT(*) AS BIGINT) AS n_shared
            FROM hh a JOIN hh b USING (content_hash)
            JOIN sized USING (content_hash)
            WHERE a.host < b.host
            GROUP BY a.host, b.host
            HAVING COUNT(*) >= 2
        """,
        "revalidation_wave": f"""
            WITH u AS ({_DOC_URLS_SQL}),
            docs AS (
              SELECT u.doc_id, u.url, u.host, d.text
              FROM u JOIN documents d USING (doc_id)),
            log AS (
              SELECT url,
                     CASE WHEN doc_id % 4 = 1
                          THEN '"' || md5(text || 'v0') || '"'
                          ELSE '"' || md5(text) || '"' END AS stored_etag
              FROM docs WHERE doc_id % 5 <> 2),
            cls AS (
              SELECT d.host,
                     l.stored_etag IS NOT NULL AS conditional,
                     l.stored_etag IS NOT NULL
                       AND l.stored_etag = '"' || md5(d.text) || '"' AS is_304,
                     length(d.text) AS n_bytes
              FROM docs d LEFT JOIN log l ON d.url = l.url)
            SELECT host,
                   CAST(SUM(CASE WHEN is_304 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_304,
                   CAST(SUM(CASE WHEN is_304 THEN 0 ELSE 1 END) AS BIGINT)
                     AS n_200,
                   CAST(SUM(CASE WHEN conditional THEN 0 ELSE 1 END) AS BIGINT)
                     AS n_unconditional,
                   CAST(SUM(CASE WHEN is_304 THEN n_bytes ELSE 0 END)
                     AS BIGINT) AS bytes_saved,
                   CAST(SUM(CASE WHEN is_304 THEN 0 ELSE n_bytes END)
                     AS BIGINT) AS bytes_fetched
            FROM cls GROUP BY host
        """,
        "adaptive_delays": f"""
            WITH u AS ({_DOC_URLS_SQL}),
            log AS (
              SELECT host,
                     CASE WHEN doc_id % 17 = 0 THEN 503 ELSE 200 END AS status,
                     CAST(50 + (doc_id * 37) % 400
                          + CASE WHEN CAST(regexp_extract(source, '([0-9]+)', 1)
                                       AS BIGINT) % 3 = 1
                                 THEN 1200 ELSE 0 END AS BIGINT) AS latency_ms
              FROM u),
            agg AS (
              SELECT host,
                     CAST(COUNT(*) AS BIGINT) AS n_fetches,
                     CAST(SUM(CASE WHEN status >= 400 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_errors,
                     CAST(FLOOR(quantile_cont(latency_ms, 0.95)) AS BIGINT)
                       AS p95_latency_ms
              FROM log GROUP BY host),
            d AS (
              SELECT *,
                     CAST(FLOOR(n_errors * 1000000.0 / n_fetches) AS BIGINT)
                       AS err_ppm
              FROM agg)
            SELECT host, n_fetches, n_errors, err_ppm, p95_latency_ms,
                   CAST(LEAST(GREATEST(
                     CASE WHEN err_ppm > 50000
                          THEN 1000 * CAST(POW(2, LEAST(
                            CAST(CEIL(err_ppm / 50000.0) AS BIGINT), 4))
                            AS BIGINT)
                          WHEN p95_latency_ms > 1000 THEN 1000
                          ELSE 500 END, 250), 16000) AS BIGINT)
                     AS next_delay_ms
            FROM d
        """,
        "frontier_priority": _PAGERANK_SQL + """
            , cand AS (
              SELECT doc_id, source || '.test' AS host,
                     doc_id % 4 + 1 AS depth
              FROM documents)
            SELECT c.doc_id, c.host, c.depth,
                   CAST(r.rank_units // (1 + c.depth) AS BIGINT)
                     AS priority_units
            FROM cand c JOIN i3 r USING (host)
            ORDER BY priority_units DESC, c.doc_id ASC
            LIMIT 100
        """,
        # HLL p=6: bucket = h % 64, rho over the remaining 54 bits via
        # the bin() bit-length (both engines strip leading zeros).
        "hll_registers": f"""
            WITH u AS ({_DOC_URLS_SQL}),
            h AS (
              SELECT ('0x' || substr(md5(url), 1, 15))::BIGINT AS h
              FROM u)
            SELECT h % 64 AS bucket,
                   MAX(CASE WHEN h // 64 = 0 THEN 55
                            ELSE 54 - length(bin(h // 64)) + 1 END)
                     AS max_rho
            FROM h GROUP BY bucket
        """,
        # Estimator shared with hll_host_cardinality: absent registers
        # contribute 2^40 to the harmonic sum and count as zeros; the
        # linear-counting branch indexes the exact precomputed
        # round(64*ln(64/z)) table (identical literal in sketches.py).
        "hll_estimate": f"""
            WITH u AS ({_DOC_URLS_SQL}),
            h AS (
              SELECT ('0x' || substr(md5(url), 1, 15))::BIGINT AS h
              FROM u),
            reg AS (
              SELECT h % 64 AS bucket,
                     MAX(CASE WHEN h // 64 = 0 THEN 55
                              ELSE 54 - length(bin(h // 64)) + 1 END)
                       AS max_rho
              FROM h GROUP BY bucket),
            agg AS (
              SELECT CAST(COALESCE(SUM(1::BIGINT
                              << CAST(greatest(40 - max_rho, 0) AS INTEGER)),
                            0) AS BIGINT)
                       + (64::BIGINT - COUNT(*)) * (1::BIGINT << 40) AS s,
                     CAST(64 - COUNT(*) AS BIGINT) AS zeros
              FROM reg),
            rawe AS (
              SELECT zeros,
                     709340::BIGINT
                       * ((4096::BIGINT * (1::BIGINT << 40)) // s)
                       // 1000000 AS raw
              FROM agg)
            SELECT CAST(CASE WHEN zeros > 0 AND raw <= 160
                             THEN ([{_HLL_LC_TABLE}])[CAST(zeros AS INTEGER)]
                             ELSE raw END AS BIGINT) AS estimate_units
            FROM rawe
        """,
        # Sketch-merge union: per-subset registers MAX-merged, then the
        # shared estimator — byte-identical arithmetic to hll_estimate.
        "hll_union_estimate": f"""
            WITH u AS ({_DOC_URLS_SQL}),
            ha AS (
              SELECT ('0x' || substr(md5(url), 1, 15))::BIGINT AS h
              FROM u WHERE doc_id % 3 <> 0),
            hb AS (
              SELECT ('0x' || substr(md5(url), 1, 15))::BIGINT AS h
              FROM u WHERE doc_id % 2 <> 0),
            rega AS (
              SELECT h % 64 AS bucket,
                     MAX(CASE WHEN h // 64 = 0 THEN 55
                              ELSE 54 - length(bin(h // 64)) + 1 END)
                       AS max_rho
              FROM ha GROUP BY bucket),
            regb AS (
              SELECT h % 64 AS bucket,
                     MAX(CASE WHEN h // 64 = 0 THEN 55
                              ELSE 54 - length(bin(h // 64)) + 1 END)
                       AS max_rho
              FROM hb GROUP BY bucket),
            merged AS (
              SELECT bucket, MAX(max_rho) AS max_rho
              FROM (SELECT * FROM rega UNION ALL SELECT * FROM regb)
              GROUP BY bucket),
            agg AS (
              SELECT CAST(COALESCE(SUM(1::BIGINT
                              << CAST(greatest(40 - max_rho, 0) AS INTEGER)),
                            0) AS BIGINT)
                       + (64::BIGINT - COUNT(*)) * (1::BIGINT << 40) AS s,
                     CAST(64 - COUNT(*) AS BIGINT) AS zeros
              FROM merged),
            rawe AS (
              SELECT zeros,
                     709340::BIGINT
                       * ((4096::BIGINT * (1::BIGINT << 40)) // s)
                       // 1000000 AS raw
              FROM agg)
            SELECT CAST(CASE WHEN zeros > 0 AND raw <= 160
                             THEN ([{_HLL_LC_TABLE}])[CAST(zeros AS INTEGER)]
                             ELSE raw END AS BIGINT) AS estimate_units
            FROM rawe
        """,
        # Grouped HLL: one register HashAggregate keyed (host, bucket),
        # per-host estimate from the same shared arithmetic.
        "hll_host_cardinality": f"""
            WITH u AS ({_DOC_URLS_SQL}),
            h AS (
              SELECT host,
                     ('0x' || substr(md5(path), 1, 15))::BIGINT AS h
              FROM u),
            reg AS (
              SELECT host, h % 64 AS bucket,
                     MAX(CASE WHEN h // 64 = 0 THEN 55
                              ELSE 54 - length(bin(h // 64)) + 1 END)
                       AS max_rho
              FROM h GROUP BY host, bucket),
            agg AS (
              SELECT host,
                     CAST(COALESCE(SUM(1::BIGINT
                              << CAST(greatest(40 - max_rho, 0) AS INTEGER)),
                            0) AS BIGINT)
                       + (64::BIGINT - COUNT(*)) * (1::BIGINT << 40) AS s,
                     CAST(64 - COUNT(*) AS BIGINT) AS zeros
              FROM reg GROUP BY host),
            rawe AS (
              SELECT host, zeros,
                     709340::BIGINT
                       * ((4096::BIGINT * (1::BIGINT << 40)) // s)
                       // 1000000 AS raw
              FROM agg)
            SELECT host,
                   CAST(CASE WHEN zeros > 0 AND raw <= 160
                             THEN ([{_HLL_LC_TABLE}])[CAST(zeros AS INTEGER)]
                             ELSE raw END AS BIGINT) AS estimate_units
            FROM rawe
        """,
        # relational Bloom: positions (h1 + i*h2) % m from two md5
        # salts; positive = all k positions in the member bit set.
        "bloom_fpr_audit": f"""
            WITH u AS ({_DOC_URLS_SQL}),
            mh AS (
              SELECT url,
                     ('0x' || substr(md5('b1|' || url), 1, 15))::BIGINT
                       % 1024 AS h1,
                     ('0x' || substr(md5('b2|' || url), 1, 15))::BIGINT
                       % 1023 + 1 AS h2
              FROM u WHERE doc_id % 2 = 0),
            mpos AS (
              SELECT DISTINCT (h1 + t.i * h2) % 1024 AS pos
              FROM mh, UNNEST([0, 1, 2]) AS t(i)),
            ch AS (
              SELECT url,
                     ('0x' || substr(md5('b1|' || url), 1, 15))::BIGINT
                       % 1024 AS h1,
                     ('0x' || substr(md5('b2|' || url), 1, 15))::BIGINT
                       % 1023 + 1 AS h2
              FROM u),
            cpos AS (
              SELECT url, (h1 + t.i * h2) % 1024 AS pos
              FROM ch, UNNEST([0, 1, 2]) AS t(i)),
            hits AS (
              SELECT c.url,
                     SUM(CASE WHEN mp.pos IS NOT NULL THEN 1 ELSE 0 END)
                       AS n_hits
              FROM cpos c LEFT JOIN mpos mp USING (pos)
              GROUP BY 1)
            SELECT u.url,
                   CAST(CASE WHEN u.doc_id % 2 = 0 THEN 1 ELSE 0 END
                     AS INTEGER) AS truly_seen,
                   CAST(CASE WHEN n_hits = 3 THEN 1 ELSE 0 END
                     AS INTEGER) AS bloom_positive
            FROM hits JOIN u USING (url)
        """,
        # rolling 7-day HLL: per-day registers, window-merged by
        # (win_day, bucket) MAX; same p=6 register/estimate arithmetic
        # as hll_host_cardinality, day spine from the data itself.
        "events_rolling_distinct": f"""
            WITH e AS (
              SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
                       AS day_idx,
                     CAST(user_id AS VARCHAR) AS k
              FROM events),
            h AS (
              SELECT day_idx,
                     ('0x' || substr(md5(k), 1, 15))::BIGINT AS h
              FROM e),
            reg AS (
              SELECT day_idx, h % 64 AS bucket,
                     MAX(CASE WHEN h // 64 = 0 THEN 55
                              ELSE 54 - length(bin(h // 64)) + 1 END)
                       AS max_rho
              FROM h GROUP BY 1, 2),
            days AS (SELECT DISTINCT day_idx AS win_day FROM e),
            contrib AS (
              SELECT day_idx + t.o AS win_day, bucket, max_rho
              FROM reg, UNNEST(generate_series(0, 6)) AS t(o)),
            m AS (
              SELECT c.win_day, bucket, MAX(max_rho) AS max_rho
              FROM contrib c JOIN days USING (win_day)
              GROUP BY 1, 2),
            agg AS (
              SELECT win_day,
                     CAST(COALESCE(SUM(1::BIGINT
                              << CAST(greatest(40 - max_rho, 0) AS INTEGER)),
                            0) AS BIGINT)
                       + (64::BIGINT - COUNT(*)) * (1::BIGINT << 40) AS s,
                     CAST(64 - COUNT(*) AS BIGINT) AS zeros
              FROM m GROUP BY win_day),
            rawe AS (
              SELECT win_day, zeros,
                     709340::BIGINT
                       * ((4096::BIGINT * (1::BIGINT << 40)) // s)
                       // 1000000 AS raw
              FROM agg)
            SELECT CAST(win_day AS BIGINT) AS win_day,
                   CAST(CASE WHEN zeros > 0 AND raw <= 160
                             THEN ([{_HLL_LC_TABLE}])[CAST(zeros AS INTEGER)]
                             ELSE raw END AS BIGINT) AS estimate_units
            FROM rawe
        """,
        # Count-min d=4 × w=1024: cell = hash60(row || '|' || host) %
        # 1024; estimate = min over rows of the matching counter.
        "cms_hot_hosts": f"""
            WITH u AS ({_DOC_URLS_SQL}),
            probes AS (
              SELECT host, k AS row FROM u, UNNEST([0, 1, 2, 3]) AS t(k)),
            counters AS (
              SELECT row,
                     ('0x' || substr(md5(CAST(row AS VARCHAR) || '|' || host),
                                     1, 15))::BIGINT % 1024 AS cell,
                     COUNT(*) AS cnt
              FROM probes GROUP BY 1, 2),
            cand AS (SELECT DISTINCT host FROM u),
            cp AS (
              SELECT host, k AS row,
                     ('0x' || substr(md5(CAST(k AS VARCHAR) || '|' || host),
                                     1, 15))::BIGINT % 1024 AS cell
              FROM cand, UNNEST([0, 1, 2, 3]) AS t(k))
            SELECT cp.host,
                   CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS cm_estimate
            FROM cp LEFT JOIN counters c USING (row, cell)
            GROUP BY cp.host
            ORDER BY cm_estimate DESC, cp.host ASC
            LIMIT 20
        """,
        # Integer BM25 (k1=1.2/b=0.75 in ppt; idf = bit-length log2 of
        # 1000*N/df) — mirrors datapipe/search.bm25_topk unit by unit.
        "bm25_search": _BM25_CORE_SQL + r"""
            SELECT doc_id,
                   CAST(SUM(tf_ppm * idf_units) AS BIGINT) AS score_units,
                   CAST(COUNT(*) AS BIGINT) AS n_hit_terms
            FROM scored GROUP BY doc_id
            ORDER BY score_units DESC, doc_id ASC
            LIMIT 20
        """,
        # RRF hybrid: BM25 top-20 + cosine top-20 (rounded 6dp like
        # embedding_topk) fused with 10^6 div (60 + rank).
        "hybrid_search": _BM25_CORE_SQL + f"""
            , bm AS (
              SELECT doc_id,
                     CAST(SUM(tf_ppm * idf_units) AS BIGINT) AS score_units
              FROM scored GROUP BY doc_id
              ORDER BY score_units DESC, doc_id ASC LIMIT 20),
            bmr AS (
              SELECT doc_id,
                     ROW_NUMBER() OVER (ORDER BY score_units DESC, doc_id ASC)
                       AS rank
              FROM bm),
            cosx AS (
              SELECT vec_id AS doc_id,
                     ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                           CAST({_QUERY_VEC} AS DOUBLE[])), 6) AS cosine
              FROM embeddings
              ORDER BY cosine DESC, vec_id ASC LIMIT 20),
            cosr AS (
              SELECT doc_id,
                     ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id ASC)
                       AS rank
              FROM cosx),
            parts AS (
              SELECT doc_id, 1000000 // (60 + rank) AS part FROM bmr
              UNION ALL
              SELECT doc_id, 1000000 // (60 + rank) AS part FROM cosr)
            SELECT doc_id, CAST(SUM(part) AS BIGINT) AS rrf_units,
                   CAST(COUNT(*) AS BIGINT) AS n_lists
            FROM parts GROUP BY doc_id
            ORDER BY rrf_units DESC, doc_id ASC
            LIMIT 10
        """,
        # CDC full-outer diff; unchanged rows filtered out.
        "snapshot_diff": f"""
            WITH u AS ({_DOC_URLS_SQL}),
            b AS (
              SELECT u.url, d.doc_id, d.text
              FROM u JOIN documents d USING (doc_id)),
            snap_old AS (
              SELECT url, md5(text) AS content_sig
              FROM b WHERE doc_id % 11 <> 3),
            snap_new AS (
              SELECT url,
                     CASE WHEN doc_id % 5 = 0 THEN md5(text || '|rev2')
                          ELSE md5(text) END AS content_sig
              FROM b WHERE doc_id % 11 <> 7)
            SELECT * FROM (
              SELECT COALESCE(n.url, o.url) AS url,
                     CASE WHEN o.url IS NULL THEN 'added'
                          WHEN n.url IS NULL THEN 'removed'
                          WHEN o.content_sig <> n.content_sig
                            THEN 'changed' END AS change_type,
                     o.content_sig AS old_content_sig,
                     n.content_sig AS new_content_sig
              FROM snap_old o FULL OUTER JOIN snap_new n ON o.url = n.url)
            WHERE change_type IS NOT NULL
        """,
        # Order-independent export manifest: shard hash-mod + BIT_XOR
        # content signature (associative/commutative, overflow-free).
        "corpus_shard_manifest": """
            WITH s AS (
              SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                       ::BIGINT % 8 AS shard,
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                                         || md5(text)), 1, 15))::BIGINT
                       AS sig
              FROM documents)
            SELECT CAST(shard AS INTEGER) AS shard,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(bit_xor(sig) AS BIGINT) AS xor_sig
            FROM s GROUP BY shard
        """,
        # Log2×8-sub-bucket histogram — integer bucketing via bin()
        # bit-length (msb) + the next 3 bits (sub); floors/ceils bound
        # every member of the bucket.
        "latency_histogram": """
            WITH u AS (
              SELECT doc_id,
                     CAST((doc_id * 37) % 4000 + 50 AS BIGINT) AS lat
              FROM documents),
            b AS (
              SELECT CASE WHEN lat <= 0 THEN 0
                          ELSE length(bin(lat)) END AS msb,
                     CASE WHEN lat <= 0 OR length(bin(lat)) <= 3 THEN 0
                          ELSE CAST(lat // (1::BIGINT
                                   << CAST(length(bin(lat)) - 4 AS INTEGER))
                               AS INTEGER) - 8 END AS sub
              FROM u)
            SELECT msb, sub, CAST(COUNT(*) AS BIGINT) AS cnt,
                   CASE WHEN msb = 0 THEN 0
                        WHEN msb <= 3 THEN (1::BIGINT << CAST(msb - 1 AS INTEGER))
                        ELSE (8::BIGINT + sub)
                             * (1::BIGINT << CAST(msb - 4 AS INTEGER)) END
                     AS bucket_floor,
                   CASE WHEN msb = 0 THEN 0
                        WHEN msb <= 3 THEN (1::BIGINT << CAST(msb AS INTEGER)) - 1
                        ELSE (8::BIGINT + sub + 1)
                             * (1::BIGINT << CAST(msb - 4 AS INTEGER)) - 1 END
                     AS bucket_ceil
            FROM b GROUP BY msb, sub
        """,
        # Nearest-rank percentile intervals off the cumulative histogram.
        "latency_percentiles": """
            WITH u AS (
              SELECT doc_id,
                     CAST((doc_id * 37) % 4000 + 50 AS BIGINT) AS lat
              FROM documents),
            b AS (
              SELECT CASE WHEN lat <= 0 THEN 0
                          ELSE length(bin(lat)) END AS msb,
                     CASE WHEN lat <= 0 OR length(bin(lat)) <= 3 THEN 0
                          ELSE CAST(lat // (1::BIGINT
                                   << CAST(length(bin(lat)) - 4 AS INTEGER))
                               AS INTEGER) - 8 END AS sub
              FROM u),
            hist AS (
              SELECT msb, sub, CAST(COUNT(*) AS BIGINT) AS cnt,
                     CASE WHEN msb = 0 THEN 0
                          WHEN msb <= 3 THEN (1::BIGINT << CAST(msb - 1 AS INTEGER))
                          ELSE (8::BIGINT + sub)
                               * (1::BIGINT << CAST(msb - 4 AS INTEGER)) END
                       AS bucket_floor,
                     CASE WHEN msb = 0 THEN 0
                          WHEN msb <= 3 THEN (1::BIGINT << CAST(msb AS INTEGER)) - 1
                          ELSE (8::BIGINT + sub + 1)
                               * (1::BIGINT << CAST(msb - 4 AS INTEGER)) - 1 END
                       AS bucket_ceil
              FROM b GROUP BY msb, sub),
            cum AS (
              SELECT bucket_floor, bucket_ceil,
                     CAST(SUM(cnt) OVER (ORDER BY bucket_floor) AS BIGINT) AS cum,
                     CAST(SUM(cnt) OVER () AS BIGINT) AS total
              FROM hist),
            perc AS (SELECT unnest([50, 95, 99]) AS p),
            sel AS (
              SELECT p.p AS percentile, MIN(c.bucket_floor) AS lo_floor
              FROM perc p JOIN cum c
                ON c.cum >= (p.p * c.total + 99) // 100
              GROUP BY p.p)
            SELECT s.percentile, c.bucket_floor AS lo, c.bucket_ceil AS hi
            FROM sel s JOIN cum c ON c.bucket_floor = s.lo_floor
        """,
        # Incremental ≡ direct: the oracle is the DIRECT rollup over the
        # new state; the Spark side arrives via old rollup ⊕ CDC delta.
        "incremental_rollup": f"""
            WITH u AS ({_DOC_URLS_SQL}),
            nstate AS (
              SELECT host,
                     CASE WHEN doc_id % 5 = 0 THEN n_chars + 37
                          ELSE n_chars END AS n_chars
              FROM u WHERE doc_id % 11 <> 7)
            SELECT host, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars
            FROM nstate GROUP BY host
        """,
        # HITS: same edge CTEs as the PageRank prefix (unreferenced
        # PageRank iteration CTEs are never evaluated), 2 unrolled
        # iterations of the integer spec in datapipe/graph.hits_hosts.
        "host_hits": _PAGERANK_SQL + """
            , inw AS (SELECT dst_host, CAST(SUM(weight) AS BIGINT) AS in_w
                      FROM edges GROUP BY 1),
            ew2 AS (
              SELECT e.src_host, e.dst_host,
                     (CAST(e.weight AS BIGINT) * 1000000)
                       // CAST(o.out_w AS BIGINT) AS out_share_ppm,
                     (CAST(e.weight AS BIGINT) * 1000000)
                       // i.in_w AS in_share_ppm
              FROM edges e JOIN outw o USING (src_host)
                           JOIN inw i USING (dst_host)),
            h0 AS (SELECT host, (SELECT r0 FROM consts) AS hub FROM hosts),
            a1r AS (
              SELECT e.dst_host AS host,
                     CAST(SUM((h.hub // 1000000) * e.out_share_ppm) AS BIGINT) AS raw
              FROM ew2 e JOIN h0 h ON e.src_host = h.host GROUP BY 1),
            a1f AS (SELECT h.host, CAST(COALESCE(r.raw, 0) AS BIGINT) AS x
                    FROM hosts h LEFT JOIN a1r r USING (host)),
            a1t AS (SELECT CAST(SUM(x) AS BIGINT) AS t FROM a1f),
            a1 AS (SELECT host, CASE WHEN (SELECT t FROM a1t) // 1000000 <= 0 THEN 0
                          ELSE (x * 1000000) // ((SELECT t FROM a1t) // 1000000) END AS auth
                   FROM a1f),
            h1r AS (
              SELECT e.src_host AS host,
                     CAST(SUM((a.auth // 1000000) * e.in_share_ppm) AS BIGINT) AS raw
              FROM ew2 e JOIN a1 a ON e.dst_host = a.host GROUP BY 1),
            h1f AS (SELECT h.host, CAST(COALESCE(r.raw, 0) AS BIGINT) AS x
                    FROM hosts h LEFT JOIN h1r r USING (host)),
            h1t AS (SELECT CAST(SUM(x) AS BIGINT) AS t FROM h1f),
            h1 AS (SELECT host, CASE WHEN (SELECT t FROM h1t) // 1000000 <= 0 THEN 0
                          ELSE (x * 1000000) // ((SELECT t FROM h1t) // 1000000) END AS hub
                   FROM h1f),
            a2r AS (
              SELECT e.dst_host AS host,
                     CAST(SUM((h.hub // 1000000) * e.out_share_ppm) AS BIGINT) AS raw
              FROM ew2 e JOIN h1 h ON e.src_host = h.host GROUP BY 1),
            a2f AS (SELECT h.host, CAST(COALESCE(r.raw, 0) AS BIGINT) AS x
                    FROM hosts h LEFT JOIN a2r r USING (host)),
            a2t AS (SELECT CAST(SUM(x) AS BIGINT) AS t FROM a2f),
            a2 AS (SELECT host, CASE WHEN (SELECT t FROM a2t) // 1000000 <= 0 THEN 0
                          ELSE (x * 1000000) // ((SELECT t FROM a2t) // 1000000) END AS auth
                   FROM a2f),
            h2r AS (
              SELECT e.src_host AS host,
                     CAST(SUM((a.auth // 1000000) * e.in_share_ppm) AS BIGINT) AS raw
              FROM ew2 e JOIN a2 a ON e.dst_host = a.host GROUP BY 1),
            h2f AS (SELECT h.host, CAST(COALESCE(r.raw, 0) AS BIGINT) AS x
                    FROM hosts h LEFT JOIN h2r r USING (host)),
            h2t AS (SELECT CAST(SUM(x) AS BIGINT) AS t FROM h2f),
            h2 AS (SELECT host, CASE WHEN (SELECT t FROM h2t) // 1000000 <= 0 THEN 0
                          ELSE (x * 1000000) // ((SELECT t FROM h2t) // 1000000) END AS hub
                   FROM h2f)
            SELECT a2.host AS host, CAST(a2.auth AS BIGINT) AS auth_units,
                   CAST(h2.hub AS BIGINT) AS hub_units
            FROM a2 JOIN h2 ON a2.host = h2.host
        """,
        # Longest-public-suffix match, same frozen PSL sample as
        # functions/domains._PSL_SAMPLE.
        "registrable_domains": """
            WITH d AS (SELECT doc_id, source FROM documents),
            h0 AS (
              SELECT DISTINCT
                CASE WHEN doc_id % 97 = 0 THEN 'github.io'
                     ELSE ['', 'www.', 'a.b.'][CAST(doc_id % 3 AS INT) + 1]
                          || source || '.'
                          || ['com', 'co.uk', 'github.io', 'com.au', 'xyzzy']
                             [CAST(doc_id % 5 AS INT) + 1]
                END AS host
              FROM d),
            lab AS (
              SELECT host, string_split(host, '.') AS labels,
                     CAST(len(string_split(host, '.')) AS INT) AS n
              FROM h0),
            cand AS (
              SELECT host, labels, n,
                     unnest(generate_series(1, least(3, n))) AS k
              FROM lab),
            psl(suffix) AS (VALUES
              ('com'), ('net'), ('org'), ('io'), ('ai'), ('dev'), ('app'),
              ('test'), ('edu'), ('gov'),
              ('co.uk'), ('org.uk'), ('ac.uk'), ('gov.uk'),
              ('com.au'), ('net.au'), ('org.au'),
              ('co.jp'), ('co.in'), ('com.br'), ('com.cn'),
              ('github.io'), ('gitlab.io'), ('blogspot.com'),
              ('herokuapp.com'), ('s3.amazonaws.com')),
            j AS (
              SELECT c.host, c.labels, c.n,
                     CASE WHEN p.suffix IS NOT NULL THEN c.k END AS mk
              FROM cand c LEFT JOIN psl p
                ON array_to_string(c.labels[c.n - CAST(c.k AS INT) + 1:c.n], '.')
                   = p.suffix),
            m AS (
              SELECT host, any_value(labels) AS labels, any_value(n) AS n,
                     CAST(COALESCE(MAX(mk), 1) AS INT) AS k
              FROM j GROUP BY host)
            SELECT host,
                   array_to_string(labels[n - k + 1:n], '.') AS suffix,
                   CASE WHEN n > k
                        THEN array_to_string(labels[n - k:n], '.')
                   END AS registrable_domain
            FROM m
        """,
        # Float-free Gini over per-host URL counts; identical CASE guard
        # as operators/fairness.host_load_gini.
        "frontier_fairness": f"""
            WITH u AS ({_DOC_URLS_SQL}),
            c AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS x
                  FROM u GROUP BY host),
            r AS (SELECT host, x,
                         CAST(ROW_NUMBER() OVER (ORDER BY x, host) AS BIGINT) AS i
                  FROM c),
            a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(x) AS BIGINT) AS t,
                         CAST(SUM(i * x) AS BIGINT) AS s
                  FROM r),
            tp AS (SELECT CAST(SUM(r.x) AS BIGINT) AS top_x
                   FROM r, a WHERE r.i > a.n - GREATEST(1, a.n // 10))
            SELECT a.n AS n_hosts, a.t AS total,
                   CAST(CASE WHEN a.n * a.t >= 1000000000000
                        THEN (2*a.s - (a.n+1)*a.t) // ((a.n * a.t) // 1000000)
                        ELSE ((2*a.s - (a.n+1)*a.t) * 1000000) // (a.n * a.t)
                   END AS BIGINT) AS gini_ppm,
                   CAST((tp.top_x * 1000000) // a.t AS BIGINT)
                     AS top_decile_share_ppm
            FROM a, tp
        """,
        # The oracle reproduces the doc_id -> (type, byte length)
        # arithmetic; the Spark side actually synthesizes the bytes and
        # sniffs the magic prefix (real-sniff unit tests in
        # tests/test_datapipe.py cover each magic).
        "waterfill_budgets": f"""
            WITH u AS ({_DOC_URLS_SQL}),
            c AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS d
                  FROM u GROUP BY host),
            r AS (SELECT host, d,
                    CAST(ROW_NUMBER() OVER (ORDER BY d, host) AS BIGINT) AS k,
                    CAST(SUM(d) OVER (ORDER BY d, host
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pfx
                  FROM c),
            a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(d) AS BIGINT) AS total FROM c),
            f AS (SELECT CAST(COALESCE(MAX(k), 0) AS BIGINT) AS kstar,
                         CAST(COALESCE(arg_max(pfx, k), 0) AS BIGINT) AS pstar
                  FROM r, a WHERE pfx + d * (n - k) <= 300),
            s AS (SELECT n, total, kstar, pstar,
                         CASE WHEN total > 300
                              THEN (300 - pstar) // (n - kstar) END AS lvl,
                         CASE WHEN total > 300
                              THEN 300 - pstar
                                   - ((300 - pstar) // (n - kstar)) * (n - kstar)
                         END AS rem
                  FROM a, f)
            SELECT r.host, r.d AS demand,
                   CAST(CASE WHEN s.total <= 300 THEN r.d
                        WHEN r.k <= s.kstar THEN r.d
                        WHEN r.k <= s.kstar + s.rem THEN s.lvl + 1
                        ELSE s.lvl END AS BIGINT) AS quota
            FROM r, s
        """,
        "doc_chunks": r"""
            WITH t AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\s+') AS ts
              FROM documents WHERE trim(text) <> ''),
            c AS (
              SELECT doc_id, ts, len(ts) AS n,
                     UNNEST(range(0, len(ts), 28)) AS start
              FROM t)
            SELECT doc_id,
                   CAST(start // 28 AS INT) AS chunk_idx,
                   CAST(start AS BIGINT) AS start_tok,
                   CAST(LEAST(32, n - start) AS BIGINT) AS n_tokens,
                   array_to_string(ts[start + 1:start + 32], ' ') AS chunk_text
            FROM c WHERE start = 0 OR start + 4 < n
        """,
        "pack_manifest": """
            WITH d AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\\s+'))
                     END AS tc,
                     ('0x' || substr(md5('pack1|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                       % 1000000 AS ppm
              FROM documents),
            s AS (SELECT doc_id, ppm, ppm % 8 AS shard,
                         CAST(LEAST(256, tc) AS BIGINT) AS tok
                  FROM d),
            c AS (SELECT *, CAST(SUM(tok) OVER (
                      PARTITION BY shard ORDER BY ppm, doc_id) AS BIGINT) AS cum
                  FROM s),
            p AS (SELECT shard,
                         CASE WHEN tok > 0 THEN (cum - 1) // 256
                              ELSE cum // 256 END AS pack_idx,
                         tok
                  FROM c)
            SELECT CAST(shard AS INT) AS shard,
                   CAST(pack_idx AS BIGINT) AS pack_idx,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(tok) AS BIGINT) AS pack_tokens,
                   CAST((SUM(tok) * 1000000) // 256 AS BIGINT) AS fill_ppm
            FROM p GROUP BY shard, pack_idx
        """,
        "phrase_search": r"""
            WITH t AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\s+') AS ts
              FROM documents),
            p AS (
              SELECT doc_id, UNNEST(list_transform(
                       range(1, len(ts) + 1),
                       i -> {'pos': i - 1, 'token': ts[i]})) AS u
              FROM t),
            q(qidx, token) AS (VALUES (0, 'slow'), (1, 'hash'), (2, 'batch')),
            h AS (SELECT doc_id, p.u.pos - q.qidx AS anchor, q.qidx
                  FROM p JOIN q ON p.u.token = q.token),
            o AS (SELECT doc_id, anchor FROM h
                  GROUP BY doc_id, anchor
                  HAVING COUNT(DISTINCT qidx) = 3 AND anchor >= 0)
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
                   CAST(MIN(anchor) AS BIGINT) AS first_pos
            FROM o GROUP BY doc_id
        """,
        "lm_bits_score": r"""
            WITH toks AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\s+') AS ts
              FROM documents),
            inst AS (
              SELECT doc_id, UNNEST(list_transform(
                       range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])) AS bigram
              FROM toks WHERE len(ts) >= 2),
            i2 AS (SELECT doc_id, bigram,
                          string_split(bigram, ' ')[1] AS w1
                   FROM inst),
            uc AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS uc FROM i2 GROUP BY w1),
            bc AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS bc
                   FROM i2 GROUP BY bigram),
            sc AS (SELECT doc_id,
                          length(bin(u.uc)) - length(bin(b.bc)) AS bits
                   FROM i2 JOIN bc b USING (bigram) JOIN uc u USING (w1))
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                   CAST(SUM(bits) AS BIGINT) AS total_bits,
                   CAST((SUM(bits) * 1000000) // COUNT(*) AS BIGINT)
                     AS mean_bits_ppm
            FROM sc GROUP BY doc_id
        """,
        "substring_dup_spans": r"""
            WITH toks AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\s+') AS ts
              FROM documents),
            g0 AS (
              SELECT doc_id, UNNEST(list_transform(
                       range(1, GREATEST(len(ts) - 8, -1) + 2),
                       i -> {'pos': i - 1,
                             'gh': substr(md5(array_to_string(ts[i:i+7], ' ')), 1, 15)}
                     )) AS u
              FROM toks WHERE len(ts) >= 8),
            g1 AS (SELECT doc_id, u.pos AS pos, u.gh AS gh FROM g0),
            tf_ok AS (SELECT doc_id, gh FROM g1
                      GROUP BY doc_id, gh HAVING COUNT(*) <= 8),
            g2 AS (SELECT g1.* FROM g1 JOIN tf_ok USING (doc_id, gh)),
            df_ok AS (SELECT gh FROM g2
                      GROUP BY gh HAVING COUNT(DISTINCT doc_id) <= 64),
            g AS (SELECT g2.* FROM g2 JOIN df_ok USING (gh)),
            p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                         a.pos AS pa, b.pos AS pb, a.pos - b.pos AS diag
                  FROM g a JOIN g b ON a.gh = b.gh AND a.doc_id < b.doc_id),
            r AS (SELECT *, pa - ROW_NUMBER() OVER (
                      PARTITION BY id_a, id_b, diag ORDER BY pa) AS island
                  FROM p),
            s AS (SELECT id_a, id_b,
                         CAST(COUNT(*) + 7 AS BIGINT) AS span_tokens,
                         CAST(MIN(pa) AS BIGINT) AS sa,
                         CAST(MIN(pb) AS BIGINT) AS sb
                  FROM r GROUP BY id_a, id_b, diag, island
                  HAVING COUNT(*) + 7 >= 8),
            agg AS (SELECT id_a, id_b,
                         CAST(MAX(span_tokens) AS BIGINT) AS max_span_tokens,
                         CAST(COUNT(*) AS BIGINT) AS n_spans,
                         MIN((1048575 - span_tokens) * (1::BIGINT << 40)
                             + sa * (1::BIGINT << 20) + sb) AS p
                  FROM s GROUP BY id_a, id_b)

            SELECT id_a, id_b, max_span_tokens, n_spans,
                   CAST((p >> 20) & 1048575 AS BIGINT) AS start_a,
                   CAST(p & 1048575 AS BIGINT) AS start_b
            FROM agg
        """,
        "substring_dedup_docs": r"""
            WITH toks AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\s+') AS ts
              FROM documents),
            g0 AS (
              SELECT doc_id, UNNEST(list_transform(
                       range(1, GREATEST(len(ts) - 8, -1) + 2),
                       i -> {'pos': i - 1,
                             'gh': substr(md5(array_to_string(ts[i:i+7], ' ')), 1, 15)}
                     )) AS u
              FROM toks WHERE len(ts) >= 8),
            g1 AS (SELECT doc_id, u.pos AS pos, u.gh AS gh FROM g0),
            tf_ok AS (SELECT doc_id, gh FROM g1
                      GROUP BY doc_id, gh HAVING COUNT(*) <= 8),
            g2 AS (SELECT g1.* FROM g1 JOIN tf_ok USING (doc_id, gh)),
            df_ok AS (SELECT gh FROM g2
                      GROUP BY gh HAVING COUNT(DISTINCT doc_id) <= 64),
            g AS (SELECT g2.* FROM g2 JOIN df_ok USING (gh)),
            p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                         a.pos AS pa, b.pos AS pb, a.pos - b.pos AS diag
                  FROM g a JOIN g b ON a.gh = b.gh AND a.doc_id < b.doc_id),
            r AS (SELECT *, pa - ROW_NUMBER() OVER (
                      PARTITION BY id_a, id_b, diag ORDER BY pa) AS island
                  FROM p),
            s AS (SELECT id_a, id_b,
                         CAST(COUNT(*) + 7 AS BIGINT) AS span_tokens,
                         CAST(MIN(pa) AS BIGINT) AS sa,
                         CAST(MIN(pb) AS BIGINT) AS sb
                  FROM r GROUP BY id_a, id_b, diag, island
                  HAVING COUNT(*) + 7 >= 8),
            agg AS (SELECT id_a, id_b,
                         CAST(MAX(span_tokens) AS BIGINT) AS max_span_tokens,
                         CAST(COUNT(*) AS BIGINT) AS n_spans,
                         MIN((1048575 - span_tokens) * (1::BIGINT << 40)
                             + sa * (1::BIGINT << 20) + sb) AS p
                  FROM s GROUP BY id_a, id_b)

            SELECT d.doc_id, d.lang, d.source, d.n_chars
            FROM documents d
            WHERE d.doc_id NOT IN (SELECT id_b FROM agg)
        """,
        "media_sniff": """
            WITH d AS (SELECT doc_id FROM documents),
            t AS (SELECT doc_id,
                    ['png', 'jpeg', 'gif', 'pdf', 'unknown']
                      [CAST(doc_id % 5 AS INT) + 1] AS media_type,
                    [8, 3, 4, 4, 1][CAST(doc_id % 5 AS INT) + 1] + 16 AS len
                  FROM d)
            SELECT media_type, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(len) AS BIGINT) AS total_bytes
            FROM t GROUP BY media_type
        """,
        # Host-scoped template mining: the footer-injection prep (newline
        # every 2 tokens + per-host footer line) mirrors
        # _docs_with_host_footer; shares are exact BIGINT ppm (// ≡ div).
        "host_template_lines": _HOST_TEMPLATE_PREP_SQL + r"""
            SELECT pl.host, pl.line, pl.docs_with_line, hd.host_docs,
                   pl.docs_with_line * 1000000 // hd.host_docs AS share_ppm
            FROM pl JOIN hd USING (host)
            WHERE pl.docs_with_line * 1000000 // hd.host_docs >= 250000
        """,
        "host_template_strip": _HOST_TEMPLATE_PREP_SQL + r"""
            , tmpl AS (
              SELECT pl.host, pl.line
              FROM pl JOIN hd USING (host)
              WHERE pl.docs_with_line * 1000000 // hd.host_docs >= 250000)
            SELECT lp.doc_id, lp.host,
                   COALESCE(string_agg(CASE WHEN t.line IS NULL THEN lp.line END,
                                       chr(10) ORDER BY lp.pos), '') AS text_clean,
                   COUNT(*) AS n_lines,
                   CAST(SUM(CASE WHEN t.line IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_dropped
            FROM lp LEFT JOIN tmpl t ON lp.host = t.host AND lp.line = t.line
            GROUP BY lp.doc_id, lp.host
        """,
        # Per-host dominant predicted language: the langid CTE (same
        # marker algebra + CASE tie-break as the `langid` oracle) then
        # the same max/join/min argmax resolution as the Spark side;
        # exact BIGINT ppm shares (// ≡ div).
        "host_lang_profile": r"""
            WITH t AS (
              SELECT doc_id, source AS host,
                     list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS toks
              FROM documents),
            h AS (
              SELECT doc_id, host,
                len(list_intersect(toks, ['the','and','of','to','a','in','is','that'])) AS en,
                len(list_intersect(toks, ['der','die','das','und','ist','nicht','ein','zu'])) AS de,
                len(list_intersect(toks, ['le','la','les','et','est','un','une','que'])) AS fr,
                len(list_intersect(toks, ['el','la','los','de','que','es','un','una'])) AS es,
                len(list_intersect(toks, ['的','是','了','在','我','有','和','不'])) AS zh
              FROM t),
            p AS (
              SELECT host,
                     CASE WHEN GREATEST(en,de,fr,es,zh) = 0 THEN 'und'
                          WHEN de = GREATEST(en,de,fr,es,zh) THEN 'de'
                          WHEN en = GREATEST(en,de,fr,es,zh) THEN 'en'
                          WHEN es = GREATEST(en,de,fr,es,zh) THEN 'es'
                          WHEN fr = GREATEST(en,de,fr,es,zh) THEN 'fr'
                          ELSE 'zh' END AS lang
              FROM h),
            per AS (
              SELECT host, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
              FROM p GROUP BY host, lang),
            tot AS (
              SELECT host, CAST(SUM(n_docs) AS BIGINT) AS host_docs,
                     CAST(MAX(n_docs) AS BIGINT) AS dominant_docs
              FROM per GROUP BY host)
            SELECT per.host, tot.host_docs,
                   MIN(per.lang) AS dominant_lang,
                   tot.dominant_docs,
                   (tot.dominant_docs * 1000000) // tot.host_docs AS dominant_share_ppm
            FROM per JOIN tot
              ON per.host = tot.host AND per.n_docs = tot.dominant_docs
            GROUP BY per.host, tot.host_docs, tot.dominant_docs
        """,
        # RFC 9309 robots-cache scheduling: latest fetch per host
        # (max micros, tie -> max event_id), then the same access-state
        # CASE and exact BIGINT age arithmetic as the Spark operator.
        "robots_refetch": """
            WITH log AS (
              SELECT user_id AS host, epoch_us(ts) AS us,
                     CASE event_type WHEN 'error' THEN 503
                                     WHEN 'purchase' THEN 404
                                     WHEN 'signup' THEN 301
                                     ELSE 200 END AS status,
                     event_id
              FROM events),
            latest AS (SELECT host, MAX(us) AS last_fetch_us FROM log GROUP BY host),
            winner AS (
              SELECT l.host, l.last_fetch_us, MAX(g.event_id) AS win_tie
              FROM latest l JOIN log g
                ON g.host = l.host AND g.us = l.last_fetch_us
              GROUP BY l.host, l.last_fetch_us),
            last AS (
              SELECT w.host, w.last_fetch_us, g.status AS last_status
              FROM winner w JOIN log g
                ON g.host = w.host AND g.us = w.last_fetch_us
               AND g.event_id = w.win_tie),
            aged AS (
              SELECT host, last_fetch_us, last_status,
                     epoch_us(TIMESTAMP '2024-01-31 06:00:00') - last_fetch_us AS age_us
              FROM last)
            SELECT host, last_fetch_us, last_status,
                   age_us // 3600000000 AS age_hours,
                   CASE WHEN last_status < 400 THEN 'ok'
                        WHEN last_status < 500 THEN 'allow_all'
                        WHEN age_us <= 14 * 86400000000 THEN 'disallow_all'
                        ELSE 'stale_unreachable' END AS access_state,
                   age_us >= 24 * 3600000000 AS refetch_due
            FROM aged
        """,
        # Batch OPIC over the shared synthetic host graph: the same edge
        # CTE as host_pagerank, then 3 unrolled cash-distribution rounds
        # (hist' = hist + cash; cash' = Σ floor(cash/1e6)·share_ppm +
        # dangling_total // n) — all BIGINT, order-independent.
        "host_opic": _HOST_GRAPH_PREP_SQL + """
            , consts AS (
              SELECT CAST(1000000000000 // n_hosts AS BIGINT) AS c0,
                     CAST(n_hosts AS BIGINT) AS n
              FROM cnt),
            linked AS (SELECT DISTINCT src_host AS host FROM edges),
            s0 AS (
              SELECT host, CAST(0 AS BIGINT) AS hist,
                     (SELECT c0 FROM consts) AS cash
              FROM hosts),
            d1 AS (
              SELECT CAST(COALESCE(SUM(cash), 0) AS BIGINT) AS d
              FROM s0 WHERE host NOT IN (SELECT host FROM linked)),
            r1 AS (
              SELECT e.dst_host AS host,
                     SUM((s.cash // 1000000) * e.share_ppm) AS recv
              FROM ew e JOIN s0 s ON e.src_host = s.host GROUP BY 1),
            s1 AS (
              SELECT s.host, CAST(s.hist + s.cash AS BIGINT) AS hist,
                     CAST(COALESCE(r.recv, 0)
                          + (SELECT d FROM d1) // (SELECT n FROM consts)
                          AS BIGINT) AS cash
              FROM s0 s LEFT JOIN r1 r USING (host)),
            d2 AS (
              SELECT CAST(COALESCE(SUM(cash), 0) AS BIGINT) AS d
              FROM s1 WHERE host NOT IN (SELECT host FROM linked)),
            r2 AS (
              SELECT e.dst_host AS host,
                     SUM((s.cash // 1000000) * e.share_ppm) AS recv
              FROM ew e JOIN s1 s ON e.src_host = s.host GROUP BY 1),
            s2 AS (
              SELECT s.host, CAST(s.hist + s.cash AS BIGINT) AS hist,
                     CAST(COALESCE(r.recv, 0)
                          + (SELECT d FROM d2) // (SELECT n FROM consts)
                          AS BIGINT) AS cash
              FROM s1 s LEFT JOIN r2 r USING (host)),
            d3 AS (
              SELECT CAST(COALESCE(SUM(cash), 0) AS BIGINT) AS d
              FROM s2 WHERE host NOT IN (SELECT host FROM linked)),
            r3 AS (
              SELECT e.dst_host AS host,
                     SUM((s.cash // 1000000) * e.share_ppm) AS recv
              FROM ew e JOIN s2 s ON e.src_host = s.host GROUP BY 1),
            s3 AS (
              SELECT s.host, CAST(s.hist + s.cash AS BIGINT) AS hist,
                     CAST(COALESCE(r.recv, 0)
                          + (SELECT d FROM d3) // (SELECT n FROM consts)
                          AS BIGINT) AS cash
              FROM s2 s LEFT JOIN r3 r USING (host))
            SELECT host, hist AS history_units, cash AS cash_units,
                   CAST(hist + cash AS BIGINT) AS opic_units
            FROM s3
        """,
        # Per-host link reciprocity over the same host graph: weight
        # share over edges whose reverse also exists, exact BIGINT ppm.
        "host_reciprocity": _HOST_GRAPH_PREP_SQL + """
            SELECT e.src_host AS host,
                   CAST(SUM(e.weight) AS BIGINT) AS out_w,
                   CAST(COALESCE(SUM(CASE WHEN r.src_host IS NOT NULL
                                          THEN e.weight END), 0) AS BIGINT)
                     AS recip_w,
                   CAST(COALESCE(SUM(CASE WHEN r.src_host IS NOT NULL
                                          THEN e.weight END), 0) AS BIGINT)
                     * 1000000
                     // CAST(SUM(e.weight) AS BIGINT) AS recip_ppm
            FROM edges e LEFT JOIN edges r
              ON r.src_host = e.dst_host AND r.dst_host = e.src_host
            GROUP BY e.src_host
        """,
        # RSS/Atom feed ingestion: identical synthetic XML (format by
        # md5(host) parity), entries extracted with regexes — the Spark
        # side's from_xml parse + coalesce dispatch is what's checked.
        "feed_entries": r"""
            WITH u AS (
              SELECT doc_id, source || '.test' AS host,
                     'https://' || source || '.test/doc/' || CAST(doc_id AS VARCHAR) AS url,
                     CAST(doc_id AS VARCHAR) AS did,
                     CAST(doc_id % 28 + 1 AS VARCHAR) AS day,
                     ('0x' || substr(md5(source || '.test'), 1, 1))::BIGINT % 2 = 1 AS is_atom
              FROM documents),
            e AS (
              SELECT host, doc_id, is_atom,
                     CASE WHEN is_atom THEN
                       '<entry><link href="' || url || '"/><title>Doc ' || did
                       || '</title><updated>2026-01-' || day
                       || 'T00:00:00Z</updated><id>i' || did || '</id></entry>'
                     ELSE
                       '<item><link>' || url || '</link><title>Doc ' || did
                       || '</title><pubDate>' || day
                       || ' Jan 2026 00:00:00 GMT</pubDate><guid>g' || did
                       || '</guid></item>'
                     END AS entry
              FROM u),
            x AS (
              SELECT host, is_atom,
                     CASE WHEN is_atom
                          THEN '<feed>' || string_agg(entry, '' ORDER BY doc_id) || '</feed>'
                          ELSE '<rss version="2.0"><channel>'
                               || string_agg(entry, '' ORDER BY doc_id)
                               || '</channel></rss>' END AS xml
              FROM e GROUP BY host, is_atom),
            p AS (
              SELECT host, is_atom,
                     CASE WHEN is_atom
                          THEN regexp_extract_all(xml, 'href="([^"]*)"', 1)
                          ELSE regexp_extract_all(xml, '<link>([^<]*)</link>', 1)
                     END AS links,
                     regexp_extract_all(xml, '<title>([^<]*)</title>', 1) AS titles,
                     CASE WHEN is_atom
                          THEN regexp_extract_all(xml, '<updated>([^<]*)</updated>', 1)
                          ELSE regexp_extract_all(xml, '<pubDate>([^<]*)</pubDate>', 1)
                     END AS pubs,
                     CASE WHEN is_atom
                          THEN regexp_extract_all(xml, '<id>([^<]*)</id>', 1)
                          ELSE regexp_extract_all(xml, '<guid>([^<]*)</guid>', 1)
                     END AS ids
              FROM x)
            SELECT host, CAST(i - 1 AS INT) AS entry_order,
                   trim(links[i]) AS link, titles[i] AS title,
                   pubs[i] AS published, ids[i] AS entry_id,
                   CASE WHEN is_atom THEN 'atom' ELSE 'rss' END AS feed_kind
            FROM p, UNNEST(range(1, len(links) + 1)) AS t(i)
            WHERE trim(links[i]) <> ''
        """,
        # Robots META + rel=canonical: identical synthetic <head>, the
        # same two-stage tag→attribute regexes (RE2-compatible: no
        # lookaheads), restrictive union across tags via bool_or.
        "robots_meta": r"""
            WITH d AS (
              SELECT doc_id,
                     '<html><head>' ||
                     CASE doc_id % 7
                       WHEN 0 THEN '<meta name="robots" content="noindex">'
                       WHEN 1 THEN '<meta NAME=''robots'' CONTENT=''nofollow, noarchive''>'
                       WHEN 2 THEN '<meta name=robots content="none">'
                       WHEN 3 THEN '<meta name="robots" content="noindex">'
                                   || '<meta name="robots" content="nofollow">'
                       ELSE '<meta name="viewport" content="width=1">'
                     END ||
                     CASE WHEN doc_id % 4 = 0 THEN
                       '<link href="https://canon.test/' || CAST(doc_id // 4 AS VARCHAR)
                       || '" rel="canonical">'
                     WHEN doc_id % 2 = 0 THEN
                       '<link rel="canonical" href="https://canon.test/'
                       || CAST(doc_id // 4 AS VARCHAR) || '">'
                     ELSE '' END
                     || '</head><body>x</body></html>' AS html
              FROM documents),
            tags AS (
              SELECT doc_id, UNNEST(regexp_extract_all(html, '(?i)<meta[^>]*>')) AS tag
              FROM d),
            rtags AS (
              SELECT doc_id,
                     regexp_extract(tag, '(?i)content\s*=\s*["'']([^"'']*)["'']', 1)
                       AS content
              FROM tags
              WHERE regexp_matches(tag, '(?i)name\s*=\s*["'']?robots["'']?')),
            toks AS (
              SELECT doc_id, lower(trim(t.d)) AS d
              FROM rtags, UNNEST(string_split(content, ',')) AS t(d)),
            flags AS (
              SELECT doc_id,
                     bool_or(d IN ('noindex', 'none')) AS noindex,
                     bool_or(d IN ('nofollow', 'none')) AS nofollow,
                     bool_or(d = 'noarchive') AS noarchive,
                     true AS has_robots_meta
              FROM toks GROUP BY doc_id),
            canon AS (
              SELECT doc_id,
                     NULLIF(trim(regexp_extract(
                       regexp_extract(html,
                         '(?i)<link[^>]*rel\s*=\s*["'']?canonical["'']?[^>]*>'),
                       '(?i)href\s*=\s*["'']([^"'']*)["'']', 1)), '') AS canonical_url
              FROM d)
            SELECT d.doc_id,
                   COALESCE(f.noindex, false) AS noindex,
                   COALESCE(f.nofollow, false) AS nofollow,
                   COALESCE(f.noarchive, false) AS noarchive,
                   COALESCE(f.has_robots_meta, false) AS has_robots_meta,
                   c.canonical_url
            FROM d LEFT JOIN flags f USING (doc_id)
            JOIN canon c USING (doc_id)
        """,
        # RFC 9111 freshness plan: identical synthetic caching metadata,
        # same delimiter-anchored max-age regex (never matches s-maxage),
        # exact BIGINT microsecond lifetimes/ages.
        "http_cache_plan": r"""
            WITH log AS (
              SELECT 'https://' || source || '.test/doc/' || CAST(doc_id AS VARCHAR) AS url,
                     TIMESTAMP '2024-01-01 00:00:00'
                       + INTERVAL (doc_id % 40) DAY AS fetched_at,
                     CASE doc_id % 6
                       WHEN 0 THEN 'max-age=86400'
                       WHEN 1 THEN 'no-cache, max-age=99999'
                       WHEN 2 THEN 's-maxage=31536000'
                       WHEN 3 THEN 'public, max-age=6048000'
                       WHEN 5 THEN 'no-store'
                     END AS cache_control,
                     CASE WHEN doc_id % 2 = 0 THEN
                       TIMESTAMP '2024-01-01 00:00:00'
                         + INTERVAL (doc_id % 40) DAY
                         - INTERVAL (doc_id % 100 + 1) DAY
                     END AS last_modified,
                     doc_id % 3 = 0 AS has_validator
              FROM documents),
            lt AS (
              SELECT url, fetched_at, has_validator,
                     CASE
                       WHEN regexp_matches(COALESCE(cache_control, ''),
                              '(?i)(?:^|[,\s])no-(?:store|cache)\s*(?:$|[,\s=])')
                         THEN CAST(0 AS BIGINT)
                       WHEN regexp_extract(COALESCE(cache_control, ''),
                              '(?i)(?:^|[,\s])max-age\s*=\s*([0-9]+)', 1) <> ''
                         THEN CAST(regexp_extract(COALESCE(cache_control, ''),
                              '(?i)(?:^|[,\s])max-age\s*=\s*([0-9]+)', 1) AS BIGINT)
                              * 1000000
                       WHEN last_modified IS NOT NULL
                         THEN greatest(epoch_us(fetched_at) - epoch_us(last_modified),
                                       0) // 10
                       ELSE CAST(0 AS BIGINT)
                     END AS lifetime_us
              FROM log)
            SELECT url, lifetime_us,
                   epoch_us(TIMESTAMP '2024-02-15 00:00:00') - epoch_us(fetched_at)
                     AS age_us,
                   CASE WHEN epoch_us(TIMESTAMP '2024-02-15 00:00:00')
                             - epoch_us(fetched_at) < lifetime_us THEN 'fresh'
                        WHEN has_validator THEN 'revalidate'
                        ELSE 'refetch' END AS action
            FROM lt
        """,
        # Charset sniff: identical header/meta strings run through the
        # same RE2 regexes; the BOM branch (binary prefix compare) is
        # expectation-tabled by the doc_id mod that injected the BOM.
        "charset_sniff": r"""
            WITH d AS (
              SELECT doc_id, doc_id % 6 AS m,
                     CASE doc_id % 6
                       WHEN 0 THEN 'text/html; charset=latin-1'
                       WHEN 1 THEN 'text/html; charset="ISO-8859-1"'
                       WHEN 3 THEN 'text/html'
                     END AS ct,
                     CASE doc_id % 6
                       WHEN 2 THEN '<html><head><meta charset=windows-1251></head>'
                       WHEN 3 THEN '<html><head><meta http-equiv="Content-Type"'
                                   || ' content="text/html; charset=EUC-JP"></head>'
                       ELSE '<p>x</p>'
                     END AS html
              FROM documents),
            x AS (
              SELECT doc_id, m,
                     lower(regexp_extract(COALESCE(ct, ''),
                       '(?i)charset\s*=\s*["'']?([^"'';\s]+)', 1)) AS ct_cs,
                     lower(regexp_extract(html,
                       '(?i)<meta[^>]*charset\s*=\s*["'']?([^"''\s/>;]+)', 1)) AS meta_cs
              FROM d)
            SELECT doc_id,
                   CASE WHEN m = 0 THEN 'utf-8'
                        WHEN m = 4 THEN 'utf-16le'
                        WHEN ct_cs <> '' THEN ct_cs
                        WHEN meta_cs <> '' THEN meta_cs
                   END AS charset
            FROM x
        """,
        # Circuit breaker: same last-success max/join resolution, streak
        # = fetches strictly after it in (us, tie) order, state from the
        # trip threshold + cooldown at the fixed as_of.
        "circuit_breaker": """
            WITH b AS (
              SELECT user_id AS host, epoch_us(ts) AS us,
                     event_type <> 'error' AS ok, event_id AS tie
              FROM events),
            su AS (SELECT host, MAX(us) AS s_us FROM b WHERE ok GROUP BY host),
            st AS (
              SELECT b.host, su.s_us, MAX(b.tie) AS s_tie
              FROM b JOIN su ON b.host = su.host AND b.us = su.s_us
              WHERE b.ok GROUP BY b.host, su.s_us),
            agg AS (
              SELECT b.host,
                     CAST(COUNT(*) AS BIGINT) AS n_fetches,
                     CAST(SUM(CASE WHEN st.s_us IS NULL
                                     OR b.us > st.s_us
                                     OR (b.us = st.s_us AND b.tie > st.s_tie)
                                   THEN 1 ELSE 0 END) AS BIGINT) AS fail_streak,
                     MAX(b.us) AS last_fetch_us
              FROM b LEFT JOIN st ON b.host = st.host
              GROUP BY b.host)
            SELECT host, n_fetches, fail_streak, last_fetch_us,
                   CASE WHEN fail_streak >= 2
                         AND epoch_us(TIMESTAMP '2024-02-10 00:00:00')
                             - last_fetch_us >= 300 * 3600000000
                          THEN 'half_open'
                        WHEN fail_streak >= 2 THEN 'open'
                        ELSE 'closed' END AS state
            FROM agg
        """,
        # JusText-style block classifier: identical synthetic pages,
        # same RE2-safe block split / tag strip / anchor capture, exact
        # integer ppm densities (DuckDB regexp_replace needs 'g').
        "content_blocks": _BLOCKS_PREP_SQL + """
            SELECT doc_id, block_order, text, n_words, link_ppm, stop_ppm,
                   label
            FROM lb
        """,
        "main_text": _BLOCKS_PREP_SQL + """
            SELECT doc_id,
                   COALESCE(string_agg(
                     CASE WHEN label IN ('good', 'near_good') THEN text END,
                     ' ' ORDER BY block_order), '') AS main_text,
                   CAST(COUNT(*) AS BIGINT) AS n_blocks,
                   CAST(SUM(CASE WHEN label IN ('good', 'near_good')
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
            FROM lb GROUP BY doc_id
        """,
        # PMI collocations: same bigram construction as lm_bits_score,
        # factorized bit-length PMI (overflow-proof), min_count 3.
        "pmi_collocations": r"""
            WITH toks AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\s+') AS ts
              FROM documents),
            inst AS (
              SELECT UNNEST(list_transform(
                       range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])) AS bigram
              FROM toks WHERE len(ts) >= 2),
            i2 AS (
              SELECT string_split(bigram, ' ')[1] AS w1,
                     string_split(bigram, ' ')[-1] AS w2
              FROM inst),
            c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
                    FROM i2 GROUP BY w1, w2),
            c1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM i2 GROUP BY w1),
            c2 AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM i2 GROUP BY w2),
            n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM i2)
            SELECT p.w1, p.w2, p.c12, c1.c1, c2.c2,
                   CAST(length(bin(p.c12)) + length(bin(n.n_total))
                        - length(bin(c1.c1)) - length(bin(c2.c2))
                        AS BIGINT) AS pmi_bits
            FROM c12 p JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN n
            WHERE p.c12 >= 3
        """,
        # Canonical clustering: same synthetic <head> + href extraction
        # as robots_meta, effective key = declared canonical else self.
        "canonical_clusters": r"""
            WITH u AS (
              SELECT doc_id,
                     'https://' || source || '.test/doc/' || CAST(doc_id AS VARCHAR)
                       AS url
              FROM documents),
            pg AS (
              SELECT doc_id, url,
                     '<html><head>' ||
                     CASE WHEN doc_id % 4 = 0 THEN
                       '<link href="https://canon.test/' || CAST(doc_id // 4 AS VARCHAR)
                       || '" rel="canonical">'
                     WHEN doc_id % 2 = 0 THEN
                       '<link rel="canonical" href="https://canon.test/'
                       || CAST(doc_id // 4 AS VARCHAR) || '">'
                     ELSE '' END || '</head></html>' AS html
              FROM u),
            eff AS (
              SELECT doc_id,
                     NULLIF(trim(regexp_extract(
                       regexp_extract(html,
                         '(?i)<link[^>]*rel\s*=\s*["'']?canonical["'']?[^>]*>'),
                       '(?i)href\s*=\s*["'']([^"'']*)["'']', 1)), '') AS canon,
                     url
              FROM pg)
            SELECT COALESCE(canon, url) AS cluster_url,
                   CAST(COUNT(*) AS BIGINT) AS n_members,
                   CAST(SUM(CASE WHEN canon IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_declared,
                   MIN(doc_id) AS rep_doc
            FROM eff GROUP BY COALESCE(canon, url)
        """,
        # TrustRank: same edge CTE, teleport restricted to the md5-parity
        # seed quarter, 3 unrolled rounds of the same BIGINT update.
        "host_trustrank": _HOST_GRAPH_PREP_SQL + """
            , seeds AS (
              SELECT host FROM hosts
              WHERE ('0x' || substr(md5(host), 1, 1))::BIGINT % 4 = 0),
            sc AS (SELECT COUNT(*) AS n_seeds FROM seeds),
            consts AS (
              SELECT CAST(1000000000000 // n_seeds AS BIGINT) AS r0,
                     CAST((15 * (1000000000000 // n_seeds)) // 100 AS BIGINT)
                       AS base
              FROM sc),
            t0 AS (
              SELECT h.host,
                     CAST(CASE WHEN s.host IS NOT NULL
                               THEN (SELECT r0 FROM consts) ELSE 0 END AS BIGINT)
                       AS trust_units
              FROM hosts h LEFT JOIN seeds s USING (host)),
            c1 AS (
              SELECT e.dst_host AS host,
                     SUM((r.trust_units // 1000000) * e.share_ppm) AS in_units
              FROM ew e JOIN t0 r ON e.src_host = r.host GROUP BY 1),
            t1 AS (
              SELECT h.host,
                     CAST(CASE WHEN s.host IS NOT NULL
                               THEN (SELECT base FROM consts) ELSE 0 END
                          + (85 * COALESCE(c.in_units, 0)) // 100 AS BIGINT)
                       AS trust_units
              FROM hosts h LEFT JOIN seeds s USING (host)
              LEFT JOIN c1 c USING (host)),
            c2 AS (
              SELECT e.dst_host AS host,
                     SUM((r.trust_units // 1000000) * e.share_ppm) AS in_units
              FROM ew e JOIN t1 r ON e.src_host = r.host GROUP BY 1),
            t2 AS (
              SELECT h.host,
                     CAST(CASE WHEN s.host IS NOT NULL
                               THEN (SELECT base FROM consts) ELSE 0 END
                          + (85 * COALESCE(c.in_units, 0)) // 100 AS BIGINT)
                       AS trust_units
              FROM hosts h LEFT JOIN seeds s USING (host)
              LEFT JOIN c2 c USING (host)),
            c3 AS (
              SELECT e.dst_host AS host,
                     SUM((r.trust_units // 1000000) * e.share_ppm) AS in_units
              FROM ew e JOIN t2 r ON e.src_host = r.host GROUP BY 1),
            t3 AS (
              SELECT h.host,
                     CAST(CASE WHEN s.host IS NOT NULL
                               THEN (SELECT base FROM consts) ELSE 0 END
                          + (85 * COALESCE(c.in_units, 0)) // 100 AS BIGINT)
                       AS trust_units
              FROM hosts h LEFT JOIN seeds s USING (host)
              LEFT JOIN c3 c USING (host))
            SELECT host, trust_units FROM t3
        """,
        # Snapshot change magnitude: identical two-version synthesis
        # (suffix append / every-10th token reversal), distinct k=3
        # shingle sets, exact Jaccard ppm via the shifted self-join.
        "snapshot_change": r"""
            WITH u AS (
              SELECT doc_id,
                     'https://' || source || '.test/doc/' || CAST(doc_id AS VARCHAR)
                       AS url,
                     trim(text) AS text
              FROM documents),
            snaps AS (
              SELECT url, 0 AS version, text FROM u
              UNION ALL
              SELECT url, 1 AS version,
                     CASE WHEN doc_id % 10 = 0 THEN
                       array_to_string(list_reverse(
                         string_split_regex(text, '\s+')), ' ')
                     ELSE text || ' updated content section '
                          || CAST(doc_id AS VARCHAR) END AS text
              FROM u),
            toks AS (
              SELECT url, version,
                     string_split_regex(lower(trim(text)), '\s+') AS ts
              FROM snaps),
            g0 AS (
              SELECT url, version,
                     UNNEST(list_transform(range(1, len(ts) - 1),
                       i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS shingle
              FROM toks WHERE len(ts) >= 3),
            grams AS (SELECT DISTINCT url, version, shingle FROM g0),
            sizes AS (
              SELECT url, version, CAST(COUNT(*) AS BIGINT) AS n
              FROM grams GROUP BY url, version),
            common AS (
              SELECT g.url, g.version, CAST(COUNT(*) AS BIGINT) AS n_common
              FROM grams g JOIN grams h
                ON g.url = h.url AND g.shingle = h.shingle
               AND h.version = g.version + 1
              GROUP BY g.url, g.version),
            pairs AS (
              SELECT a.url, a.version AS from_version,
                     a.version + 1 AS to_version,
                     a.n AS n_from, b.n AS n_to,
                     COALESCE(c.n_common, 0) AS n_common
              FROM sizes a
              JOIN sizes b ON a.url = b.url AND b.version = a.version + 1
              LEFT JOIN common c ON a.url = c.url AND a.version = c.version)
            SELECT url, from_version, to_version, n_from, n_to, n_common,
                   n_common * 1000000 // (n_from + n_to - n_common)
                     AS jaccard_ppm,
                   CAST(1000000
                        - n_common * 1000000 // (n_from + n_to - n_common)
                        AS BIGINT) AS change_ppm
            FROM pairs
        """,
        # RFC 9309 group selection: identical multi-group blobs, the
        # same lag/running-sum group ids, prefix-specificity best match.
        "robots_agent_groups": _ROBOTS_GROUPS_PREP_SQL + """
            SELECT r.host, c.ua_tok AS matched_ua, r.allow, r.path,
                   r.rule_order
            FROM rules r JOIN chosen c ON r.host = c.host AND r.gid = c.gid
        """,
        # End-to-end REP: group selection (prep above) -> ordered rule
        # list -> the same compile/longest-match lambdas as
        # robots_rfc_gate, over four path families per host.
        "robots_full_gate": _ROBOTS_GROUPS_PREP_SQL + r"""
            , sel AS (
              SELECT r.host,
                     list(struct_pack(allow := r.allow, path := r.path)
                          ORDER BY r.rule_order) AS rls
              FROM rules r JOIN chosen c ON r.host = c.host AND r.gid = c.gid
              GROUP BY r.host),
            comp AS (
              SELECT host,
                     list_transform(rls, x -> {
                       'allow': x.allow,
                       'spec': len(x.path),
                       'pattern': '^' ||
                         regexp_replace(
                           regexp_replace(
                             CASE WHEN x.path LIKE '%$'
                                  THEN substr(x.path, 1, len(x.path) - 1)
                                  ELSE x.path END,
                             '([.\\+?(){}\[\]|^$])', '\\\1', 'g'),
                           '\*', '.*', 'g')
                         || CASE WHEN x.path LIKE '%$' THEN '$' ELSE '' END
                     }) AS compiled
              FROM sel),
            du AS (
              SELECT doc_id, source || '.test' AS host,
                     CASE CAST(doc_id % 4 AS INT)
                       WHEN 0 THEN '/public/p' || CAST(doc_id AS VARCHAR)
                       WHEN 1 THEN '/private/' || source || '.test/q'
                       WHEN 2 THEN '/fallback/r' || CAST(doc_id AS VARCHAR)
                       ELSE '/misc/s' || CAST(doc_id AS VARCHAR) END AS path
              FROM documents),
            m AS (
              SELECT du.doc_id, du.host,
                     list_transform(
                       list_filter(comp.compiled,
                                   x -> regexp_matches(du.path, x.pattern)),
                       x -> x.spec * 2 + CAST(x.allow AS INT)) AS packed
              FROM du JOIN comp ON du.host = comp.host)
            SELECT doc_id, host,
                   CASE WHEN len(packed) = 0 THEN true
                        ELSE list_aggregate(packed, 'max') % 2 = 1 END AS allowed
            FROM m
        """,
        # Corpus mixture report: same whitespace token count, exact
        # BIGINT ppm shares of single-row totals.
        "corpus_mix_report": r"""
            WITH per AS (
              SELECT source, lang,
                     CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(len(string_split_regex(trim(text), '\s+')))
                          AS BIGINT) AS n_tokens
              FROM documents GROUP BY source, lang),
            tot AS (
              SELECT CAST(SUM(n_docs) AS BIGINT) AS td,
                     CAST(SUM(n_tokens) AS BIGINT) AS tt
              FROM per)
            SELECT source, lang, n_docs, n_tokens,
                   n_docs * 1000000 // tot.td AS doc_share_ppm,
                   n_tokens * 1000000 // tot.tt AS token_share_ppm
            FROM per CROSS JOIN tot
        """,
        # Percent normalization: the same split-on-% algebra — decode
        # unreserved escapes, uppercase the rest, pass malformed through.
        "percent_normalize": r"""
            WITH u AS (
              SELECT doc_id,
                     'https://' || source || '.test/doc/' || CAST(doc_id AS VARCHAR)
                     || '/' ||
                     CASE CAST(doc_id % 6 AS INT)
                       WHEN 0 THEN '%2epath'
                       WHEN 1 THEN '%2fquery'
                       WHEN 2 THEN '%7Euser'
                       WHEN 3 THEN '%zzbad'
                       WHEN 4 THEN '%'
                       ELSE 'plain' END AS url
              FROM documents),
            sp AS (SELECT doc_id, url, string_split(url, '%') AS parts FROM u)
            SELECT doc_id, url,
                   parts[1] || COALESCE(array_to_string(
                     list_transform(parts[2:], p ->
                       CASE WHEN regexp_matches(p, '^[0-9A-Fa-f]{2}') THEN
                         CASE WHEN regexp_matches(
                                chr(('0x' || upper(substr(p, 1, 2)))::INT),
                                '^[A-Za-z0-9._~-]$')
                              THEN chr(('0x' || upper(substr(p, 1, 2)))::INT)
                                   || substr(p, 3)
                              ELSE '%' || upper(substr(p, 1, 2)) || substr(p, 3)
                         END
                       ELSE '%' || p END),
                     ''), '') AS normalized
            FROM sp
        """,
        # Retry-After: the oracle computes each form's expected instant
        # directly (seconds offset / second-truncated source ts); the
        # Spark parser must land on it exactly.
        "retry_after": """
            SELECT event_id,
                   CASE CAST(event_id % 4 AS INT)
                     WHEN 0 THEN CAST(event_id % 300 + 30 AS VARCHAR)
                     WHEN 1 THEN strftime(ts, '%a, %d %b %Y %H:%M:%S') || ' GMT'
                     WHEN 2 THEN 'soon'
                   END AS header,
                   CASE CAST(event_id % 4 AS INT)
                     WHEN 0 THEN epoch_us(TIMESTAMP '2024-02-01 00:00:00')
                                 + (event_id % 300 + 30) * 1000000
                     WHEN 1 THEN epoch_us(date_trunc('second', ts))
                   END AS retry_at_us
            FROM events
        """,
        # HTML entity decode: the same split-on-& single-pass algebra —
        # named core set, ASCII-only numeric refs, fallback untouched.
        "html_unescape": r"""
            WITH d AS (
              SELECT doc_id,
                     CASE CAST(doc_id % 7 AS INT)
                       WHEN 0 THEN 'a &amp; b &lt;c&gt;'
                       WHEN 1 THEN 'it&#39;s &quot;here&quot;'
                       WHEN 2 THEN 'hex it&#x27;s fine'
                       WHEN 3 THEN '&amp;lt; decodes ONCE'
                       WHEN 4 THEN '&#8212; and &#x2014; pass through'
                       WHEN 5 THEN '&unknown; tail& plain'
                       ELSE 'no entities at all'
                     END AS text
              FROM documents),
            sp AS (SELECT doc_id, text, string_split(text, '&') AS parts FROM d)
            SELECT doc_id, text,
                   parts[1] || COALESCE(array_to_string(
                     list_transform(parts[2:], p ->
                       CASE
                         WHEN starts_with(p, 'quot;') THEN '"' || substr(p, 6)
                         WHEN starts_with(p, 'apos;') THEN chr(39) || substr(p, 6)
                         WHEN starts_with(p, 'amp;') THEN '&' || substr(p, 5)
                         WHEN starts_with(p, 'lt;') THEN '<' || substr(p, 4)
                         WHEN starts_with(p, 'gt;') THEN '>' || substr(p, 4)
                         WHEN regexp_extract(p, '^#([0-9]{1,3});', 1) <> ''
                              AND CAST(regexp_extract(p, '^#([0-9]{1,3});', 1)
                                       AS INT) <= 127
                           THEN chr(CAST(regexp_extract(p, '^#([0-9]{1,3});', 1)
                                         AS INT))
                                || substr(p, length(regexp_extract(p,
                                     '^#([0-9]{1,3});', 1)) + 3)
                         WHEN regexp_extract(p, '^#[xX]([0-9A-Fa-f]{1,2});', 1) <> ''
                              AND ('0x' || regexp_extract(p,
                                    '^#[xX]([0-9A-Fa-f]{1,2});', 1))::INT <= 127
                           THEN chr(('0x' || regexp_extract(p,
                                      '^#[xX]([0-9A-Fa-f]{1,2});', 1))::INT)
                                || substr(p, length(regexp_extract(p,
                                     '^#[xX]([0-9A-Fa-f]{1,2});', 1)) + 4)
                         ELSE '&' || p
                       END),
                     ''), '') AS unescaped
            FROM sp
        """,
        # hreflang alternates: identical heads, the same two-stage
        # link-tag -> attribute extraction, decoys filtered.
        "hreflang_alternates": r"""
            WITH pg AS (
              SELECT doc_id,
                     '<head><link rel="stylesheet" href="/s.css">'
                     || '<link rel="alternate" hreflang="en" href="https://h/en/'
                     || CAST(doc_id AS VARCHAR) || '">'
                     || '<link hreflang="DE-de" rel=alternate href="https://h/de/'
                     || CAST(doc_id AS VARCHAR) || '">'
                     || CASE WHEN doc_id % 3 = 0 THEN
                          '<link rel="alternate" hreflang="x-default" href="https://h/'
                          || CAST(doc_id AS VARCHAR) || '">'
                        ELSE '' END
                     || '<link rel="canonical" href="https://h/c"></head>' AS html
              FROM documents),
            tg AS (
              SELECT doc_id, regexp_extract_all(html, '(?i)<link[^>]*>') AS tags
              FROM pg),
            ex AS (
              SELECT doc_id, CAST(i - 1 AS INT) AS alt_order, tags[i] AS tag
              FROM tg, UNNEST(range(1, len(tags) + 1)) AS t(i))
            SELECT doc_id, alt_order,
                   lower(regexp_extract(tag,
                     '(?i)hreflang\s*=\s*["'']?([a-zA-Z0-9-]+)["'']?', 1))
                     AS hreflang,
                   trim(regexp_extract(tag,
                     '(?i)href\s*=\s*["'']([^"'']*)["'']', 1)) AS href
            FROM ex
            WHERE regexp_matches(tag, '(?i)rel\s*=\s*["'']?alternate["'']?')
              AND lower(regexp_extract(tag,
                    '(?i)hreflang\s*=\s*["'']?([a-zA-Z0-9-]+)["'']?', 1)) <> ''
              AND trim(regexp_extract(tag,
                    '(?i)href\s*=\s*["'']([^"'']*)["'']', 1)) <> ''
        """,
        # Path-prefix profile: identical section synthesis, the same
        # leading-segment grouping + exact ppm shares.
        "path_prefix_profile": """
            WITH u AS (
              SELECT source || '.test' AS host,
                     '/' || ['doc', 'tag', 'cat', 'media']
                             [CAST(doc_id % 4 AS INT) + 1] AS prefix
              FROM documents),
            per AS (
              SELECT host, prefix, CAST(COUNT(*) AS BIGINT) AS n_urls
              FROM u GROUP BY host, prefix),
            tot AS (
              SELECT host, CAST(SUM(n_urls) AS BIGINT) AS host_urls
              FROM per GROUP BY host)
            SELECT per.host, prefix, n_urls, host_urls,
                   n_urls * 1000000 // host_urls AS share_ppm
            FROM per JOIN tot ON per.host = tot.host
        """,
        # Lang-metadata audit: the langid marker algebra vs the stored
        # lang column, exact ppm agreement per source.
        "lang_metadata_audit": r"""
            WITH t AS (
              SELECT doc_id, source, lang,
                     list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS toks
              FROM documents),
            h AS (
              SELECT doc_id, source, lang,
                len(list_intersect(toks, ['the','and','of','to','a','in','is','that'])) AS en,
                len(list_intersect(toks, ['der','die','das','und','ist','nicht','ein','zu'])) AS de,
                len(list_intersect(toks, ['le','la','les','et','est','un','une','que'])) AS fr,
                len(list_intersect(toks, ['el','la','los','de','que','es','un','una'])) AS es,
                len(list_intersect(toks, ['的','是','了','在','我','有','和','不'])) AS zh
              FROM t),
            p AS (
              SELECT source, lang,
                     CASE WHEN GREATEST(en,de,fr,es,zh) = 0 THEN 'und'
                          WHEN de = GREATEST(en,de,fr,es,zh) THEN 'de'
                          WHEN en = GREATEST(en,de,fr,es,zh) THEN 'en'
                          WHEN es = GREATEST(en,de,fr,es,zh) THEN 'es'
                          WHEN fr = GREATEST(en,de,fr,es,zh) THEN 'fr'
                          ELSE 'zh' END AS pred
              FROM h)
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN pred = lang THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_match,
                   CAST(SUM(CASE WHEN pred = lang THEN 1 ELSE 0 END) AS BIGINT)
                     * 1000000 // CAST(COUNT(*) AS BIGINT) AS match_ppm
            FROM p GROUP BY source
        """,
        # URL-template mining: hex-run ({h}, >=8 chars) before digit-run
        # ({d}) generalization; both regexes RE2/Java-agreeing; 'g' flag
        # required (DuckDB replaces first match only by default).
        "url_templates": """
            WITH u AS (
              SELECT source || '.test' AS host,
                     CASE CAST(doc_id % 4 AS INT)
                       WHEN 0 THEN '/doc/' || CAST(doc_id AS VARCHAR)
                       WHEN 1 THEN '/tag/' || CAST(doc_id % 50 AS VARCHAR)
                                 || '/page/' || CAST(doc_id % 7 AS VARCHAR)
                       WHEN 2 THEN '/a/'
                                 || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16)
                       ELSE '/archive/' || CAST(2000 + doc_id % 25 AS VARCHAR)
                                 || '/' || CAST(doc_id % 12 + 1 AS VARCHAR)
                     END AS path,
                     n_chars
              FROM documents),
            t AS (
              SELECT host, path, n_chars,
                     regexp_replace(
                       regexp_replace(path, '[0-9a-f]{8,}', '{h}', 'g'),
                       '[0-9]+', '{d}', 'g') AS template
              FROM u)
            SELECT host, template,
                   CAST(COUNT(*) AS BIGINT) AS n_pages,
                   CAST(COUNT(DISTINCT path) AS BIGINT) AS n_paths,
                   MIN(path) AS example_path,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_yield,
                   CAST(SUM(n_chars) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
                     AS yield_per_page
            FROM t GROUP BY host, template
        """,
        # C4 line filters: same re-lining + punct rule + injections in
        # DuckDB ('g' flag on both regexp_replace calls), then the
        # retained-line algebra over UNNESTed trimmed lines.
        "c4_line_filters": r'''
            WITH d AS (
              SELECT doc_id,
                     regexp_replace(
                       regexp_replace(text, '((\S+ ){5}\S+) ',
                                      '\1' || chr(10), 'g'),
                       '([a-m])(' || chr(10) || '|$)', '\1.\2', 'g')
                     || CASE WHEN doc_id % 13 = 0
                        THEN chr(10) || 'enable javascript to view this page.'
                        ELSE '' END
                     || CASE WHEN doc_id % 17 = 0
                        THEN chr(10) || 'lorem ipsum dolor sit amet today.'
                        ELSE '' END
                     || CASE WHEN doc_id % 23 = 0
                        THEN chr(10) || 'config { value }'
                        ELSE '' END AS text
              FROM documents),
            parts AS (
              SELECT doc_id, string_split(text, chr(10)) AS p FROM d),
            lines AS (
              SELECT doc_id, trim(p[i]) AS line
              FROM parts, UNNEST(range(1, len(p) + 1)) AS t(i)
              WHERE trim(p[i]) <> ''),
            flags AS (
              SELECT doc_id,
                     CASE WHEN regexp_matches(line, '[.!?"]$')
                           AND len(string_split_regex(line, ' +')) >= 5
                           AND NOT contains(lower(line), 'javascript')
                          THEN 1 ELSE 0 END AS kept,
                     CASE WHEN contains(lower(line), 'lorem ipsum')
                          THEN 1 ELSE 0 END AS lorem,
                     CASE WHEN contains(line, '{') THEN 1 ELSE 0 END AS curly
              FROM lines)
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(SUM(kept) AS BIGINT) AS n_kept,
                   CAST(SUM(kept) AS BIGINT) * 1000000
                     // CAST(COUNT(*) AS BIGINT) AS kept_ppm,
                   SUM(lorem) > 0 AS has_lorem,
                   SUM(curly) > 0 AS has_curly,
                   (SUM(kept) >= 3 AND SUM(lorem) = 0 AND SUM(curly) = 0)
                     AS keep_doc
            FROM flags GROUP BY doc_id
        ''',
        # DSIR bits: md5 unigram buckets, add-one smoothing, factorized
        # integer log2 via length(bin(x)) (engine-identical bit length).
        "dsir_weights": r'''
            WITH tok AS (
              SELECT doc_id, lang = 'en' AS is_t, t.tok AS tok
              FROM documents,
                   UNNEST(string_split_regex(trim(lower(text)), '\s+'))
                     AS t(tok)
              WHERE t.tok <> ''),
            pdb AS (
              SELECT doc_id, is_t,
                     ('0x' || substr(md5(tok), 1, 15))::BIGINT % 64 AS bucket,
                     CAST(COUNT(*) AS BIGINT) AS cnt
              FROM tok GROUP BY doc_id, is_t, bucket),
            bg AS (
              SELECT bucket, CAST(SUM(cnt) AS BIGINT) AS cb
              FROM pdb GROUP BY bucket),
            tg AS (
              SELECT bucket, CAST(SUM(cnt) AS BIGINT) AS ct
              FROM pdb WHERE is_t GROUP BY bucket),
            tot AS (
              SELECT (SELECT CAST(SUM(cb) AS BIGINT) FROM bg) AS nb,
                     (SELECT CAST(COALESCE(SUM(ct), 0) AS BIGINT) FROM tg)
                       AS nt),
            dim AS (
              SELECT bg.bucket,
                     CAST((length(bin(COALESCE(ct, 0) + 1))
                           - length(bin(nt + 64)))
                        - (length(bin(cb + 1)) - length(bin(nb + 64)))
                       AS BIGINT) AS bits
              FROM bg LEFT JOIN tg ON bg.bucket = tg.bucket, tot)
            SELECT doc_id,
                   CAST(SUM(cnt) AS BIGINT) AS n_tokens,
                   CAST(SUM(cnt * bits) AS BIGINT) AS dsir_bits
            FROM pdb JOIN dim USING (bucket) GROUP BY doc_id
        ''',
        # Outlink diversity: same edge synthesis + the PSL longest-match
        # chain (shared shape with the registrable_domains oracle).
        "outlink_diversity": '''
            WITH d AS (
              SELECT doc_id, CAST(doc_id AS VARCHAR) AS did,
                     source || '.test' AS src_host
              FROM documents),
            e0 AS (
              SELECT src_host, doc_id, did, unnest([0, 1, 2]) AS k FROM d),
            e AS (
              SELECT src_host,
                CASE CAST(('0x' || substr(md5(did || ':' || CAST(k AS VARCHAR)), 1, 15))::BIGINT % 6 AS INT)
                  WHEN 0 THEN 'a.b.example.com'
                  WHEN 1 THEN 'example.com'
                  WHEN 2 THEN 'w.example.co.uk'
                  WHEN 3 THEN src_host
                  WHEN 4 THEN 'cdn' || CAST(doc_id % 5 AS VARCHAR) || '.github.io'
                  ELSE 'news' || CAST(doc_id % 7 AS VARCHAR) || '.org'
                END AS dst_host
              FROM e0),
            h0 AS (SELECT DISTINCT dst_host AS host FROM e),
            lab AS (
              SELECT host, string_split(host, '.') AS labels,
                     CAST(len(string_split(host, '.')) AS INT) AS n
              FROM h0),
            cand AS (
              SELECT host, labels, n,
                     unnest(generate_series(1, least(3, n))) AS k
              FROM lab),
            psl(suffix) AS (VALUES
              ('com'), ('net'), ('org'), ('io'), ('ai'), ('dev'), ('app'),
              ('test'), ('edu'), ('gov'),
              ('co.uk'), ('org.uk'), ('ac.uk'), ('gov.uk'),
              ('com.au'), ('net.au'), ('org.au'),
              ('co.jp'), ('co.in'), ('com.br'), ('com.cn'),
              ('github.io'), ('gitlab.io'), ('blogspot.com'),
              ('herokuapp.com'), ('s3.amazonaws.com')),
            j AS (
              SELECT c.host, c.labels, c.n,
                     CASE WHEN p.suffix IS NOT NULL THEN c.k END AS mk
              FROM cand c LEFT JOIN psl p
                ON array_to_string(c.labels[c.n - CAST(c.k AS INT) + 1:c.n], '.')
                   = p.suffix),
            m AS (
              SELECT host, any_value(labels) AS labels, any_value(n) AS n,
                     CAST(COALESCE(MAX(mk), 1) AS INT) AS k
              FROM j GROUP BY host),
            dom AS (
              SELECT host,
                     COALESCE(
                       CASE WHEN n > k
                            THEN array_to_string(labels[n - k:n], '.') END,
                       host) AS rd
              FROM m)
            SELECT src_host,
                   CAST(COUNT(*) AS BIGINT) AS n_outlinks,
                   CAST(COUNT(DISTINCT dst_host) AS BIGINT) AS n_dst_hosts,
                   CAST(COUNT(DISTINCT rd) AS BIGINT) AS n_dst_domains,
                   CAST(SUM(CASE WHEN src_host = dst_host THEN 1 ELSE 0 END)
                     AS BIGINT) * 1000000 // CAST(COUNT(*) AS BIGINT)
                     AS self_ppm,
                   CAST(COUNT(DISTINCT rd) AS BIGINT) * 1000000
                     // CAST(COUNT(*) AS BIGINT) AS diversity_ppm
            FROM e JOIN dom ON e.dst_host = dom.host
            GROUP BY src_host
        ''',
        # Rendezvous sharding: identical 52-bit md5 weight + packed
        # argmax algebra ('0x'||substr(md5,1,13) == Spark conv(...,16,10)).
        "fetch_shards": '''
            WITH h AS (
              SELECT DISTINCT source || '.test' AS host FROM documents),
            ea AS (
              SELECT host, unnest(generate_series(0, 15)) AS s FROM h),
            eb AS (
              SELECT host, unnest(generate_series(0, 16)) AS s FROM h),
            a AS (
              SELECT host,
                     CAST(1023 - MAX(
                       ('0x' || substr(md5(host || ':hrw:' || CAST(s AS VARCHAR)), 1, 13))::BIGINT
                       * 1024 + (1023 - s)) % 1024 AS INT) AS shard_a
              FROM ea GROUP BY host),
            b AS (
              SELECT host,
                     CAST(1023 - MAX(
                       ('0x' || substr(md5(host || ':hrw:' || CAST(s AS VARCHAR)), 1, 13))::BIGINT
                       * 1024 + (1023 - s)) % 1024 AS INT) AS shard_b
              FROM eb GROUP BY host)
            SELECT host, shard_a, shard_b,
                   CAST(shard_a != shard_b AS INT) AS moved
            FROM a JOIN b USING (host)
        ''',
        # Clean-param: the directive PARSER is the DUT (like retry_after),
        # so the oracle states the parsed rules directly as VALUES and
        # mirrors only the application algebra (list lambdas).
        "clean_param_urls": f'''
            WITH u AS (SELECT doc_id, url, host, path FROM ({_DOC_URLS_SQL})),
            g AS (
              SELECT doc_id, host, path,
                     url || CASE CAST(doc_id % 5 AS INT)
                       WHEN 0 THEN '?sid=1&page=2&keep=3'
                       WHEN 1 THEN '?utm_source=news&id=7'
                       WHEN 2 THEN ''
                       WHEN 3 THEN '?page=5'
                       ELSE '?flag&sid=9' END AS url,
                     CAST(regexp_extract(host, '(\\d+)', 1) AS INT) % 4 AS grp
              FROM u),
            rules(grp, param, path_prefix) AS (VALUES
              (0, 'sid', '/doc'), (0, 'ref', '/doc'), (0, 'page', '/'),
              (1, 'utm_source', '/d'),
              (3, 'sid', '/other')),
            d AS (
              SELECT q.doc_id, q.url,
                     COALESCE(list(DISTINCT r.param)
                              FILTER (r.param IS NOT NULL), []) AS drops
              FROM g q LEFT JOIN rules r
                ON q.grp = r.grp AND starts_with(q.path, r.path_prefix)
              GROUP BY q.doc_id, q.url),
            t AS (
              SELECT doc_id, url, drops,
                     split_part(url, '?', 1) AS base,
                     contains(url, '?') AS has_q
              FROM d),
            k AS (
              SELECT doc_id, url, base, has_q,
                     CASE WHEN has_q
                          THEN string_split(substr(url, length(base) + 2), '&')
                          ELSE [] END AS toks,
                     CASE WHEN has_q
                          THEN list_filter(
                                 string_split(substr(url, length(base) + 2), '&'),
                                 x -> NOT list_contains(drops, split_part(x, '=', 1)))
                          ELSE [] END AS kept
              FROM t)
            SELECT doc_id, url,
                   CASE WHEN NOT has_q OR len(kept) = len(toks) THEN url
                        WHEN len(kept) = 0 THEN base
                        ELSE base || '?' || COALESCE(array_to_string(kept, '&'), '')
                   END AS clean_url,
                   CAST(len(toks) - len(kept) AS BIGINT) AS n_params_dropped
            FROM k
        ''',
        # Structured data: identical page synthesis; the same two-stage
        # lookahead-free tag->attr regexes run on RE2 here vs Java regex
        # in Spark (og_order/script_order = position among ALL tags).
        "structured_data": r"""
            WITH pg AS (
              SELECT doc_id,
                     '<head><meta charset="utf-8">' ||
                     CASE CAST(doc_id % 4 AS INT)
                       WHEN 0 THEN
                         '<meta property="og:title" content="Doc '
                         || CAST(doc_id AS VARCHAR) ||
                         '"><meta property="og:image" content="https://h/i1.png">'
                         || '<meta property="og:image" content="https://h/i2.png">'
                         || '<script type="application/ld+json">{"@context":'
                         || '"https://schema.org","@type":"Article","headline":"Doc '
                         || CAST(doc_id AS VARCHAR) || '"}</script>'
                       WHEN 1 THEN
                         '<meta content=''X' || CAST(doc_id AS VARCHAR)
                         || ''' property=''og:type''><script src="/app.js"></script>'
                         || '<script type=''application/ld+json''>'
                         || '{"@graph":[{"@type":"Person"}]}</script>'
                       WHEN 2 THEN
                         '<meta name="robots" content="noindex"><script>var x=1;</script>'
                       ELSE
                         '<meta property="og:url" content="https://h/'
                         || CAST(doc_id AS VARCHAR)
                         || '"><script type="application/ld+json">'
                         || '{"name":"no type"}</script>'
                     END || '</head>' AS html
              FROM documents),
            mt AS (
              SELECT doc_id, regexp_extract_all(html, '(?i)<meta[^>]*>') AS tags
              FROM pg),
            me AS (
              SELECT doc_id, CAST(i - 1 AS INT) AS ord, tags[i] AS tag
              FROM mt, UNNEST(range(1, len(tags) + 1)) AS t(i)),
            og AS (
              SELECT doc_id, 'og' AS kind, ord,
                     lower(regexp_extract(tag,
                       '(?i)property\s*=\s*["''](og:[a-z0-9_:.]+)["'']', 1)) AS key,
                     trim(regexp_extract(tag,
                       '(?i)content\s*=\s*["'']([^"'']*)["'']', 1)) AS value
              FROM me),
            st AS (
              SELECT doc_id,
                     regexp_extract_all(html, '(?i)<script[^>]*>[^<]*</script') AS els
              FROM pg),
            se AS (
              SELECT doc_id, CAST(i - 1 AS INT) AS ord, els[i] AS el
              FROM st, UNNEST(range(1, len(els) + 1)) AS t(i)),
            ld AS (
              SELECT doc_id, 'jsonld' AS kind, ord,
                     NULLIF(regexp_extract(
                       trim(regexp_extract(el, '>([^<]*)<', 1)),
                       '"@type"\s*:\s*"([^"]+)"', 1), '') AS key,
                     CAST(length(trim(regexp_extract(el, '>([^<]*)<', 1)))
                          AS VARCHAR) AS value
              FROM se
              WHERE regexp_matches(
                      regexp_extract(el, '(?i)<script([^>]*)>', 1),
                      '(?i)type\s*=\s*["'']application/ld\+json["'']'))
            SELECT doc_id, kind, ord, key, value FROM og
            WHERE key <> '' AND value <> ''
            UNION ALL
            SELECT doc_id, kind, ord, key, value FROM ld
        """,
        # Postings gaps: lag materialized in its own CTE (DuckDB forbids
        # nested window calls); bitlen via the shared bin() basis;
        # SUM -> HUGEINT cast back to BIGINT.
        "postings_gaps": r"""
            WITH tk AS (
              SELECT doc_id,
                     unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
              FROM documents),
            p AS (SELECT DISTINCT token, doc_id AS doc FROM tk WHERE token <> ''),
            lg AS (
              SELECT token, doc,
                     lag(doc) OVER (PARTITION BY token ORDER BY doc) AS prev
              FROM p),
            g AS (
              SELECT token, doc,
                     (doc + 1) - COALESCE(prev + 1, 0) AS gap
              FROM lg),
            b AS (
              SELECT token, doc, gap, (length(bin(gap)) + 6) // 7 AS gb
              FROM g)
            SELECT token,
                   CAST(COUNT(*) AS BIGINT) AS df,
                   CAST(MIN(doc) AS BIGINT) AS first_doc,
                   CAST(MAX(doc) AS BIGINT) AS last_doc,
                   CAST(SUM(gb) AS BIGINT) AS sum_gap_bytes,
                   CAST(MAX(gap) AS BIGINT) AS max_gap
            FROM b GROUP BY token
        """,
        # Co-citation: same edge synthesis (shared md5 pick algebra),
        # degree cap mirrored, plain SQL self-join on the source key.
        "cocitation_pairs": '''
            WITH d AS (
              SELECT doc_id,
                     'https://' || source || '.test/doc/'
                       || CAST(doc_id AS VARCHAR) AS src
              FROM documents),
            e0 AS (
              SELECT doc_id, src,
                     unnest(generate_series(0,
                       CASE WHEN doc_id = 0 THEN 69 ELSE 2 END)) AS k
              FROM d),
            e1 AS (
              SELECT DISTINCT src,
                     CASE WHEN doc_id = 0
                          THEN 'hub' || CAST(k AS VARCHAR) || '.test'
                          ELSE 't' || CAST(
                            ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                              || CAST(k AS VARCHAR)), 1, 15))::BIGINT % 40
                            AS VARCHAR) || '.test' END AS dst
              FROM e0),
            deg AS (SELECT src, COUNT(*) AS o FROM e1 GROUP BY src),
            kept AS (
              SELECT e1.src, e1.dst FROM e1 JOIN deg USING (src)
              WHERE o <= 64),
            p AS (
              SELECT x.dst AS a, y.dst AS b
              FROM kept x JOIN kept y ON x.src = y.src AND x.dst < y.dst)
            SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cocites
            FROM p GROUP BY a, b HAVING COUNT(*) >= 2
        ''',
        # Adamic-Adar over the same link fixture: each common source
        # weighs 1e6 // bitlen(outdeg) (the integer log2 surrogate —
        # length(bin(x)) is identical in Spark and DuckDB).
        "adamic_adar_pairs": '''
            WITH d AS (
              SELECT doc_id,
                     'https://' || source || '.test/doc/'
                       || CAST(doc_id AS VARCHAR) AS src
              FROM documents),
            e0 AS (
              SELECT doc_id, src,
                     unnest(generate_series(0,
                       CASE WHEN doc_id = 0 THEN 69 ELSE 2 END)) AS k
              FROM d),
            e1 AS (
              SELECT DISTINCT src,
                     CASE WHEN doc_id = 0
                          THEN 'hub' || CAST(k AS VARCHAR) || '.test'
                          ELSE 't' || CAST(
                            ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                              || CAST(k AS VARCHAR)), 1, 15))::BIGINT % 40
                            AS VARCHAR) || '.test' END AS dst
              FROM e0),
            deg AS (SELECT src, COUNT(*) AS o FROM e1 GROUP BY src),
            kept AS (
              SELECT e1.src, e1.dst,
                     1000000 // CAST(length(bin(o)) AS BIGINT) AS w_ppm
              FROM e1 JOIN deg USING (src)
              WHERE o <= 64),
            p AS (
              SELECT x.dst AS a, y.dst AS b, x.w_ppm
              FROM kept x JOIN kept y ON x.src = y.src AND x.dst < y.dst)
            SELECT a, b,
                   CAST(COUNT(*) AS BIGINT) AS cocites,
                   CAST(SUM(w_ppm) AS BIGINT) AS aa_ppm
            FROM p GROUP BY a, b HAVING COUNT(*) >= 2
        ''',
        # ABC classes: HUGEINT cum share, boundary at the part's own
        # cumulative ppm, ties broken (revenue desc, partkey asc).
        "parts_abc_classes": """
            WITH li AS (
              SELECT l_partkey,
                     CAST(round(l_extendedprice * (1 - l_discount)
                                * 100) AS BIGINT) AS rev_c
              FROM lineitem),
            per AS (
              SELECT l_partkey, CAST(SUM(rev_c) AS BIGINT) AS revenue_c
              FROM li GROUP BY l_partkey),
            t AS (SELECT CAST(SUM(revenue_c) AS BIGINT) AS tot FROM per),
            r AS (
              SELECT p.l_partkey, p.revenue_c,
                     SUM(p.revenue_c) OVER (ORDER BY p.revenue_c DESC,
                                            p.l_partkey ASC
                                            ROWS UNBOUNDED PRECEDING)
                       AS cum,
                     t.tot
              FROM per p, t)
            SELECT l_partkey, revenue_c,
                   CAST(CAST(cum AS HUGEINT) * 1000000 // tot AS BIGINT)
                     AS cum_ppm,
                   CASE WHEN CAST(cum AS HUGEINT) * 1000000 // tot
                             <= 800000 THEN 'A'
                        WHEN CAST(cum AS HUGEINT) * 1000000 // tot
                             <= 950000 THEN 'B'
                        ELSE 'C' END AS abc_class
            FROM r
        """,
        # RFM: native NTILE(5) with the same deterministic tie-break
        # order as the distributed with_ntile derivation.
        "customer_rfm": """
            WITH mx AS (SELECT MAX(o_orderdate) AS ref FROM orders),
            per AS (
              SELECT o_custkey,
                     date_diff('day',
                               CAST(MAX(o_orderdate) AS DATE),
                               CAST(MAX(mx.ref) AS DATE)) AS recency_days,
                     CAST(COUNT(*) AS BIGINT) AS frequency,
                     CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                          AS BIGINT) AS monetary_c
              FROM orders, mx GROUP BY o_custkey),
            sc AS (
              SELECT o_custkey, recency_days, frequency, monetary_c,
                     6 - NTILE(5) OVER (ORDER BY recency_days,
                                        o_custkey) AS r_score,
                     NTILE(5) OVER (ORDER BY frequency, o_custkey)
                       AS f_score,
                     NTILE(5) OVER (ORDER BY monetary_c, o_custkey)
                       AS m_score
              FROM per)
            SELECT o_custkey,
                   CAST(recency_days AS BIGINT) AS recency_days,
                   frequency, monetary_c,
                   CAST(r_score AS INT) AS r_score,
                   CAST(f_score AS INT) AS f_score,
                   CAST(m_score AS INT) AS m_score,
                   CAST(r_score * 100 + f_score * 10 + m_score AS INT)
                     AS rfm_code
            FROM sc
        """,
        # KMV calibration: same sketch CTEs as source_vocab_kmv, single
        # group; sign-symmetric err division.
        "kmv_calibration": r"""
            WITH toks AS (
              SELECT source AS g, tok
              FROM (SELECT source,
                           UNNEST(string_split(lower(regexp_replace(
                             trim(text), '\s+', ' ', 'g')), ' ')) AS tok
                    FROM documents
                    WHERE source IS NOT NULL AND text IS NOT NULL)
              WHERE len(tok) >= 1),
            th AS (
              SELECT DISTINCT g,
                     CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT)
                       AS h
              FROM toks),
            mins AS (
              SELECT g, h FROM (
                SELECT g, h,
                       ROW_NUMBER() OVER (PARTITION BY g ORDER BY h)
                         AS rn
                FROM th) WHERE rn <= 64),
            sk AS (
              SELECT g, CAST(COUNT(*) AS BIGINT) AS k_u,
                     CAST(MAX(h) AS BIGINT) AS theta
              FROM mins GROUP BY g),
            est AS (
              SELECT g,
                     CAST(CASE WHEN k_u < 64 THEN k_u
                          ELSE CAST(k_u - 1 AS HUGEINT)
                               * 1152921504606846976 // theta
                          END AS BIGINT) AS est_distinct
              FROM sk),
            ex AS (
              SELECT g, CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_exact
              FROM toks GROUP BY g)
            SELECT e.g AS source, x.n_exact, e.est_distinct,
                   CAST(CASE WHEN e.est_distinct - x.n_exact < 0
                        THEN -(CAST(-(e.est_distinct - x.n_exact)
                                    AS HUGEINT) * 1000000 // x.n_exact)
                        ELSE CAST(e.est_distinct - x.n_exact AS HUGEINT)
                             * 1000000 // x.n_exact END AS BIGINT)
                     AS err_ppm
            FROM est e JOIN ex x ON e.g = x.g
        """,
        "events_day_gaps": """
            WITH days AS (
              SELECT DISTINCT event_type,
                     date_diff('day', DATE '1970-01-01',
                               CAST(ts AS DATE)) AS d
              FROM events
              WHERE event_type IS NOT NULL AND ts IS NOT NULL),
            g AS (
              SELECT event_type, d,
                     LEAD(d) OVER (PARTITION BY event_type ORDER BY d)
                       AS next_d
              FROM days)
            SELECT event_type,
                   CAST(d + 1 AS BIGINT) AS gap_start,
                   CAST(next_d - 1 AS BIGINT) AS gap_end,
                   CAST(next_d - d - 1 AS BIGINT) AS gap_days
            FROM g WHERE next_d > d + 1
        """,
        # Equi-depth histogram: nearest-rank boundaries as cum*k >= i*n
        # in integers; HUGEINT cums cast back for generate_series.
        "price_histogram": """
            WITH cells AS (
              SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
                     CAST(COUNT(*) AS BIGINT) AS cnt
              FROM lineitem WHERE l_extendedprice IS NOT NULL
              GROUP BY 1),
            run AS (
              SELECT v,
                     SUM(cnt) OVER (ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cum,
                     SUM(cnt) OVER (ORDER BY v
                       ROWS UNBOUNDED PRECEDING) - cnt AS cum_prev
              FROM cells),
            t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM cells),
            spans AS (
              SELECT r.v, r.cum,
                     UNNEST(generate_series(
                       CAST(r.cum_prev * 8 // t.n + 1 AS BIGINT),
                       CAST(r.cum * 8 // t.n AS BIGINT))) AS bucket
              FROM run r, t
              WHERE r.cum * 8 // t.n >= r.cum_prev * 8 // t.n + 1)
            SELECT CAST(bucket AS BIGINT) AS bucket,
                   v AS upper_v,
                   CAST(cum AS BIGINT) AS cum_rows,
                   CAST(cum - COALESCE(LAG(cum) OVER (ORDER BY bucket), 0)
                        AS BIGINT) AS n_in_bucket
            FROM spans
        """,
        # Link-prediction eval: AA on the train split, MW-AUC machinery
        # identical to events_value_drift's oracle.
        "linkpred_eval": '''
            WITH d AS (
              SELECT doc_id,
                     'https://' || source || '.test/doc/'
                       || CAST(doc_id AS VARCHAR) AS src
              FROM documents),
            e0 AS (
              SELECT doc_id, src,
                     unnest(generate_series(0,
                       CASE WHEN doc_id = 0 THEN 69 ELSE 2 END)) AS k
              FROM d),
            e1 AS (
              SELECT DISTINCT src,
                     CASE WHEN doc_id = 0
                          THEN 'hub' || CAST(k AS VARCHAR) || '.test'
                          ELSE 't' || CAST(
                            ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                              || CAST(k AS VARCHAR)), 1, 15))::BIGINT % 40
                            AS VARCHAR) || '.test' END AS dst
              FROM e0),
            se AS (
              SELECT src, dst,
                     (('0x' || substr(md5(src || '>' || dst), 1, 15))
                       ::BIGINT % 5 = 0) AS is_held
              FROM e1),
            train AS (SELECT src, dst FROM se WHERE NOT is_held),
            hd AS (SELECT src, dst FROM se WHERE is_held),
            deg AS (SELECT src, COUNT(*) AS o FROM train GROUP BY src),
            kept AS (
              SELECT t.src, t.dst,
                     1000000 // CAST(length(bin(o)) AS BIGINT) AS w_ppm
              FROM train t JOIN deg USING (src)
              WHERE o <= 64),
            p AS (
              SELECT x.dst AS a, y.dst AS b, x.w_ppm
              FROM kept x JOIN kept y ON x.src = y.src AND x.dst < y.dst),
            aa AS (
              SELECT a, b, CAST(SUM(w_ppm) AS BIGINT) AS v
              FROM p GROUP BY a, b HAVING COUNT(*) >= 1),
            pos AS (
              SELECT DISTINCT x.dst AS a, y.dst AS b
              FROM hd x JOIN hd y ON x.src = y.src AND x.dst < y.dst),
            f AS (
              SELECT 'aa' AS g, (pos.a IS NOT NULL) AS lab, aa.v
              FROM aa LEFT JOIN pos
                ON aa.a = pos.a AND aa.b = pos.b),
            cells AS (
              SELECT g, v,
                     SUM(CASE WHEN lab THEN 1 ELSE 0 END) AS ca_v,
                     SUM(CASE WHEN lab THEN 0 ELSE 1 END) AS cb_v
              FROM f GROUP BY g, v),
            run AS (
              SELECT g, v, ca_v, cb_v,
                     SUM(ca_v + cb_v) OVER (PARTITION BY g ORDER BY v)
                       AS c_incl,
                     SUM(ca_v) OVER (PARTITION BY g ORDER BY v) AS ca_incl,
                     SUM(cb_v) OVER (PARTITION BY g ORDER BY v) AS cb_incl,
                     SUM(ca_v) OVER (PARTITION BY g) AS n_a,
                     SUM(cb_v) OVER (PARTITION BY g) AS n_b
              FROM cells),
            per_g AS (
              SELECT g, n_a, n_b,
                     SUM(ca_v * (2 * c_incl - ca_v - cb_v + 1))
                       AS ranksum2_a,
                     MAX(ABS(ca_incl * n_b - cb_incl * n_a)) AS ks_num,
                     SUM(ABS(ca_v * n_b - cb_v * n_a)) AS tv_num
              FROM run GROUP BY g, n_a, n_b)
            SELECT g AS model,
                   CAST(n_a AS BIGINT) AS n_a,
                   CAST(n_b AS BIGINT) AS n_b,
                   CAST(ranksum2_a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
                   CAST(CAST(ranksum2_a - n_a * (n_a + 1) AS HUGEINT)
                        * 1000000 // (2 * CAST(n_a AS HUGEINT) * n_b)
                        AS BIGINT) AS auc_ppm,
                   CAST(ks_num AS BIGINT) AS ks_num,
                   CAST(CAST(ks_num AS HUGEINT) * 1000000
                        // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
                     AS ks_ppm,
                   CAST(tv_num AS BIGINT) AS tv_num,
                   CAST(CAST(tv_num AS HUGEINT) * 1000000
                        // (2 * CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
                     AS tv_ppm
            FROM per_g WHERE n_a > 0 AND n_b > 0
        ''',
        # WAND bounds: the bm25 fixed-point algebra over the WHOLE vocab
        # (hits = all non-empty tokens), folded to per-term maxima.
        "wand_bounds": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
                       AS term
              FROM documents),
            tk AS (SELECT doc_id, term FROM toks WHERE term <> ''),
            dl AS (
              SELECT doc_id,
                     CAST(len(regexp_split_to_array(trim(lower(text)),
                                                    '\s+')) AS BIGINT) AS dl
              FROM documents),
            stats AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST((CAST(SUM(len(regexp_split_to_array(
                              trim(lower(text)), '\s+'))) AS BIGINT) * 1000)
                          // COUNT(*) AS BIGINT) AS avgdl_x1000
              FROM documents),
            tf AS (
              SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
              FROM tk GROUP BY 1, 2),
            dfx AS (
              SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
              FROM tk GROUP BY 1),
            scored AS (
              SELECT t.term, f.df, t.tf,
                     (t.tf * 2200 * 1000000)
                       // (t.tf * 1000000
                           + 1200 * (1000 - 750
                                     + (750 * d.dl * 1000)
                                       // s.avgdl_x1000)) AS tf_ppm,
                     CAST(length(bin((s.n_docs * 1000) // f.df)) AS BIGINT)
                       AS idf_units
              FROM tf t JOIN dfx f USING (term)
                        JOIN dl d USING (doc_id), stats s)
            SELECT term,
                   CAST(MAX(df) AS BIGINT) AS df,
                   CAST(MAX(tf) AS BIGINT) AS max_tf,
                   CAST(MAX(tf_ppm * idf_units) AS BIGINT) AS ub_units
            FROM scored GROUP BY term
        """,
        # Domain caps: the shared PSL longest-match chain + a plain
        # per-domain ROW_NUMBER (the salted two-phase plan is the DUT).
        "domain_caps": '''
            WITH d AS (
              SELECT doc_id,
                     CASE CAST(doc_id % 3 AS INT)
                       WHEN 0 THEN 'b' || CAST(doc_id % 4 AS VARCHAR)
                                   || '.blog.example.com'
                       WHEN 1 THEN source || '.github.io'
                       ELSE source || '.test' END AS host,
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                       % 1000 AS quality
              FROM documents),
            h0 AS (SELECT DISTINCT host FROM d),
            lab AS (
              SELECT host, string_split(host, '.') AS labels,
                     CAST(len(string_split(host, '.')) AS INT) AS n
              FROM h0),
            cand AS (
              SELECT host, labels, n,
                     unnest(generate_series(1, least(3, n))) AS k
              FROM lab),
            psl(suffix) AS (VALUES
              ('com'), ('net'), ('org'), ('io'), ('ai'), ('dev'), ('app'),
              ('test'), ('edu'), ('gov'),
              ('co.uk'), ('org.uk'), ('ac.uk'), ('gov.uk'),
              ('com.au'), ('net.au'), ('org.au'),
              ('co.jp'), ('co.in'), ('com.br'), ('com.cn'),
              ('github.io'), ('gitlab.io'), ('blogspot.com'),
              ('herokuapp.com'), ('s3.amazonaws.com')),
            j AS (
              SELECT c.host, c.labels, c.n,
                     CASE WHEN p.suffix IS NOT NULL THEN c.k END AS mk
              FROM cand c LEFT JOIN psl p
                ON array_to_string(c.labels[c.n - CAST(c.k AS INT) + 1:c.n], '.')
                   = p.suffix),
            m AS (
              SELECT host, any_value(labels) AS labels, any_value(n) AS n,
                     CAST(COALESCE(MAX(mk), 1) AS INT) AS k
              FROM j GROUP BY host),
            dom AS (
              SELECT host,
                     COALESCE(
                       CASE WHEN n > k
                            THEN array_to_string(labels[n - k:n], '.') END,
                       host) AS domain
              FROM m),
            r AS (
              SELECT d.doc_id, dom.domain, d.quality,
                     ROW_NUMBER() OVER (PARTITION BY dom.domain
                                        ORDER BY d.quality DESC, d.doc_id ASC)
                       AS domain_rank
              FROM d JOIN dom ON d.host = dom.host)
            SELECT doc_id, domain, quality,
                   CAST(domain_rank AS INT) AS domain_rank
            FROM r WHERE domain_rank <= 5
        ''',
        # SURT: same regexes on RE2; list_reverse mirrors F.reverse.
        "surt_keys": r"""
            WITH u AS (
              SELECT doc_id,
                     CASE CAST(doc_id % 4 AS INT)
                       WHEN 0 THEN 'https://www.' || source || '.test/doc/'
                                   || CAST(doc_id AS VARCHAR) || '?q=1'
                       WHEN 1 THEN 'https://a.b.' || source || '.co.uk/doc/'
                                   || CAST(doc_id AS VARCHAR)
                       WHEN 2 THEN 'https://' || source || '.test'
                       ELSE 'http://' || source || '.test/doc/'
                            || CAST(doc_id AS VARCHAR) || '#frag'
                     END AS url
              FROM documents),
            h AS (
              SELECT doc_id, url,
                     lower(regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)', 1)) AS host0,
                     regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^#]*)', 1) AS pq0
              FROM u),
            h2 AS (
              SELECT doc_id, url,
                     CASE WHEN starts_with(host0, 'www.')
                          THEN substr(host0, 5) ELSE host0 END AS host,
                     CASE WHEN pq0 = '' THEN '/' ELSE pq0 END AS pathq
              FROM h)
            SELECT doc_id, url,
                   array_to_string(list_reverse(string_split(host, '.')), ',')
                     || ')' || pathq AS surt
            FROM h2
        """,
        # Link headers: identical segment/target/rel regexes; ordered
        # unnest via the shared range() idiom.
        "link_headers": r"""
            WITH u AS (SELECT doc_id, url, host FROM ({_DOC})),
            lv AS (
              SELECT url,
                     CASE CAST(doc_id % 3 AS INT)
                       WHEN 0 THEN '<https://' || host || '/doc/'
                         || CAST(doc_id + 1 AS VARCHAR)
                         || '>; rel="next", <https://' || host || '/doc/'
                         || CAST(doc_id - 1 AS VARCHAR) || '>; rel="prev"'
                       WHEN 1 THEN '<https://' || host
                         || '/c>; REL=canonical; type="text/html"'
                       ELSE '' END AS link
              FROM u),
            sg AS (
              SELECT url, regexp_extract_all(link, '<[^>]*>[^,]*') AS segs
              FROM lv),
            ex AS (
              SELECT url, CAST(i - 1 AS INT) AS link_order, segs[i] AS seg
              FROM sg, UNNEST(range(1, len(segs) + 1)) AS t(i))
            SELECT url, link_order,
                   regexp_extract(seg, '<([^>]*)>', 1) AS target,
                   lower(regexp_extract(seg,
                     '(?i)rel\s*=\s*"?([a-zA-Z-]+)"?', 1)) AS rel
            FROM ex
            WHERE regexp_extract(seg, '<([^>]*)>', 1) <> ''
              AND regexp_extract(seg,
                    '(?i)rel\s*=\s*"?([a-zA-Z-]+)"?', 1) <> ''
        """.replace("({_DOC})", f"({_DOC_URLS_SQL})"),
        # hreflang reciprocity: same triple synthesis, EXISTS mirror.
        "hreflang_recip": """
            WITH e0 AS (
              SELECT doc_id, unnest([0, 1, 2]) AS v FROM documents
              WHERE doc_id % 7 <> 0),
            e AS (
              SELECT 'https://x.test/doc/' || CAST(doc_id AS VARCHAR) AS url,
                     'https://x.test/doc/'
                       || CAST(doc_id - (doc_id % 3) + v AS VARCHAR) AS href,
                     ['en', 'de', 'fr'][CAST(v AS INT) + 1] AS hreflang
              FROM e0 WHERE v <> doc_id % 3)
            SELECT url, href, hreflang,
                   CAST(EXISTS (SELECT 1 FROM e b
                                WHERE b.url = e1.href AND b.href = e1.url)
                        AS INT) AS reciprocal
            FROM e e1 WHERE url <> href
        """,
        # Shared-IP budgets: exact largest-remainder mirror (floor + the
        # fractional-remainder ROW_NUMBER), remainder = min(cap, sum)
        # minus the floored grants.
        "ip_budgets": f"""
            WITH h0 AS (
              SELECT DISTINCT host FROM ({_DOC_URLS_SQL})),
            h AS (
              SELECT host,
                     '10.0.0.' || CAST(
                       ('0x' || substr(md5(host), 1, 15))::BIGINT % 4
                       AS VARCHAR) AS ip,
                     ('0x' || substr(md5(host), 1, 15))::BIGINT % 7 + 1
                       AS requested
              FROM h0),
            tot AS (
              SELECT ip, CAST(SUM(requested) AS BIGINT) AS sum_req
              FROM h GROUP BY ip),
            j AS (
              SELECT h.host, h.ip, h.requested, t.sum_req,
                     CASE WHEN t.sum_req > 10
                          THEN (10 * h.requested) // t.sum_req
                          ELSE h.requested END AS g0,
                     CASE WHEN t.sum_req > 10
                          THEN (10 * h.requested) % t.sum_req
                          ELSE 0 END AS frac
              FROM h JOIN tot t USING (ip)),
            rk AS (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY ip
                          ORDER BY frac DESC, host ASC) AS rn
              FROM j),
            rem AS (
              SELECT ip,
                     least(MAX(sum_req), 10) - CAST(SUM(g0) AS BIGINT) AS r
              FROM rk GROUP BY ip)
            SELECT rk.host, rk.ip,
                   CAST(rk.requested AS BIGINT) AS requested,
                   CAST(rk.g0 + CASE WHEN rk.rn <= rem.r THEN 1 ELSE 0 END
                        AS BIGINT) AS granted
            FROM rk JOIN rem USING (ip)
        """,
        # Semantic decontamination: the same SRP bucket literals; LSH
        # candidate semantics mirrored as hamming(buckets) <= 1.
        "semantic_decontam": f"""
            WITH co AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                     {_srp_bucket_sql(64, 8, 42)} AS bucket
              FROM embeddings),
            ev AS (
              SELECT vec_id + 1000000 AS eval_id,
                     CAST(embedding AS DOUBLE[]) AS v,
                     {_srp_bucket_sql(64, 8, 42)} AS bucket
              FROM embeddings WHERE vec_id % 97 = 0)
            SELECT co.vec_id, ev.eval_id,
                   ROUND(list_cosine_similarity(co.v, ev.v), 6) AS cosine
            FROM co JOIN ev
              ON bit_count(xor(co.bucket, ev.bucket)) <= 1
            WHERE ROUND(list_cosine_similarity(co.v, ev.v), 6) >= 0.4
        """,
        # Threshold sweep: the shared pair SQL as a subquery, a VALUES
        # threshold dim, exact ppm compare, zero rows COALESCEd in.
        "dedup_threshold_sweep": f"""
            WITH pairs AS ({_JACCARD_PAIRS_SQL}),
            th(threshold_ppm) AS (VALUES
              (100000), (300000), (500000), (700000), (900000)),
            k AS (
              SELECT th.threshold_ppm, p.id_b,
                     CAST(ROUND(p.jaccard * 1000000) AS BIGINT) AS ppm
              FROM pairs p CROSS JOIN th),
            a AS (
              SELECT threshold_ppm,
                     CAST(COUNT(*) AS BIGINT) AS n_pairs,
                     CAST(COUNT(DISTINCT id_b) AS BIGINT) AS n_docs_dropped
              FROM k WHERE ppm >= threshold_ppm GROUP BY 1)
            SELECT CAST(th.threshold_ppm AS BIGINT) AS threshold_ppm,
                   COALESCE(a.n_pairs, 0) AS n_pairs,
                   COALESCE(a.n_docs_dropped, 0) AS n_docs_dropped
            FROM th LEFT JOIN a USING (threshold_ppm)
        """,
        # Delay compliance: lag materialized in its own CTE; NULL gaps
        # (first fetch per host) fall out of COUNT/CASE identically.
        "delay_compliance": f"""
            WITH u AS (SELECT doc_id, host FROM ({_DOC_URLS_SQL})),
            l AS (
              SELECT host,
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                       % 10000000 AS fetch_us,
                     CAST((CAST(regexp_extract(host, '(\\d+)', 1) AS INT) % 3 + 1)
                          * 1000000 AS BIGINT) AS policy_us,
                     doc_id AS fetch_id
              FROM u),
            lg AS (
              SELECT host, policy_us, fetch_us,
                     lag(fetch_us) OVER (PARTITION BY host
                                         ORDER BY fetch_us, fetch_id) AS prev
              FROM l),
            g AS (SELECT host, policy_us, fetch_us - prev AS gap FROM lg)
            SELECT host,
                   CAST(COUNT(*) AS BIGINT) AS n_fetches,
                   CAST(COUNT(gap) AS BIGINT) AS n_gaps,
                   CAST(MIN(gap) AS BIGINT) AS min_gap_us,
                   CAST(SUM(CASE WHEN gap < policy_us THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_violations,
                   CASE WHEN COUNT(gap) > 0
                        THEN CAST(SUM(CASE WHEN gap < policy_us
                                           THEN 1 ELSE 0 END) AS BIGINT)
                             * 1000000 // CAST(COUNT(gap) AS BIGINT)
                        ELSE 0 END AS violation_ppm
            FROM g GROUP BY host
        """,
        # Image sitemaps: the oracle re-parses with RE2 (lazy blocks are
        # fine here — this regex runs in DuckDB only; the Spark side is
        # native from_xml, so no cross-engine regex contract applies).
        "sitemap_images": f"""
            WITH u AS (SELECT doc_id, url FROM ({_DOC_URLS_SQL})),
            x AS (
              SELECT doc_id,
                     CASE CAST(doc_id % 3 AS INT)
                       WHEN 0 THEN '<url><loc>' || url || '</loc>'
                         || '<image:image><image:loc>https://img.test/i'
                         || CAST(doc_id AS VARCHAR)
                         || 'a.png</image:loc><image:caption>cap '
                         || CAST(doc_id AS VARCHAR)
                         || '</image:caption></image:image>'
                         || '<image:image><image:loc>https://img.test/i'
                         || CAST(doc_id AS VARCHAR)
                         || 'b.png</image:loc></image:image></url>'
                       WHEN 1 THEN '<url><loc>' || url || '</loc>'
                         || '<image:image><image:loc>https://img.test/i'
                         || CAST(doc_id AS VARCHAR)
                         || '.jpg</image:loc></image:image></url>'
                       ELSE '<url><loc>' || url || '</loc></url>'
                     END AS block
              FROM u),
            imgs AS (
              SELECT doc_id,
                     trim(regexp_extract(block, '<loc>([^<]*)</loc>', 1)) AS loc,
                     regexp_extract_all(block,
                       '<image:image>.*?</image:image>') AS im
              FROM x),
            e AS (
              SELECT doc_id, loc, CAST(i - 1 AS INT) AS img_order, im[i] AS img
              FROM imgs, UNNEST(range(1, len(im) + 1)) AS t(i))
            SELECT doc_id, loc, img_order,
                   trim(regexp_extract(img,
                     '<image:loc>([^<]*)</image:loc>', 1)) AS image_loc,
                   NULLIF(regexp_extract(img,
                     '<image:caption>([^<]*)</image:caption>', 1), '') AS caption
            FROM e
            WHERE trim(regexp_extract(img,
                    '<image:loc>([^<]*)</image:loc>', 1)) <> ''
        """,
        # UCB allocation: shared bin() bit-length log + IEEE-exact
        # floor(sqrt) over a < 2^52 integer argument.
        "ucb_allocation": f"""
            WITH s AS (
              SELECT host,
                     CAST(COUNT(*) AS BIGINT) AS n_fetches,
                     CAST(SUM(CASE WHEN n_chars > 600 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_useful
              FROM ({_DOC_URLS_SQL}) GROUP BY host),
            t AS (SELECT CAST(SUM(n_fetches) AS BIGINT) AS N FROM s),
            x AS (
              SELECT s.host, s.n_fetches,
                     n_useful * 1000000 // n_fetches AS yield_ppm,
                     CAST(FLOOR(SQRT(CAST(
                       2 * length(bin(t.N)) * 1000000000000 // n_fetches
                       AS DOUBLE))) AS BIGINT) AS bonus_ppm
              FROM s, t)
            SELECT host, n_fetches,
                   CAST(yield_ppm AS BIGINT) AS yield_ppm,
                   bonus_ppm,
                   CAST(yield_ppm + bonus_ppm AS BIGINT) AS ucb_ppm
            FROM x
        """,
        # NDCG: shiftleft gains (1::BIGINT << rel), bit-length discount,
        # ideal ordering in its own window CTE.
        "retrieval_ndcg": """
            WITH qd AS (
              SELECT doc_id, unnest([0, 1, 2]) AS query_id FROM documents),
            cand AS (
              SELECT query_id, doc_id FROM qd
              WHERE doc_id % 5 = query_id),
            rk AS (
              SELECT query_id, doc_id,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY md5(CAST(doc_id AS VARCHAR) || '|'
                                    || CAST(query_id AS VARCHAR)),
                                doc_id) AS rank
              FROM cand),
            ranked AS (SELECT * FROM rk WHERE rank <= 10),
            qrels AS (
              SELECT query_id, doc_id,
                     CAST((doc_id + query_id) % 4 AS INT) AS rel
              FROM qd WHERE doc_id % 2 = 0),
            sc AS (
              SELECT r.query_id,
                     COALESCE((1::BIGINT << q.rel) - 1, 0) * 1000000
                       // CAST(length(bin(r.rank + 1)) AS BIGINT) AS term
              FROM ranked r LEFT JOIN qrels q
                ON r.query_id = q.query_id AND r.doc_id = q.doc_id),
            dcg AS (
              SELECT query_id, CAST(SUM(term) AS BIGINT) AS dcg_units
              FROM sc GROUP BY query_id),
            irk AS (
              SELECT query_id, rel,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY rel DESC, doc_id ASC) AS irank
              FROM qrels),
            idcg AS (
              SELECT query_id,
                     CAST(SUM(((1::BIGINT << rel) - 1) * 1000000
                          // CAST(length(bin(irank + 1)) AS BIGINT))
                          AS BIGINT) AS idcg_units
              FROM irk WHERE irank <= 10 GROUP BY query_id)
            SELECT d.query_id, d.dcg_units, i.idcg_units,
                   d.dcg_units * 1000000 // i.idcg_units AS ndcg_ppm
            FROM dcg d JOIN idcg i USING (query_id)
            WHERE i.idcg_units > 0
        """,
        # Word-boundary exact blocklist: tokenize on non-alphanumeric,
        # distinct-intersect with the literal list, sorted hit string
        # (COALESCE: DuckDB array_to_string([]) is NULL, Spark's is '').
        "blocklist_filter": """
            WITH t AS (
              SELECT doc_id,
                     list_sort(list_intersect(
                       list_distinct(list_filter(
                         string_split_regex(lower(coalesce(text, '')),
                                            '[^a-z0-9]+'),
                         x -> x <> '')),
                       ['slow', 'trap', 'vector'])) AS hits
              FROM documents)
            SELECT doc_id,
                   CAST(CASE WHEN len(hits) > 0 THEN 1 ELSE 0 END AS INT)
                     AS blocked,
                   CAST(len(hits) AS INT) AS n_blocked_terms,
                   COALESCE(array_to_string(hits, ' '), '') AS blocked_terms
            FROM t
        """,
        # Domain leakage: md5-ppm split ranges (sorted-weight order:
        # test/train/val), PSL longest-match registrable domain (same
        # list-lambda mirror as registrable_domains), one grouped agg.
        "domain_leakage": """
            WITH d AS (SELECT doc_id, source FROM documents),
            h AS (
              SELECT doc_id,
                     ['', 'www.', 'a.b.'][CAST(doc_id % 3 AS INT) + 1]
                       || source || '.test' AS host
              FROM d),
            sp AS (
              SELECT doc_id,
                     ('0x' || substr(md5('split1|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                       % 1000000 AS ppm
              FROM d),
            s AS (
              SELECT h.doc_id, h.host,
                     CASE WHEN ppm >= 0 AND ppm < 100000 THEN 'test'
                          WHEN ppm >= 100000 AND ppm < 900000 THEN 'train'
                          WHEN ppm >= 900000 AND ppm < 1000000 THEN 'val'
                     END AS split
              FROM h JOIN sp USING (doc_id)),
            lab AS (SELECT DISTINCT host FROM h),
            l2 AS (
              SELECT host, string_split(host, '.') AS labels,
                     CAST(len(string_split(host, '.')) AS INT) AS n
              FROM lab),
            cand AS (
              SELECT host, labels, n,
                     unnest(generate_series(1, least(3, n))) AS k
              FROM l2),
            psl(suffix) AS (VALUES
              ('com'), ('net'), ('org'), ('io'), ('ai'), ('dev'), ('app'),
              ('test'), ('edu'), ('gov'),
              ('co.uk'), ('org.uk'), ('ac.uk'), ('gov.uk'),
              ('com.au'), ('net.au'), ('org.au'),
              ('co.jp'), ('co.in'), ('com.br'), ('com.cn'),
              ('github.io'), ('gitlab.io'), ('blogspot.com'),
              ('herokuapp.com'), ('s3.amazonaws.com')),
            j AS (
              SELECT c.host, c.labels, c.n,
                     CASE WHEN p.suffix IS NOT NULL THEN c.k END AS mk
              FROM cand c LEFT JOIN psl p
                ON array_to_string(c.labels[c.n - CAST(c.k AS INT) + 1:c.n], '.')
                   = p.suffix),
            m AS (
              SELECT host, any_value(labels) AS labels, any_value(n) AS n,
                     CAST(COALESCE(MAX(mk), 1) AS INT) AS k
              FROM j GROUP BY host),
            dm AS (
              SELECT host,
                     CASE WHEN n > k
                          THEN array_to_string(labels[n - k:n], '.')
                     END AS registrable_domain
              FROM m),
            agg AS (
              SELECT dm.registrable_domain,
                     CAST(SUM(CASE WHEN s.split = 'train' THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_train,
                     CAST(SUM(CASE WHEN s.split = 'test' THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_test
              FROM s JOIN dm ON s.host = dm.host
              GROUP BY dm.registrable_domain)
            SELECT registrable_domain, n_train, n_test,
                   CAST(least(n_train, n_test) * 1000000 // (n_train + n_test)
                        AS BIGINT) AS leak_ppm
            FROM agg WHERE n_train > 0 AND n_test > 0
        """,
        # Margin mining: same SRP bucket literals + hamming<=1 candidate
        # semantics as embedding_neardup; ppm cosines, ratio-of-means
        # cleared of division (2·c·kf·kb·1e6 // (fs·kb + bs·kf)), every
        # window in its own CTE (DuckDB nested-window trap).
        "margin_bitext": f"""
            WITH bk AS (
              SELECT vec_id, CAST(vec_id % 2 AS INT) AS side,
                     CAST(embedding AS DOUBLE[]) AS v,
                     {_srp_bucket_sql(64, 8, 42)} AS bucket
              FROM embeddings),
            c0 AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     CAST(ROUND(list_cosine_similarity(a.v, b.v) * 1000000)
                          AS BIGINT) AS c_ppm
              FROM bk a JOIN bk b
                ON a.side = 0 AND b.side = 1
               AND bit_count(xor(a.bucket, b.bucket)) <= 1),
            cands AS (SELECT * FROM c0 WHERE c_ppm > 0),
            fr AS (
              SELECT id_a, id_b, c_ppm,
                     ROW_NUMBER() OVER (PARTITION BY id_a
                       ORDER BY c_ppm DESC, id_b ASC) AS rn
              FROM cands),
            fwd AS (
              SELECT id_a, CAST(SUM(c_ppm) AS BIGINT) AS fwd_sum,
                     CAST(COUNT(*) AS BIGINT) AS kf
              FROM fr WHERE rn <= 4 GROUP BY id_a),
            br AS (
              SELECT id_a, id_b, c_ppm,
                     ROW_NUMBER() OVER (PARTITION BY id_b
                       ORDER BY c_ppm DESC, id_a ASC) AS rn
              FROM cands),
            bwd AS (
              SELECT id_b, CAST(SUM(c_ppm) AS BIGINT) AS bwd_sum,
                     CAST(COUNT(*) AS BIGINT) AS kb
              FROM br WHERE rn <= 4 GROUP BY id_b),
            sc AS (
              SELECT c.id_a, c.id_b, c.c_ppm,
                     2 * c.c_ppm * f.kf * b.kb * 1000000
                       // (f.fwd_sum * b.kb + b.bwd_sum * f.kf) AS margin_ppm
              FROM cands c JOIN fwd f USING (id_a) JOIN bwd b USING (id_b)),
            fl AS (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY id_a
                          ORDER BY margin_ppm DESC, id_b ASC) AS rn
              FROM sc WHERE margin_ppm >= 1050000)
            SELECT id_a, id_b, c_ppm AS cosine_ppm,
                   CAST(margin_ppm AS BIGINT) AS margin_ppm
            FROM fl WHERE rn = 1
        """,
        # Funnel latency: nearest-rank quantiles, floor(epoch) seconds.
        "funnel_latency": """
            WITH s1 AS (
              SELECT user_id, MIN(ts) AS t1 FROM events
              WHERE event_type = 'view' GROUP BY user_id),
            s2 AS (
              SELECT e.user_id, MIN(e.ts) AS t2, MAX(s1.t1) AS t1
              FROM events e JOIN s1 USING (user_id)
              WHERE e.event_type = 'click' AND e.ts > s1.t1
              GROUP BY e.user_id),
            s3 AS (
              SELECT e.user_id, MIN(e.ts) AS t3, MAX(s2.t2) AS t2
              FROM events e JOIN s2 USING (user_id)
              WHERE e.event_type = 'purchase' AND e.ts > s2.t2
              GROUP BY e.user_id),
            d AS (
              SELECT 'view_to_click' AS pair,
                     CAST(floor(epoch(t2)) AS BIGINT)
                     - CAST(floor(epoch(t1)) AS BIGINT) AS delta_s
              FROM s2
              UNION ALL
              SELECT 'click_to_purchase',
                     CAST(floor(epoch(t3)) AS BIGINT)
                     - CAST(floor(epoch(t2)) AS BIGINT)
              FROM s3),
            r AS (
              SELECT pair, delta_s,
                     ROW_NUMBER() OVER (PARTITION BY pair
                                        ORDER BY delta_s) AS rn,
                     COUNT(*) OVER (PARTITION BY pair) AS n
              FROM d)
            SELECT pair, CAST(MAX(n) AS BIGINT) AS n_users,
                   CAST(MAX(CASE WHEN rn = (n + 1) // 2
                            THEN delta_s END) AS BIGINT) AS med_s,
                   CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10
                            THEN delta_s END) AS BIGINT) AS p90_s
            FROM r GROUP BY pair
        """,
        # MRR over the ndcg fixture's rankings: binary rel >= 1.
        "retrieval_mrr": """
            WITH qd AS (
              SELECT doc_id, unnest([0, 1, 2]) AS query_id FROM documents),
            cand AS (
              SELECT query_id, doc_id FROM qd
              WHERE doc_id % 5 = query_id),
            rk AS (
              SELECT query_id, doc_id,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY md5(CAST(doc_id AS VARCHAR) || '|'
                                    || CAST(query_id AS VARCHAR)),
                                doc_id) AS rank
              FROM cand),
            ranked AS (SELECT * FROM rk WHERE rank <= 10),
            qrels AS (
              SELECT query_id, doc_id,
                     CAST((doc_id + query_id) % 4 AS INT) AS rel
              FROM qd WHERE doc_id % 2 = 0),
            sc AS (
              SELECT r.query_id, r.rank,
                     CASE WHEN COALESCE(q.rel, 0) >= 1 THEN 1 ELSE 0
                     END AS hit
              FROM ranked r LEFT JOIN qrels q
                ON r.query_id = q.query_id AND r.doc_id = q.doc_id),
            per AS (
              SELECT query_id,
                     MIN(CASE WHEN hit = 1 THEN rank END) AS first_hit,
                     CAST(SUM(hit) AS BIGINT) AS n_hits
              FROM sc GROUP BY query_id)
            SELECT query_id,
                   CAST(COALESCE(first_hit, 0) AS BIGINT)
                     AS first_hit_rank,
                   CAST(CASE WHEN first_hit IS NOT NULL
                        THEN 1000000 // first_hit ELSE 0 END AS BIGINT)
                     AS rr_ppm,
                   n_hits,
                   CAST(n_hits * 1000000 // 10 AS BIGINT)
                     AS precision_ppm
            FROM per
        """,
        # Discrete hazard over 30-min-gap session durations (whole
        # minutes); epoch() cast to BIGINT mirrors Spark's ts->long.
        "session_hazard": """
            WITH x AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                          THEN 1 ELSE 0 END AS new_sess
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            y AS (
              SELECT user_id, ts,
                     SUM(new_sess) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_id
              FROM x),
            d AS (
              SELECT user_id, session_id,
                     (MAX(CAST(floor(epoch(ts)) AS BIGINT))
                      - MIN(CAST(floor(epoch(ts)) AS BIGINT))) // 60
                       AS dur
              FROM y GROUP BY 1, 2),
            hist AS (
              SELECT dur AS dm, CAST(COUNT(*) AS BIGINT) AS n_ended
              FROM d GROUP BY 1),
            ar AS (
              SELECT dm, n_ended,
                     SUM(n_ended) OVER (ORDER BY dm DESC
                       ROWS UNBOUNDED PRECEDING) AS n_at_risk
              FROM hist),
            t AS (SELECT CAST(SUM(n_ended) AS BIGINT) AS n_total
                  FROM hist)
            SELECT ar.dm AS duration_min,
                   CAST(ar.n_at_risk AS BIGINT) AS n_at_risk,
                   ar.n_ended,
                   CAST(ar.n_ended * 1000000 // ar.n_at_risk AS BIGINT)
                     AS hazard_ppm,
                   CAST((ar.n_at_risk - ar.n_ended) * 1000000
                        // t.n_total AS BIGINT) AS survival_ppm
            FROM ar, t
        """,
        # CDC changelog apply: same op-severity tie-break (D > U > I)
        # inside the ROW_NUMBER as storage.cdc_compact.
        "warehouse_cdc_state": """
            WITH base AS (
              SELECT doc_id, md5(text) AS sig FROM documents),
            chg AS (
              SELECT doc_id, md5(text || 'v2') AS sig, 'U' AS op,
                     1 AS seq
              FROM documents WHERE doc_id % 7 = 0
              UNION ALL
              SELECT doc_id, md5(text || 'v3'), 'U', 2
              FROM documents WHERE doc_id % 14 = 0
              UNION ALL
              SELECT doc_id, NULL, 'D', 3
              FROM documents WHERE doc_id % 11 = 3
              UNION ALL
              SELECT doc_id + 1000000, md5(text || 'new'), 'I', 1
              FROM documents WHERE doc_id % 13 = 0),
            lastv AS (
              SELECT doc_id, sig, op FROM (
                SELECT doc_id, sig, op, seq,
                       ROW_NUMBER() OVER (PARTITION BY doc_id
                         ORDER BY seq DESC,
                                  CASE op WHEN 'D' THEN 2
                                          WHEN 'U' THEN 1
                                          ELSE 0 END DESC) AS rn
                FROM chg) WHERE rn = 1)
            SELECT b.doc_id, b.sig
            FROM base b LEFT JOIN lastv l ON b.doc_id = l.doc_id
            WHERE l.doc_id IS NULL
            UNION ALL
            SELECT doc_id, sig FROM lastv WHERE op <> 'D'
        """,
        # PPS systematic sampling: shared md5 hash order; // == div on
        # the non-negative cumulative weights.
        "docs_pps_sample": """
            WITH r AS (
              SELECT source, doc_id, n_chars,
                     CAST(('0x' || substr(md5('pps|'
                           || CAST(doc_id AS VARCHAR)), 1, 15))
                          AS BIGINT) AS skey
              FROM documents
              WHERE source IS NOT NULL AND n_chars >= 0),
            cum AS (
              SELECT source, doc_id, n_chars,
                     SUM(n_chars) OVER (PARTITION BY source ORDER BY skey
                                        ROWS UNBOUNDED PRECEDING) AS cum_w
              FROM r)
            SELECT source, doc_id,
                   CAST(n_chars AS BIGINT) AS n_chars,
                   CAST(cum_w AS BIGINT) AS cum_w,
                   CAST(cum_w // 1000 - (cum_w - n_chars) // 1000
                        AS BIGINT) AS n_hits
            FROM cum
            WHERE cum_w // 1000 - (cum_w - n_chars) // 1000 > 0
        """,
        "docs_l_diversity": """
            WITH cells AS (
              SELECT lang, n_chars // 100 AS len_bucket, source,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM documents GROUP BY 1, 2, 3),
            classes AS (
              SELECT lang, len_bucket, CAST(SUM(n) AS BIGINT) AS sz,
                     CAST(SUM(CASE WHEN source IS NOT NULL
                              THEN 1 ELSE 0 END) AS BIGINT) AS nd
              FROM cells GROUP BY 1, 2),
            f AS (SELECT sz, nd, UNNEST([2, 3, 5, 10]) AS l FROM classes)
            SELECT CAST(l AS BIGINT) AS l,
                   CAST(COUNT(*) AS BIGINT) AS n_classes,
                   CAST(SUM(sz) AS BIGINT) AS n_rows,
                   CAST(SUM(CASE WHEN nd < l THEN 1 ELSE 0 END)
                        AS BIGINT) AS classes_below,
                   CAST(SUM(CASE WHEN nd < l THEN sz ELSE 0 END)
                        AS BIGINT) AS rows_at_risk,
                   CAST(MIN(nd) AS BIGINT) AS min_diversity
            FROM f GROUP BY l
        """,
        # KMV/theta sketch: shared md5 60-bit hash; HUGEINT mirrors the
        # Spark DECIMAL(38,0) estimate arithmetic ((k-1)*2^60 > BIGINT).
        "source_vocab_kmv": r"""
            WITH toks AS (
              SELECT DISTINCT source AS g,
                     CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT)
                       AS h
              FROM (SELECT source,
                           UNNEST(string_split(lower(regexp_replace(
                             trim(text), '\s+', ' ', 'g')), ' ')) AS tok
                    FROM documents
                    WHERE source IS NOT NULL AND text IS NOT NULL)
              WHERE len(tok) >= 1),
            mins AS (
              SELECT g, h FROM (
                SELECT g, h,
                       ROW_NUMBER() OVER (PARTITION BY g ORDER BY h)
                         AS rn
                FROM toks) WHERE rn <= 64),
            gs AS (SELECT DISTINCT g FROM mins),
            pairs AS (
              SELECT a.g AS g_a, b.g AS g_b
              FROM gs a JOIN gs b ON a.g < b.g),
            pu AS (
              SELECT p.g_a, p.g_b, m.h,
                     MAX(CASE WHEN m.g = p.g_a THEN 1 ELSE 0 END) AS in_a,
                     MAX(CASE WHEN m.g = p.g_b THEN 1 ELSE 0 END) AS in_b
              FROM pairs p JOIN mins m ON m.g IN (p.g_a, p.g_b)
              GROUP BY p.g_a, p.g_b, m.h),
            ranked AS (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY g_a, g_b
                                           ORDER BY h) AS urn
              FROM pu),
            agg AS (
              SELECT g_a, g_b, CAST(COUNT(*) AS BIGINT) AS k_u,
                     CAST(MAX(h) AS BIGINT) AS theta,
                     CAST(SUM(in_a * in_b) AS BIGINT) AS inter_in_uk
              FROM ranked WHERE urn <= 64 GROUP BY g_a, g_b),
            est AS (
              SELECT *,
                     CAST(CASE WHEN k_u < 64 THEN k_u
                          ELSE CAST(k_u - 1 AS HUGEINT)
                               * 1152921504606846976 // theta
                          END AS BIGINT) AS est_union
              FROM agg)
            SELECT g_a AS source_a, g_b AS source_b, k_u, theta,
                   inter_in_uk, est_union,
                   CAST(inter_in_uk * 1000000 // k_u AS BIGINT)
                     AS jaccard_ppm,
                   CAST(CAST(est_union AS HUGEINT) * inter_in_uk // k_u
                        AS BIGINT) AS est_inter
            FROM est
        """,
        # Triplet mining: same SRP bucket + packed-BIGINT argmax as the
        # Spark side; // and div agree (packs are non-negative).
        "contrastive_triplets": f"""
            WITH bk AS (
              SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
                     {_srp_bucket_sql(64, 8, 42)} AS bucket
              FROM embeddings WHERE label IS NOT NULL),
            c AS (
              SELECT a.vec_id AS id_a, a.label AS lab_a, b.label AS lab_b,
                     (CAST(ROUND(list_cosine_similarity(a.v, b.v)
                                 * 1000000) AS BIGINT) + 1000000)
                       * 1000000000000
                       + (999999999999 - b.vec_id) AS pack
              FROM bk a JOIN bk b
                ON a.vec_id <> b.vec_id
               AND bit_count(xor(a.bucket, b.bucket)) <= 1),
            best AS (
              SELECT id_a, lab_a,
                     MAX(CASE WHEN lab_a = lab_b THEN pack END) AS pp,
                     MAX(CASE WHEN lab_a <> lab_b THEN pack END) AS np
              FROM c GROUP BY id_a, lab_a)
            SELECT id_a AS anchor_id,
                   CAST(lab_a AS INT) AS label,
                   CAST(999999999999 - pp % 1000000000000 AS BIGINT)
                     AS pos_id,
                   CAST(pp // 1000000000000 - 1000000 AS BIGINT)
                     AS pos_cos_ppm,
                   CAST(999999999999 - np % 1000000000000 AS BIGINT)
                     AS neg_id,
                   CAST(np // 1000000000000 - 1000000 AS BIGINT)
                     AS neg_cos_ppm,
                   CAST(CASE WHEN np // 1000000000000 + 200000
                                  > pp // 1000000000000
                        THEN 1 ELSE 0 END AS INT) AS violates_margin
            FROM best WHERE pp IS NOT NULL AND np IS NOT NULL
        """,
        # Chao1 (bias-corrected) + Good-Turing: pure BIGINT, // matches
        # Spark div on non-negative operands.
        "crawl_completeness": f"""
            WITH u AS (
              SELECT host, doc_id,
                     CAST(CASE WHEN doc_id % 10 < 5 THEN 1
                               WHEN doc_id % 10 < 8 THEN 2
                               WHEN doc_id % 10 < 9 THEN 3
                               ELSE 5 END AS BIGINT) AS n_seen
              FROM ({_DOC_URLS_SQL})),
            g AS (
              SELECT host,
                     CAST(COUNT(*) AS BIGINT) AS s_obs,
                     CAST(SUM(CASE WHEN n_seen = 1 THEN 1 ELSE 0 END)
                          AS BIGINT) AS f1,
                     CAST(SUM(CASE WHEN n_seen = 2 THEN 1 ELSE 0 END)
                          AS BIGINT) AS f2,
                     CAST(SUM(n_seen) AS BIGINT) AS n_discoveries
              FROM u GROUP BY host)
            SELECT host, s_obs, f1, f2, n_discoveries,
                   CAST(s_obs + f1 * (f1 - 1) // (2 * (f2 + 1))
                        AS BIGINT) AS chao1_est,
                   CAST(s_obs * 1000000
                        // (s_obs + f1 * (f1 - 1) // (2 * (f2 + 1)))
                        AS BIGINT) AS coverage_ppm,
                   CAST(f1 * 1000000 // n_discoveries AS BIGINT)
                     AS unseen_mass_ppm
            FROM g
        """,
        # CDC: boundary iff 60-bit md5 slice of the k-gram ENDING at i
        # ≡ 0 (mod 64), cut after i; L closes the last chunk; short
        # docs = one whole-doc chunk. range(k, L+1) = k..L inclusive.
        "cdc_chunks": """
            WITH d AS (
              SELECT doc_id, text, length(text) AS L FROM documents
              WHERE length(text) >= 1),
            pos AS (
              SELECT doc_id, text, L, CAST(i AS INT) AS i
              FROM d, UNNEST(range(8, L + 1)) AS t(i)
              WHERE L >= 8),
            bnd AS (
              SELECT doc_id, i FROM pos
              WHERE i < L
                AND ('0x' || substr(md5(substr(text, i - 8 + 1, 8)), 1, 15))::BIGINT
                    % 64 = 0),
            bl AS (
              SELECT doc_id, list(i ORDER BY i) AS cuts_mid
              FROM bnd GROUP BY doc_id),
            c AS (
              SELECT d.doc_id, d.text,
                     [0] || COALESCE(bl.cuts_mid, []) || [d.L] AS cuts
              FROM d LEFT JOIN bl USING (doc_id)),
            ch AS (
              SELECT doc_id,
                     substr(text, cuts[j] + 1, cuts[j + 1] - cuts[j]) AS chunk
              FROM c, UNNEST(range(1, len(cuts))) AS t(j))
            SELECT md5(chunk) AS chunk_md5,
                   CAST(length(chunk) AS INT) AS chunk_len,
                   CAST(COUNT(*) AS BIGINT) AS n_copies,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
            FROM ch GROUP BY md5(chunk), length(chunk)
        """,
        "bpe_merges": _bpe_merges_oracle(6),
        # Brute force on purpose: the Spark side prunes via the
        # prefix-filter lemma; hash equality against the unpruned join
        # proves no false negatives.
        "prefix_jaccard_pairs": r"""
            WITH tk AS (
              SELECT DISTINCT doc_id, s AS token
              FROM (SELECT doc_id,
                           string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS t
                    FROM documents), UNNEST(t) AS u(s)
              WHERE s <> ''),
            sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS s FROM tk GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS ia, b.doc_id AS ib, CAST(COUNT(*) AS BIGINT) AS ni
              FROM tk a JOIN tk b ON a.token = b.token AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT ia AS id_a, ib AS id_b, ni AS n_inter,
                   sa.s AS size_a, sb.s AS size_b,
                   ni * 1000000 // (sa.s + sb.s - ni) AS jaccard_ppm
            FROM inter
            JOIN sz sa ON sa.doc_id = ia
            JOIN sz sb ON sb.doc_id = ib
            WHERE ni * 1000000 >= 900000 * (sa.s + sb.s - ni)
        """,
        # Candidate CTEs reproduce the md5 LSH pipeline (same SQL as
        # minhash_lsh_pairs_md5); truth is the unpruned exact
        # shingle-Jaccard join at t = 0.5.
        "lsh_recall_eval": r"""
            WITH toks AS (
              SELECT doc_id,
                     string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS t
              FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, s
              FROM toks,
                   UNNEST(list_transform(range(1, GREATEST(len(t) - 2, 0) + 1),
                                         i -> array_to_string(t[i:i+2], ' '))) AS u(s)
              WHERE len(t) >= 3),
            seeds AS (SELECT UNNEST(range(0, 8)) AS seed),
            sig AS (
              SELECT doc_id, seed,
                     MIN(substr(md5(CAST(seed AS VARCHAR) || '|' || s), 1, 15)) AS mh
              FROM sh, seeds GROUP BY doc_id, seed),
            bands AS (
              SELECT doc_id, CAST(seed // 2 AS INT) AS band_idx,
                     string_agg(mh, ',' ORDER BY seed) AS band_key
              FROM sig GROUP BY doc_id, band_idx),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM bands a JOIN bands b USING (band_idx, band_key)
              WHERE a.doc_id < b.doc_id),
            sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS s FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS ni
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            truth AS (
              SELECT id_a, id_b
              FROM inter
              JOIN sz sa ON sa.doc_id = id_a
              JOIN sz sb ON sb.doc_id = id_b
              WHERE ni * 1000000 >= 500000 * (sa.s + sb.s - ni)),
            hit AS (SELECT id_a, id_b FROM cand INTERSECT SELECT id_a, id_b FROM truth),
            m AS (
              SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
                     (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_cand,
                     (SELECT CAST(COUNT(*) AS BIGINT) FROM hit) AS n_hit)
            SELECT n_truth, n_cand, n_hit,
                   n_hit * 1000000 // GREATEST(n_cand, 1) AS precision_ppm,
                   n_hit * 1000000 // GREATEST(n_truth, 1) AS recall_ppm
            FROM m
        """,
        "hyperball_nf": _hyperball_oracle(3, 4),
        "harmonic_centrality": _harmonic_oracle(3, 4, 20),
        "bpe_encode_stats": _bpe_encode_oracle(6),
        "host_communities": _lpa_oracle(4),
        # Recursive closures (set-semantics UNION terminates); pivot =
        # MIN host, matching the Spark default.
        "bowtie_classes": """
            WITH RECURSIVE u AS (
              SELECT source || '.test' AS host, CAST(doc_id AS VARCHAR) AS did
              FROM documents),
            hosts AS (SELECT DISTINCT host FROM u),
            cnt AS (SELECT COUNT(*) AS n_hosts FROM hosts),
            idx AS (
              SELECT host, ROW_NUMBER() OVER (ORDER BY host) - 1 AS host_idx
              FROM hosts),
            raw AS (
              SELECT u.host AS src_host,
                     ('0x' || substr(md5(u.did || ':' || CAST(k AS VARCHAR)), 1, 15))::BIGINT
                       % (SELECT n_hosts FROM cnt) AS dst_idx
              FROM u, UNNEST([0, 1, 2]) AS t(k)),
            e0 AS (
              SELECT DISTINCT r.src_host, i.host AS dst_host
              FROM raw r JOIN idx i ON r.dst_idx = i.host_idx
              WHERE r.src_host <> i.host),
            piv AS (SELECT MIN(host) AS p FROM hosts),
            fwd(host) AS (
              SELECT p FROM piv
              UNION
              SELECT e.dst_host FROM e0 e, fwd f WHERE e.src_host = f.host),
            bwd(host) AS (
              SELECT p FROM piv
              UNION
              SELECT e.src_host FROM e0 e, bwd b WHERE e.dst_host = b.host)
            SELECT h.host,
                   CASE WHEN f.host IS NOT NULL AND b.host IS NOT NULL THEN 'SCC'
                        WHEN b.host IS NOT NULL THEN 'IN'
                        WHEN f.host IS NOT NULL THEN 'OUT'
                        ELSE 'OTHER' END AS component
            FROM hosts h
            LEFT JOIN fwd f ON f.host = h.host
            LEFT JOIN bwd b ON b.host = h.host
        """,
        "effective_diameter": _effective_diameter_oracle(3, 4),
        "kcore_members": _kcore_oracle(12, 4),
        "ktruss_edges": _ktruss_oracle(4, 3),
        "degree_assortativity": """
            WITH u AS (
              SELECT source || '.test' AS host, CAST(doc_id AS VARCHAR) AS did
              FROM documents),
            hosts AS (SELECT DISTINCT host FROM u),
            cnt AS (SELECT COUNT(*) AS n_hosts FROM hosts),
            idx AS (
              SELECT host, ROW_NUMBER() OVER (ORDER BY host) - 1 AS host_idx
              FROM hosts),
            raw AS (
              SELECT u.host AS src_host,
                     ('0x' || substr(md5(u.did || ':' || CAST(k AS VARCHAR)), 1, 15))::BIGINT
                       % (SELECT n_hosts FROM cnt) AS dst_idx
              FROM u, UNNEST([0, 1, 2]) AS t(k)),
            e0 AS (
              SELECT DISTINCT r.src_host, i.host AS dst_host
              FROM raw r JOIN idx i ON r.dst_idx = i.host_idx
              WHERE r.src_host <> i.host),
            und AS (
              SELECT DISTINCT LEAST(src_host, dst_host) AS a,
                              GREATEST(src_host, dst_host) AS b
              FROM e0),
            deg AS (
              SELECT h, CAST(COUNT(*) AS BIGINT) AS deg
              FROM (SELECT a AS h FROM und UNION ALL SELECT b AS h FROM und)
              GROUP BY h),
            sym AS (
              SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und)
            SELECT CAST(COUNT(*) AS BIGINT) AS m,
                   CAST(SUM(dx.deg) AS BIGINT) AS sum_x,
                   CAST(SUM(dy.deg) AS BIGINT) AS sum_y,
                   CAST(SUM(dx.deg * dy.deg) AS BIGINT) AS sum_xy,
                   CAST(SUM(dx.deg * dx.deg) AS BIGINT) AS sum_x2,
                   CAST(SUM(dy.deg * dy.deg) AS BIGINT) AS sum_y2
            FROM sym s
            JOIN deg dx ON dx.h = s.a
            JOIN deg dy ON dy.h = s.b
        """,
        "host_triangles": """
            WITH u AS (
              SELECT source || '.test' AS host, CAST(doc_id AS VARCHAR) AS did
              FROM documents),
            hosts AS (SELECT DISTINCT host FROM u),
            cnt AS (SELECT COUNT(*) AS n_hosts FROM hosts),
            idx AS (
              SELECT host, ROW_NUMBER() OVER (ORDER BY host) - 1 AS host_idx
              FROM hosts),
            raw AS (
              SELECT u.host AS src_host,
                     ('0x' || substr(md5(u.did || ':' || CAST(k AS VARCHAR)), 1, 15))::BIGINT
                       % (SELECT n_hosts FROM cnt) AS dst_idx
              FROM u, UNNEST([0, 1, 2]) AS t(k)),
            e0 AS (
              SELECT DISTINCT r.src_host, i.host AS dst_host
              FROM raw r JOIN idx i ON r.dst_idx = i.host_idx
              WHERE r.src_host <> i.host),
            und AS (
              SELECT DISTINCT LEAST(src_host, dst_host) AS a,
                              GREATEST(src_host, dst_host) AS b
              FROM e0),
            deg AS (
              SELECT h, CAST(COUNT(*) AS BIGINT) AS deg
              FROM (SELECT a AS h FROM und UNION ALL SELECT b AS h FROM und)
              GROUP BY h),
            tri AS (
              SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM und e1
              JOIN und e2 ON e2.a = e1.b
              JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
            corners AS (
              SELECT h, CAST(COUNT(*) AS BIGINT) AS n_triangles
              FROM (SELECT x AS h FROM tri UNION ALL SELECT y AS h FROM tri
                    UNION ALL SELECT z AS h FROM tri)
              GROUP BY h)
            SELECT hs.host,
                   CAST(COALESCE(d.deg, 0) AS BIGINT) AS degree,
                   CAST(COALESCE(c.n_triangles, 0) AS BIGINT) AS n_triangles,
                   CAST(CASE WHEN COALESCE(d.deg, 0) >= 2 THEN
                          2 * COALESCE(c.n_triangles, 0) * 1000000
                          // (COALESCE(d.deg, 0) * (COALESCE(d.deg, 0) - 1))
                        ELSE 0 END AS BIGINT) AS clustering_ppm
            FROM hosts hs
            LEFT JOIN deg d ON d.h = hs.host
            LEFT JOIN corners c ON c.h = hs.host
        """,
        "host_walks": _host_walks_oracle(4, 2),
        "host_coreness": _host_coreness_oracle(4),
        "snm_pairs": r"""
            WITH k AS (
              SELECT doc_id AS id,
                     substr(lower(trim(text)), 1, 8) AS k,
                     substr(lower(trim(text)), 1, 2) AS blk
              FROM documents),
            l AS (
              SELECT id,
                     LEAD(id, 1) OVER w AS l1,
                     LEAD(id, 2) OVER w AS l2,
                     LEAD(id, 3) OVER w AS l3
              FROM k WINDOW w AS (PARTITION BY blk ORDER BY k, id))
            SELECT DISTINCT id AS id_a, u AS id_b
            FROM l, UNNEST([l1, l2, l3]) AS t(u)
            WHERE u IS NOT NULL
        """,
        "section_filter": r"""
            WITH toks AS (
              SELECT doc_id,
                     string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS t
              FROM documents),
            sp AS (
              SELECT doc_id, CAST(i - 1 AS INT) AS off,
                     CASE WHEN (i - 1) % 7 = 5 THEN 'headline'
                          WHEN (i - 1) % 7 = 2 THEN 'image' ELSE 'text' END AS kind,
                     t[i] AS tok
              FROM toks, UNNEST(range(1, len(t) + 1)) AS u(i)),
            assigned AS (
              SELECT doc_id, off, kind,
                     CASE WHEN kind = 'image' THEN NULL ELSE tok END AS text,
                     COALESCE(LAST_VALUE(CASE WHEN kind = 'headline' THEN off END IGNORE NULLS)
                       OVER (PARTITION BY doc_id ORDER BY off
                             ROWS UNBOUNDED PRECEDING), -1) AS sec_offset
              FROM sp),
            stats AS (
              SELECT doc_id, sec_offset,
                     SUM(CASE WHEN kind = 'text' THEN 1 ELSE 0 END) AS n_text,
                     SUM(CASE WHEN kind = 'text' THEN length(COALESCE(text, '')) ELSE 0 END) AS n_chars
              FROM assigned GROUP BY doc_id, sec_offset),
            verd AS (
              SELECT doc_id, sec_offset,
                     (n_text >= 5 AND n_chars >= 25) AS keep
              FROM stats),
            totals AS (
              SELECT doc_id,
                     CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS kept,
                     CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS dropped
              FROM verd GROUP BY doc_id),
            texts AS (
              SELECT a.doc_id, string_agg(a.text, ' ' ORDER BY a.off) AS text_kept
              FROM assigned a
              JOIN verd v ON v.doc_id = a.doc_id
                AND v.sec_offset = a.sec_offset AND v.keep
              WHERE a.kind <> 'image' AND a.text IS NOT NULL
              GROUP BY a.doc_id)
            SELECT d.doc_id,
                   COALESCE(t.kept, 0) AS n_sections_kept,
                   COALESCE(t.dropped, 0) AS n_sections_dropped,
                   COALESCE(x.text_kept, '') AS text_kept
            FROM documents d
            LEFT JOIN totals t ON t.doc_id = d.doc_id
            LEFT JOIN texts x ON x.doc_id = d.doc_id
        """,
        "component_histogram": r"""
            WITH RECURSIVE u AS (
              SELECT source || '.test' AS host, CAST(doc_id AS VARCHAR) AS did
              FROM documents WHERE doc_id % 37 = 0),
            hosts AS (SELECT DISTINCT source || '.test' AS host FROM documents),
            cnt AS (SELECT COUNT(*) AS n_hosts FROM hosts),
            idx AS (
              SELECT host, ROW_NUMBER() OVER (ORDER BY host) - 1 AS host_idx
              FROM hosts),
            raw AS (
              SELECT u.host AS src_host,
                     ('0x' || substr(md5(u.did || ':' || CAST(k AS VARCHAR)), 1, 15))::BIGINT
                       % (SELECT n_hosts FROM cnt) AS dst_idx
              FROM u, UNNEST([0]) AS t(k)),
            e0 AS (
              SELECT DISTINCT r.src_host AS src, i.host AS dst
              FROM raw r JOIN idx i ON r.dst_idx = i.host_idx
              WHERE r.src_host <> i.host),
            edges AS (
              SELECT src, dst FROM e0
              UNION
              SELECT dst, src FROM e0),
            reach(src, dst) AS (
              SELECT src, dst FROM edges
              UNION
              SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
              WHERE r.src <> e.dst),
            comp AS (
              SELECT src AS host, LEAST(src, MIN(dst)) AS component
              FROM reach GROUP BY src),
            sizes AS (
              SELECT component, CAST(COUNT(*) AS BIGINT) AS sz
              FROM comp GROUP BY component)
            SELECT CAST(length(bin(sz)) AS BIGINT) AS bucket_bits,
                   CAST(COUNT(*) AS BIGINT) AS n_components,
                   CAST(SUM(sz) AS BIGINT) AS n_nodes
            FROM sizes GROUP BY 1
        """,
        "minhash_calibration": r"""
            WITH toks AS (
              SELECT doc_id,
                     string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS t
              FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, s
              FROM toks,
                   UNNEST(list_transform(range(1, GREATEST(len(t) - 2, 0) + 1),
                                         i -> array_to_string(t[i:i+2], ' '))) AS u(s)
              WHERE len(t) >= 3),
            seeds AS (SELECT UNNEST(range(0, 8)) AS seed),
            sig AS (
              SELECT doc_id, seed,
                     MIN(substr(md5(CAST(seed AS VARCHAR) || '|' || s), 1, 15)) AS mh
              FROM sh, seeds GROUP BY doc_id, seed),
            bands AS (
              SELECT doc_id, CAST(seed // 2 AS INT) AS band_idx,
                     string_agg(mh, ',' ORDER BY seed) AS band_key
              FROM sig GROUP BY doc_id, band_idx),
            pairs AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM bands a JOIN bands b USING (band_idx, band_key)
              WHERE a.doc_id < b.doc_id),
            agree AS (
              SELECT p.id_a, p.id_b,
                     CAST(SUM(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
              FROM pairs p
              JOIN sig a ON a.doc_id = p.id_a
              JOIN sig b ON b.doc_id = p.id_b AND b.seed = a.seed
              GROUP BY p.id_a, p.id_b),
            sizes AS (
              SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT p.id_a, p.id_b, CAST(COUNT(*) AS BIGINT) AS n_inter
              FROM pairs p
              JOIN sh a ON a.doc_id = p.id_a
              JOIN sh b ON b.doc_id = p.id_b AND b.s = a.s
              GROUP BY p.id_a, p.id_b)
            SELECT p.id_a, p.id_b, g.n_agree,
                   CAST(g.n_agree * 1000000 // 8 AS BIGINT) AS est_ppm,
                   CAST(CASE WHEN sa.n + sb.n - COALESCE(i.n_inter, 0) > 0
                        THEN COALESCE(i.n_inter, 0) * 1000000
                             // (sa.n + sb.n - COALESCE(i.n_inter, 0))
                        ELSE 0 END AS BIGINT) AS exact_ppm
            FROM pairs p
            JOIN agree g ON g.id_a = p.id_a AND g.id_b = p.id_b
            JOIN sizes sa ON sa.doc_id = p.id_a
            JOIN sizes sb ON sb.doc_id = p.id_b
            LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
        """,
        "host_novelty": r"""
            WITH toks AS (
              SELECT doc_id, source || '.test' AS host,
                     string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS t
              FROM documents),
            sh AS (
              SELECT doc_id, host, s
              FROM toks,
                   UNNEST(list_transform(range(1, GREATEST(len(t) - 2, 0) + 1),
                                         i -> array_to_string(t[i:i+2], ' '))) AS u(s)
              WHERE len(t) >= 3),
            new_sh AS (
              SELECT DISTINCT host, s FROM sh WHERE doc_id % 4 = 0),
            corpus_sh AS (
              SELECT DISTINCT s FROM sh WHERE doc_id % 4 <> 0),
            fresh AS (
              SELECT n.host, n.s FROM new_sh n
              LEFT JOIN corpus_sh c ON c.s = n.s
              WHERE c.s IS NULL),
            totals AS (
              SELECT host, CAST(COUNT(*) AS BIGINT) AS n_shingles
              FROM new_sh GROUP BY host),
            news AS (
              SELECT host, CAST(COUNT(*) AS BIGINT) AS new_shingles
              FROM fresh GROUP BY host)
            SELECT t.host, t.n_shingles,
                   COALESCE(n.new_shingles, 0) AS new_shingles,
                   CAST(COALESCE(n.new_shingles, 0) * 1000000 // t.n_shingles
                        AS BIGINT) AS novelty_ppm
            FROM totals t LEFT JOIN news n ON n.host = t.host
        """,
        "benford_events": r"""
            WITH nums AS (
              SELECT event_type AS grp, UNNEST(regexp_extract_all(props, '[0-9]+')) AS num
              FROM events),
            digs AS (
              SELECT grp, substr(regexp_replace(num, '^0+', ''), 1, 1) AS d
              FROM nums
              WHERE substr(regexp_replace(num, '^0+', ''), 1, 1) <> ''),
            counts AS (
              SELECT grp, d, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM digs GROUP BY grp, d),
            totals AS (
              SELECT grp, CAST(SUM(cnt) AS BIGINT) AS n_numbers
              FROM counts GROUP BY grp),
            benford(d, benford_ppm) AS (
              VALUES ('1', 301029), ('2', 176091), ('3', 124938),
                     ('4', 96910), ('5', 79181), ('6', 66946),
                     ('7', 57991), ('8', 51152), ('9', 45757)),
            grid AS (
              SELECT t.grp, t.n_numbers, b.d, CAST(b.benford_ppm AS BIGINT) AS benford_ppm
              FROM totals t CROSS JOIN benford b)
            SELECT g.grp AS event_type,
                   CAST(MAX(g.n_numbers) AS BIGINT) AS n_numbers,
                   CAST(SUM(ABS(COALESCE(c.cnt, 0) * 1000000 // g.n_numbers
                                - g.benford_ppm)) AS BIGINT) AS tvd_ppm
            FROM grid g LEFT JOIN counts c ON c.grp = g.grp AND c.d = g.d
            GROUP BY g.grp
        """,
        "lsh_incremental_probe": r"""
            WITH toks AS (
              SELECT doc_id,
                     string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS t
              FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, s
              FROM toks,
                   UNNEST(list_transform(range(1, GREATEST(len(t) - 2, 0) + 1),
                                         i -> array_to_string(t[i:i+2], ' '))) AS u(s)
              WHERE len(t) >= 3),
            seeds AS (SELECT UNNEST(range(0, 8)) AS seed),
            sig AS (
              SELECT doc_id, seed,
                     MIN(substr(md5(CAST(seed AS VARCHAR) || '|' || s), 1, 15)) AS mh
              FROM sh, seeds GROUP BY doc_id, seed),
            bands AS (
              SELECT doc_id, CAST(seed // 2 AS INT) AS band_idx,
                     string_agg(mh, ',' ORDER BY seed) AS band_key
              FROM sig GROUP BY doc_id, band_idx)
            SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
            FROM bands n JOIN bands c USING (band_idx, band_key)
            WHERE n.doc_id % 5 = 0 AND c.doc_id % 5 <> 0
        """,
        "strand_pairs": r"""
            WITH urls AS (
              SELECT 'https://' || source || '.test/' || lang || '/page/'
                       || CAST(doc_id % 37 AS VARCHAR) AS url
              FROM documents),
            marked AS (
              SELECT url,
                     regexp_extract(url, '/(en|zh|es|de|fr)/', 1) AS lang,
                     regexp_replace(url, '/(en|zh|es|de|fr)/', '/{L}/', 'g') AS template
              FROM urls
              WHERE regexp_extract(url, '/(en|zh|es|de|fr)/', 1) <> ''),
            reps AS (
              SELECT template, lang, MIN(url) AS url
              FROM marked GROUP BY template, lang)
            SELECT a.template,
                   a.lang AS lang_a, a.url AS url_a,
                   b.lang AS lang_b, b.url AS url_b
            FROM reps a JOIN reps b
              ON b.template = a.template AND a.lang < b.lang
        """,
        "readability": r"""
            WITH base AS (
              SELECT doc_id,
                     GREATEST(1, len(regexp_extract_all(text, '[.!?]+'))) AS n_sentences,
                     string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS t
              FROM documents),
            pw AS (
              SELECT doc_id,
                     CAST(COUNT(*) AS BIGINT) AS n_words,
                     CAST(SUM(GREATEST(1, len(regexp_extract_all(t[i], '[aeiouy]+')))) AS BIGINT) AS n_syllables
              FROM base, UNNEST(range(1, len(t) + 1)) AS u(i)
              WHERE t[i] <> ''
              GROUP BY doc_id)
            SELECT b.doc_id,
                   COALESCE(p.n_words, 0) AS n_words,
                   CAST(b.n_sentences AS BIGINT) AS n_sentences,
                   COALESCE(p.n_syllables, 0) AS n_syllables,
                   CAST(CASE WHEN COALESCE(p.n_words, 0) = 0 THEN 0
                        ELSE 39 * p.n_words // b.n_sentences
                             + 1180 * p.n_syllables // p.n_words - 1559
                        END AS BIGINT) AS grade_centi
            FROM base b LEFT JOIN pw p ON p.doc_id = b.doc_id
        """,
        "quality_classifier": _CLF_SCORED_CTE + r"""
            SELECT d.doc_id,
                   COALESCE(s.n_feats, 0) AS n_feats,
                   COALESCE(s.score_fp, 0) AS score_fp,
                   CASE WHEN s.doc_id IS NULL THEN FALSE
                        ELSE s.score_fp >= 50 * s.n_feats END AS keep
            FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id
        """,
        "doc_sections": r"""
            WITH toks AS (
              SELECT doc_id,
                     string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS t
              FROM documents),
            sp AS (
              SELECT doc_id, CAST(i - 1 AS INT) AS off,
                     CASE WHEN (i - 1) % 7 = 5 THEN 'headline'
                          WHEN (i - 1) % 7 = 2 THEN 'image' ELSE 'text' END AS kind,
                     t[i] AS tok
              FROM toks, UNNEST(range(1, len(t) + 1)) AS u(i)),
            assigned AS (
              SELECT doc_id, off, kind,
                     CASE WHEN kind = 'image' THEN NULL ELSE tok END AS text,
                     COALESCE(LAST_VALUE(CASE WHEN kind = 'headline' THEN off END IGNORE NULLS)
                       OVER (PARTITION BY doc_id ORDER BY off
                             ROWS UNBOUNDED PRECEDING), -1) AS sec_offset,
                     COALESCE(LAST_VALUE(CASE WHEN kind = 'headline' THEN tok END IGNORE NULLS)
                       OVER (PARTITION BY doc_id ORDER BY off
                             ROWS UNBOUNDED PRECEDING), '') AS sec_title
              FROM sp)
            SELECT doc_id, sec_offset, MAX(sec_title) AS sec_title,
                   CAST(COUNT(*) AS BIGINT) AS n_spans,
                   CAST(SUM(CASE WHEN kind = 'text' THEN 1 ELSE 0 END) AS BIGINT) AS n_text,
                   CAST(SUM(CASE WHEN kind = 'image' THEN 1 ELSE 0 END) AS BIGINT) AS n_images,
                   CAST(SUM(CASE WHEN kind = 'text' THEN length(COALESCE(text, '')) ELSE 0 END) AS BIGINT) AS n_chars
            FROM assigned GROUP BY doc_id, sec_offset
        """,
        "media_captions": r"""
            WITH toks AS (
              SELECT doc_id,
                     string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS t
              FROM documents),
            sp AS (
              SELECT doc_id, i,
                     CASE WHEN i % 5 = 1 THEN 'image' ELSE 'text' END AS kind,
                     t[i] AS tok
              FROM toks, UNNEST(range(1, len(t) + 1)) AS u(i)),
            media AS (
              SELECT doc_id, CAST(i - 1 AS INT) AS media_pos,
                     'img://' || substr(md5(tok), 1, 8) || '.jpg' AS media_ref,
                     CAST(i * 7 AS BIGINT) AS m_off
              FROM sp WHERE kind = 'image'),
            texts AS (
              SELECT doc_id, CAST(i - 1 AS BIGINT) AS t_pos, tok AS caption,
                     CAST(i * 7 AS BIGINT) AS t_off
              FROM sp WHERE kind = 'text' AND trim(tok) <> ''),
            cand AS (
              SELECT m.doc_id, m.media_pos, m.media_ref, t.caption,
                     abs(m.m_off - t.t_off) * 1048576::BIGINT + t.t_pos AS key
              FROM media m JOIN texts t USING (doc_id)),
            best AS (
              SELECT doc_id, media_pos, MIN(key) AS key
              FROM cand GROUP BY 1, 2)
            SELECT c.doc_id, c.media_pos, c.media_ref, c.caption,
                   CAST(c.key // 1048576 AS BIGINT) AS gap
            FROM cand c JOIN best USING (doc_id, media_pos, key)
        """,
        # overlap predicate join directly (DuckDB is fine with the
        # quadratic form at oracle scale); the Spark side must produce
        # the identical set through the bucket decomposition
        "orders_transit_weeks": """
            WITH se AS (
              SELECT l_orderkey, MAX(l_shipdate) AS ship_end
              FROM lineitem GROUP BY l_orderkey),
            spans AS (
              SELECT CAST(o_totalprice AS DECIMAL(18,6)) AS oprice,
                     date_diff('day', DATE '1970-01-01',
                               CAST(o_orderdate AS DATE)) AS o_start,
                     date_diff('day', DATE '1970-01-01',
                               CAST(ship_end AS DATE)) AS o_end
              FROM orders JOIN se ON o_orderkey = l_orderkey),
            valid AS (SELECT * FROM spans WHERE o_end >= o_start),
            g AS (SELECT MIN(o_start // 7) AS w0, MAX(o_end // 7) AS w1
                  FROM valid),
            weeks AS (
              SELECT wk * 7 AS w_start, wk * 7 + 6 AS w_end
              FROM g, UNNEST(range(g.w0, g.w1 + 1)) AS u(wk))
            SELECT CAST(w.w_start AS BIGINT) AS week_start_day,
                   CAST(COUNT(*) AS BIGINT) AS n_open_orders,
                   CAST(ROUND(SUM(s.oprice), 4) AS DOUBLE) AS open_value
            FROM valid s JOIN weeks w
              ON s.o_start <= w.w_end AND w.w_start <= s.o_end
            GROUP BY w.w_start
        """,
        # brute-force exact ed=1 self-join — the spec the blocked
        # symmetric-delete pipeline must reproduce in full (recall
        # completeness, not just precision)
        "typo_alias_pairs": """
            WITH u AS (
              SELECT DISTINCT c_name AS s FROM customer
              WHERE c_name IS NOT NULL)
            SELECT a.s AS a, b.s AS b, CAST(1 AS INT) AS dist
            FROM u a JOIN u b
              ON a.s < b.s AND levenshtein(a.s, b.s) = 1
        """,
        # textbook NOT EXISTS dominance — quadratic, oracle-only; the
        # Spark side must match it through the dim-window decomposition
        "skyline_parts": """
            WITH pc AS (
              SELECT p_partkey, p_size,
                     CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_c
              FROM part
              WHERE p_size IS NOT NULL AND p_retailprice IS NOT NULL)
            SELECT a.p_partkey, a.p_size, a.price_c
            FROM pc a
            WHERE NOT EXISTS (
              SELECT 1 FROM pc b
              WHERE b.p_size >= a.p_size AND b.price_c <= a.price_c
                AND (b.p_size > a.p_size OR b.price_c < a.price_c))
        """,
        "events_trimmed_stats": """
            WITH v AS (
              SELECT event_type, event_id,
                     CAST(ROUND(value * 100) AS BIGINT) AS vc
              FROM events),
            r AS (
              SELECT event_type, vc,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                                        ORDER BY vc, event_id) AS rn,
                     COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM v),
            kept AS (
              SELECT * FROM r WHERE rn > n // 10 AND rn <= n - n // 10)
            SELECT event_type,
                   CAST(n AS BIGINT) AS n_events,
                   CAST(COUNT(*) AS BIGINT) AS n_kept,
                   CAST(SUM(vc) AS BIGINT) AS trimmed_sum_c,
                   CAST((SUM(vc) * 10000) // COUNT(*) AS BIGINT)
                     AS trimmed_mean_micro,
                   CAST(MIN(vc) AS BIGINT) AS lo_c,
                   CAST(MAX(vc) AS BIGINT) AS hi_c
            FROM kept GROUP BY event_type, n
        """,
        # Poisson(1) inverse-CDF weights from the md5-ppm hash; rep -1
        # carries weight 1 (the point estimate). list indexing is
        # 1-based and out-of-range -> NULL, matching try_element_at.
        "events_bootstrap_ci": """
            WITH v AS (
              SELECT event_type,
                     CAST(event_id AS VARCHAR) AS id,
                     CAST(ROUND(value * 100) AS BIGINT) AS vc
              FROM events),
            reps AS (
              SELECT CAST(r.range AS BIGINT) AS rep FROM range(-1, 24) r),
            x AS (
              SELECT event_type, rep, vc,
                     ('0x' || substr(md5('boot1|' || CAST(rep AS VARCHAR)
                        || '|' || id), 1, 15))::BIGINT % 1000000 AS ppm
              FROM v CROSS JOIN reps),
            w AS (
              SELECT event_type, rep, vc,
                     CASE WHEN rep = -1 THEN 1
                          WHEN ppm < 367879 THEN 0
                          WHEN ppm < 735759 THEN 1
                          WHEN ppm < 919699 THEN 2
                          WHEN ppm < 981012 THEN 3
                          WHEN ppm < 996340 THEN 4
                          WHEN ppm < 999406 THEN 5
                          WHEN ppm < 999917 THEN 6
                          ELSE 7 END AS wt
              FROM x),
            m AS (
              SELECT event_type, rep,
                     CAST(SUM(wt) AS BIGINT) AS sw,
                     CAST(SUM(wt * vc) AS BIGINT) AS svc
              FROM w GROUP BY 1, 2
              HAVING CAST(SUM(wt) AS BIGINT) > 0),
            mm AS (
              SELECT event_type, rep, sw,
                     (svc * 10000) // sw AS mean_micro
              FROM m),
            agg AS (
              SELECT event_type,
                     MAX(CASE WHEN rep = -1 THEN sw END) AS n_events,
                     MAX(CASE WHEN rep = -1 THEN mean_micro END)
                       AS point_mean_micro,
                     list_sort(list(mean_micro)
                       FILTER (WHERE rep >= 0)) AS ms
              FROM mm GROUP BY 1)
            SELECT event_type,
                   CAST(n_events AS BIGINT) AS n_events,
                   CAST(point_mean_micro AS BIGINT) AS point_mean_micro,
                   CAST(len(ms) AS BIGINT) AS n_reps_used,
                   CAST(ms[2] AS BIGINT) AS boot_lo_micro,
                   CAST(ms[greatest(len(ms) - 1, 1)] AS BIGINT)
                     AS boot_hi_micro
            FROM agg
        """,
        # bootstrap median: same Poisson-weight construction as
        # events_bootstrap_ci (salt bootq1), each replicate's median =
        # exact weighted quantile (cross-multiplied threshold); the
        # running sum lives in its OWN CTE (DuckDB forbids nesting).
        "events_bootstrap_median": """
            WITH v AS (
              SELECT event_type,
                     CAST(event_id AS VARCHAR) AS id,
                     CAST(ROUND(value * 100) AS BIGINT) AS vc
              FROM events),
            reps AS (
              SELECT CAST(r.range AS BIGINT) AS rep FROM range(-1, 24) r),
            x AS (
              SELECT event_type, rep, vc,
                     ('0x' || substr(md5('bootq1|' || CAST(rep AS VARCHAR)
                        || '|' || id), 1, 15))::BIGINT % 1000000 AS ppm
              FROM v CROSS JOIN reps),
            w AS (
              SELECT event_type, rep, vc,
                     CASE WHEN rep = -1 THEN 1
                          WHEN ppm < 367879 THEN 0
                          WHEN ppm < 735759 THEN 1
                          WHEN ppm < 919699 THEN 2
                          WHEN ppm < 981012 THEN 3
                          WHEN ppm < 996340 THEN 4
                          WHEN ppm < 999406 THEN 5
                          WHEN ppm < 999917 THEN 6
                          ELSE 7 END AS wt
              FROM x),
            cells AS (
              SELECT event_type, rep, vc,
                     CAST(SUM(wt) AS BIGINT) AS wv
              FROM w GROUP BY 1, 2, 3
              HAVING CAST(SUM(wt) AS BIGINT) > 0),
            run AS (
              SELECT event_type, rep, vc,
                     SUM(wv) OVER (PARTITION BY event_type, rep
                                   ORDER BY vc) AS cumw,
                     SUM(wv) OVER (PARTITION BY event_type, rep) AS tot
              FROM cells),
            q AS (
              SELECT event_type, rep,
                     MIN(vc) AS qv, MAX(tot) AS tot
              FROM run WHERE cumw * 2 >= tot
              GROUP BY 1, 2),
            agg AS (
              SELECT event_type,
                     MAX(CASE WHEN rep = -1 THEN tot END) AS n_events,
                     MAX(CASE WHEN rep = -1 THEN qv END) AS point_q,
                     list_sort(list(qv) FILTER (WHERE rep >= 0)) AS qs
              FROM q GROUP BY 1)
            SELECT event_type,
                   CAST(n_events AS BIGINT) AS n_events,
                   CAST(point_q AS BIGINT) AS point_q,
                   CAST(len(qs) AS BIGINT) AS n_reps_used,
                   CAST(qs[2] AS BIGINT) AS boot_lo_q,
                   CAST(qs[greatest(len(qs) - 1, 1)] AS BIGINT)
                     AS boot_hi_q
            FROM agg
        """,
        # Luhn over md5-derived fixture runs: candidate index via the
        # generate_series unnest (duplicate candidates count twice,
        # like posexplode); regexp_replace needs the explicit 'g'.
        "pan_luhn_audit": r"""
            WITH base AS (
              SELECT doc_id,
                     lpad(CAST(('0x' || substr(md5('pan|'
                       || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                       % 10000000000000000 AS VARCHAR), 16, '0') AS p16,
                     lpad(CAST(('0x' || substr(md5('pan2|'
                       || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                       % 1000000000000000 AS VARCHAR), 15, '0') AS p15
              FROM documents),
            docs AS (
              SELECT doc_id,
                     'doc ' || CAST(doc_id AS VARCHAR) || ' pay '
                       || substr(p16, 1, 4) || '-' || substr(p16, 5, 4)
                       || '-' || substr(p16, 9, 4) || '-'
                       || substr(p16, 13, 4)
                       || ' ref 12345678 alt '
                       || substr(p15, 1, 4) || ' ' || substr(p15, 5, 6)
                       || ' ' || substr(p15, 11, 5) || ' end' AS text
              FROM base),
            c0 AS (
              SELECT doc_id,
                     regexp_extract_all(text,
                       '\b(?:\d[ -]?){12,18}\d\b') AS l
              FROM docs),
            c1 AS (
              SELECT doc_id, l,
                     unnest(generate_series(1, len(l))) AS ci
              FROM c0),
            c2 AS (
              SELECT doc_id, ci,
                     reverse(regexp_replace(l[ci], '[ -]', '', 'g')) AS rev
              FROM c1),
            c3 AS (
              SELECT * FROM c2
              WHERE length(rev) BETWEEN 13 AND 19),
            d1 AS (
              SELECT doc_id, ci, rev,
                     unnest(generate_series(1, length(rev))) AS p
              FROM c3),
            d2 AS (
              SELECT doc_id, ci, p,
                     CAST(substr(rev, p, 1) AS INT) AS dig
              FROM d1),
            s AS (
              SELECT doc_id, ci,
                     SUM(CASE WHEN p % 2 = 0
                              THEN CASE WHEN dig * 2 > 9 THEN dig * 2 - 9
                                        ELSE dig * 2 END
                              ELSE dig END) AS luhn_sum
              FROM d2 GROUP BY 1, 2)
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_pan_candidates,
                   CAST(SUM(CASE WHEN luhn_sum % 10 = 0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_pan_valid
            FROM s GROUP BY doc_id
        """,
        # integer chi-square in HUGEINT (the squared numerator passes
        # BIGINT at corpus scale; ** is float power in DuckDB — use d*d)
        "source_lang_chisq": _CHISQ_CELLS_SQL + """
            SELECT source, lang, observed, expected_micro,
                   chi2_cell_micro
            FROM chisq_cells
        """,
        "source_drift_scores": _CHISQ_CELLS_SQL + """
            SELECT source,
                   CAST(SUM(observed) AS BIGINT) AS row_total,
                   CAST(SUM(chi2_cell_micro) AS BIGINT) AS chi2_row_micro
            FROM chisq_cells GROUP BY source
        """,
        "vocab_source_jaccard": r"""
            WITH toks AS (
              SELECT DISTINCT source AS g, t.tok AS token
              FROM documents,
                   UNNEST(string_split(lower(regexp_replace(trim(text),
                          '\s+', ' ', 'g')), ' ')) AS t(tok)
              WHERE length(t.tok) >= 1),
            sizes AS (SELECT g, COUNT(*) AS n FROM toks GROUP BY g),
            inter AS (
              SELECT a.g AS ga, b.g AS gb, COUNT(*) AS ni
              FROM toks a JOIN toks b USING (token)
              WHERE a.g < b.g GROUP BY 1, 2)
            SELECT ga AS source_a, gb AS source_b,
                   CAST(sa.n AS BIGINT) AS n_types_a,
                   CAST(sb.n AS BIGINT) AS n_types_b,
                   CAST(ni AS BIGINT) AS n_common,
                   CAST(ni * 1000000 // (sa.n + sb.n - ni) AS BIGINT)
                     AS jaccard_ppm
            FROM inter
            JOIN sizes sa ON sa.g = ga
            JOIN sizes sb ON sb.g = gb
        """,
        "order_budget_lines": """
            WITH d AS (
              SELECT l_orderkey, l_linenumber,
                     CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS score_c,
                     CAST(l_quantity AS BIGINT) AS qty
              FROM lineitem WHERE CAST(l_quantity AS BIGINT) > 0),
            r AS (
              SELECT *, CASE WHEN score_c < 0
                        THEN -((-score_c * 1048576) // qty)
                        ELSE (score_c * 1048576) // qty END AS ratio
              FROM d),
            w AS (
              SELECT *,
                     CAST(SUM(qty) OVER (PARTITION BY l_orderkey
                          ORDER BY ratio DESC, l_linenumber ASC
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cost,
                     CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
                          ORDER BY ratio DESC, l_linenumber ASC)
                          AS BIGINT) AS pick_rank
              FROM r)
            SELECT l_orderkey, l_linenumber, score_c, qty,
                   CAST(ratio AS BIGINT) AS ratio, cum_cost, pick_rank
            FROM w WHERE cum_cost <= 60
        """,
        "source_lang_gini": """
            WITH facts AS (
              SELECT source AS g, lang AS l FROM documents
              WHERE source IS NOT NULL AND lang IS NOT NULL),
            cells AS (SELECT g, l, COUNT(*) AS o FROM facts GROUP BY g, l),
            agg AS (
              SELECT g, SUM(o) AS n, SUM(o * o) AS sq,
                     COUNT(*) AS n_labels
              FROM cells GROUP BY g)
            SELECT g AS source,
                   CAST(n AS BIGINT) AS n_rows,
                   CAST(n_labels AS BIGINT) AS n_labels,
                   CAST(1000000 - (sq * 1000000) // (n * n) AS BIGINT)
                     AS gini_ppm
            FROM agg
        """,
        "rank_rbo_events": _rbo_oracle(),
        # exact Mann-Whitney (midranks via 2x scaling) + KS over the
        # (group, value) cell table — HUGEINT for the ppm scalings
        "events_value_drift": """
            WITH f AS (
              SELECT event_type AS g,
                     (date_part('day', ts) <= 15) AS a,
                     CAST(ROUND(value * 100) AS BIGINT) AS v
              FROM events
              WHERE event_type IS NOT NULL AND ts IS NOT NULL
                AND value IS NOT NULL),
            cells AS (
              SELECT g, v,
                     SUM(CASE WHEN a THEN 1 ELSE 0 END) AS ca_v,
                     SUM(CASE WHEN a THEN 0 ELSE 1 END) AS cb_v
              FROM f GROUP BY g, v),
            run AS (
              SELECT g, v, ca_v, cb_v,
                     SUM(ca_v + cb_v) OVER (PARTITION BY g ORDER BY v)
                       AS c_incl,
                     SUM(ca_v) OVER (PARTITION BY g ORDER BY v) AS ca_incl,
                     SUM(cb_v) OVER (PARTITION BY g ORDER BY v) AS cb_incl,
                     SUM(ca_v) OVER (PARTITION BY g) AS n_a,
                     SUM(cb_v) OVER (PARTITION BY g) AS n_b
              FROM cells),
            per_g AS (
              SELECT g, n_a, n_b,
                     SUM(ca_v * (2 * c_incl - ca_v - cb_v + 1))
                       AS ranksum2_a,
                     MAX(ABS(ca_incl * n_b - cb_incl * n_a)) AS ks_num,
                     SUM(ABS(ca_v * n_b - cb_v * n_a)) AS tv_num
              FROM run GROUP BY g, n_a, n_b)
            SELECT g AS event_type,
                   CAST(n_a AS BIGINT) AS n_a,
                   CAST(n_b AS BIGINT) AS n_b,
                   CAST(ranksum2_a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
                   CAST(CAST(ranksum2_a - n_a * (n_a + 1) AS HUGEINT)
                        * 1000000 // (2 * CAST(n_a AS HUGEINT) * n_b)
                        AS BIGINT) AS auc_ppm,
                   CAST(ks_num AS BIGINT) AS ks_num,
                   CAST(CAST(ks_num AS HUGEINT) * 1000000
                        // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
                     AS ks_ppm,
                   CAST(tv_num AS BIGINT) AS tv_num,
                   CAST(CAST(tv_num AS HUGEINT) * 1000000
                        // (2 * CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
                     AS tv_ppm
            FROM per_g WHERE n_a > 0 AND n_b > 0
        """,
        # the window-derived dev is materialized in its own CTE before
        # the pick window (DuckDB forbids nested window calls)
        "events_cusum_day": """
            WITH f AS (
              SELECT event_type AS g, date_trunc('day', ts) AS t
              FROM events
              WHERE event_type IS NOT NULL AND ts IS NOT NULL),
            ticks AS (SELECT g, t, COUNT(*) AS y FROM f GROUP BY g, t),
            run AS (
              SELECT g, t,
                     ROW_NUMBER() OVER (PARTITION BY g ORDER BY t) AS j,
                     SUM(y) OVER (PARTITION BY g ORDER BY t) AS s,
                     COUNT(*) OVER (PARTITION BY g) AS m,
                     SUM(y) OVER (PARTITION BY g) AS tot
              FROM ticks),
            dev AS (SELECT *, ABS(s * m - j * tot) AS dv FROM run),
            pick AS (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY g
                          ORDER BY dv DESC, t ASC) AS pk
              FROM dev)
            SELECT g AS event_type,
                   CAST(m AS BIGINT) AS n_ticks,
                   CAST(tot AS BIGINT) AS total_rows,
                   t AS change_tick,
                   CAST(dv AS BIGINT) AS cusum_num,
                   CAST(CAST(dv AS HUGEINT) * 1000000
                        // (CAST(tot AS HUGEINT) * m) AS BIGINT)
                     AS cusum_ppm
            FROM pick WHERE pk = 1
        """,
        "docs_k_anonymity": """
            WITH sizes AS (
              SELECT COUNT(*) AS sz FROM documents
              GROUP BY source, lang, n_chars // 1000),
            fan AS (
              SELECT sz, k FROM sizes
              CROSS JOIN (VALUES (2), (5), (10)) AS u(k))
            SELECT CAST(k AS BIGINT) AS k,
                   CAST(COUNT(*) AS BIGINT) AS n_groups,
                   CAST(SUM(sz) AS BIGINT) AS n_rows,
                   CAST(SUM(CASE WHEN sz < k THEN 1 ELSE 0 END) AS BIGINT)
                     AS groups_below,
                   CAST(SUM(CASE WHEN sz < k THEN sz ELSE 0 END) AS BIGINT)
                     AS rows_at_risk,
                   CAST(MIN(sz) AS BIGINT) AS min_class_size
            FROM fan GROUP BY k
        """,
        # naive textbook mirror: rank every user globally (tiny at
        # oracle sf) vs the engine's count-histogram block form
        "events_user_lorenz": """
            WITH c AS (
              SELECT user_id, COUNT(*) AS x FROM events
              WHERE user_id IS NOT NULL GROUP BY user_id),
            r AS (
              SELECT x,
                     ROW_NUMBER() OVER (ORDER BY x, user_id) AS rn,
                     SUM(x) OVER (ORDER BY x, user_id
                                  ROWS UNBOUNDED PRECEDING) AS cum,
                     COUNT(*) OVER () AS n_units,
                     SUM(x) OVER () AS tot
              FROM c),
            d AS (
              SELECT k.decile,
                     (k.decile * t.n_units) // 10 AS r,
                     t.n_units, t.tot
              FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9),(10))
                     AS k(decile)
              CROSS JOIN (SELECT n_units, tot FROM r LIMIT 1) t)
            SELECT CAST(d.decile AS BIGINT) AS decile,
                   CAST(d.r AS BIGINT) AS unit_rank,
                   CAST(d.n_units AS BIGINT) AS n_units,
                   CAST(COALESCE(r.cum, 0) AS BIGINT) AS cum_rows,
                   CAST(COALESCE(CAST(r.cum AS HUGEINT) * 1000000
                                 // d.tot, 0) AS BIGINT) AS cum_share_ppm
            FROM d LEFT JOIN r ON r.rn = d.r
        """,
        "events_user_gini": """
            WITH c AS (
              SELECT user_id, COUNT(*) AS x FROM events
              WHERE user_id IS NOT NULL GROUP BY user_id),
            r AS (
              SELECT x,
                     ROW_NUMBER() OVER (ORDER BY x, user_id) AS i,
                     COUNT(*) OVER () AS n,
                     SUM(x) OVER () AS tot
              FROM c)
            SELECT CAST(n AS BIGINT) AS n_units,
                   CAST(tot AS BIGINT) AS tot_rows,
                   CAST((2 * SUM(CAST(i AS HUGEINT) * x)
                         - (CAST(n AS HUGEINT) + 1) * tot) * 1000000
                        // (CAST(n AS HUGEINT) * tot) AS BIGINT)
                     AS gini_ppm
            FROM r GROUP BY n, tot
        """,
        # sign-symmetric tau: route the // through ABS on both engines
        # (DuckDB // floors, Spark div truncates — they differ below 0)
        "events_mk_trend": """
            WITH f AS (
              SELECT event_type AS g, date_trunc('day', ts) AS t
              FROM events
              WHERE event_type IS NOT NULL AND ts IS NOT NULL),
            ticks AS (SELECT g, t, COUNT(*) AS y FROM f GROUP BY g, t),
            p AS (
              SELECT a.g,
                     CAST(SIGN(b.y - a.y) AS BIGINT) AS s,
                     CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS tie
              FROM ticks a JOIN ticks b ON a.g = b.g AND a.t < b.t),
            per AS (
              SELECT g, SUM(s) AS s_num, COUNT(*) AS n_pairs,
                     SUM(tie) AS n_tie_pairs
              FROM p GROUP BY g),
            m AS (SELECT g, COUNT(*) AS n_ticks FROM ticks GROUP BY g)
            SELECT per.g AS event_type,
                   CAST(n_ticks AS BIGINT) AS n_ticks,
                   CAST(s_num AS BIGINT) AS s_num,
                   CAST(n_pairs AS BIGINT) AS n_pairs,
                   CAST(n_tie_pairs AS BIGINT) AS n_tie_pairs,
                   CAST(CASE WHEN s_num < 0
                        THEN -(CAST(-s_num AS HUGEINT) * 1000000
                               // n_pairs)
                        ELSE CAST(s_num AS HUGEINT) * 1000000 // n_pairs
                        END AS BIGINT) AS tau_ppm
            FROM per JOIN m ON per.g = m.g
        """,
        "events_daily_ols": """
            WITH f AS (
              SELECT event_type AS g, date_trunc('day', ts) AS t
              FROM events
              WHERE event_type IS NOT NULL AND ts IS NOT NULL),
            ticks AS (SELECT g, t, COUNT(*) AS y FROM f GROUP BY g, t),
            xy AS (
              SELECT g, y,
                     ROW_NUMBER() OVER (PARTITION BY g ORDER BY t) AS x
              FROM ticks),
            agg AS (
              SELECT g, COUNT(*) AS m, SUM(x) AS sx, SUM(y) AS sy,
                     SUM(x * y) AS sxy, SUM(x * x) AS sxx
              FROM xy GROUP BY g),
            d AS (
              SELECT g, m, sy,
                     m * sxy - sx * sy AS slope_num,
                     m * sxx - sx * sx AS slope_den
              FROM agg WHERE m >= 2)
            SELECT g AS event_type,
                   CAST(m AS BIGINT) AS n_ticks,
                   CAST(sy AS BIGINT) AS total_rows,
                   CAST(slope_num AS BIGINT) AS slope_num,
                   CAST(slope_den AS BIGINT) AS slope_den,
                   CAST(CASE WHEN slope_num < 0
                        THEN -(CAST(-slope_num AS HUGEINT) * 1000000
                               // slope_den)
                        ELSE CAST(slope_num AS HUGEINT) * 1000000
                             // slope_den
                        END AS BIGINT) AS slope_micro
            FROM d
        """,
        "events_ks_drift": """
            WITH vals AS (
              SELECT event_type AS g,
                     CAST(round(value * 100) AS BIGINT) AS v,
                     CASE WHEN date_diff('day', DATE '1970-01-01',
                                         CAST(ts AS DATE)) % 7 IN (2, 3)
                          THEN 1 ELSE 0 END AS side
              FROM events
              WHERE event_type IS NOT NULL AND value IS NOT NULL
                AND ts IS NOT NULL),
            cnt AS (
              SELECT g, v,
                     SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS a_cnt,
                     SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS b_cnt
              FROM vals GROUP BY g, v),
            cum AS (
              SELECT g, v,
                     SUM(a_cnt) OVER (PARTITION BY g ORDER BY v
                                      ROWS UNBOUNDED PRECEDING) AS cum_a,
                     SUM(b_cnt) OVER (PARTITION BY g ORDER BY v
                                      ROWS UNBOUNDED PRECEDING) AS cum_b
              FROM cnt),
            tot AS (
              SELECT g, CAST(SUM(a_cnt) AS BIGINT) AS n_a,
                     CAST(SUM(b_cnt) AS BIGINT) AS n_b
              FROM cnt GROUP BY g
              HAVING SUM(a_cnt) > 0 AND SUM(b_cnt) > 0),
            d AS (
              SELECT c.g, c.v, t.n_a, t.n_b,
                     ABS(CAST(c.cum_a AS HUGEINT) * t.n_b
                         - CAST(c.cum_b AS HUGEINT) * t.n_a) AS dnum
              FROM cum c JOIN tot t ON c.g = t.g),
            mx AS (SELECT g, MAX(dnum) AS dmax FROM d GROUP BY g)
            SELECT d.g AS event_type,
                   CAST(MAX(d.n_a) AS BIGINT) AS n_a,
                   CAST(MAX(d.n_b) AS BIGINT) AS n_b,
                   CAST(MAX(d.dnum) * 1000000
                        // (CAST(MAX(d.n_a) AS HUGEINT) * MAX(d.n_b))
                        AS BIGINT) AS ks_ppm,
                   CAST(MIN(d.v) AS BIGINT) AS ks_at
            FROM d JOIN mx ON d.g = mx.g AND d.dnum = mx.dmax
            GROUP BY d.g
        """,
        "host_status_scd2": """
            WITH daily AS (
              SELECT user_id % 50 AS k,
                     date_diff('day', DATE '1970-01-01',
                               CAST(ts AS DATE)) AS t,
                     CAST(COUNT(*) AS BIGINT) AS y
              FROM events
              WHERE user_id IS NOT NULL AND ts IS NOT NULL
              GROUP BY 1, 2),
            obs AS (
              SELECT k, t,
                     CASE WHEN y < 5 THEN 'low'
                          WHEN y < 9 THEN 'mid'
                          ELSE 'high' END AS a
              FROM daily),
            lagged AS (
              SELECT k, t, a,
                     LAG(a) OVER (PARTITION BY k ORDER BY t) AS prev_a,
                     ROW_NUMBER() OVER (PARTITION BY k ORDER BY t) AS rn
              FROM obs),
            flagged AS (
              SELECT k, t, a,
                     CASE WHEN rn = 1 OR prev_a IS DISTINCT FROM a
                          THEN 1 ELSE 0 END AS chg
              FROM lagged),
            runs AS (
              SELECT k, t, a,
                     SUM(chg) OVER (PARTITION BY k ORDER BY t
                                    ROWS UNBOUNDED PRECEDING) AS version
              FROM flagged),
            per_run AS (
              SELECT k, version, a,
                     MIN(t) AS valid_from, MAX(t) AS valid_to,
                     CAST(COUNT(*) AS BIGINT) AS n_obs
              FROM runs GROUP BY k, version, a),
            newest AS (
              SELECT k, MAX(valid_to) AS max_to FROM per_run GROUP BY k)
            SELECT p.k AS host_id,
                   CAST(p.version AS BIGINT) AS version,
                   p.a AS volume_class,
                   CAST(p.valid_from AS BIGINT) AS valid_from,
                   CAST(p.valid_to AS BIGINT) AS valid_to,
                   p.n_obs AS n_obs,
                   CAST(CASE WHEN p.valid_to = n.max_to THEN 1 ELSE 0
                        END AS INT) AS is_current
            FROM per_run p JOIN newest n ON p.k = n.k
        """,
        "events_scd2_asof": """
            WITH daily AS (
              SELECT user_id % 50 AS k,
                     date_diff('day', DATE '1970-01-01',
                               CAST(ts AS DATE)) AS t,
                     CAST(COUNT(*) AS BIGINT) AS y
              FROM events
              WHERE user_id IS NOT NULL AND ts IS NOT NULL
              GROUP BY 1, 2),
            obs AS (
              SELECT k, t,
                     CASE WHEN y < 5 THEN 'low'
                          WHEN y < 9 THEN 'mid'
                          ELSE 'high' END AS a
              FROM daily),
            lagged AS (
              SELECT k, t, a,
                     LAG(a) OVER (PARTITION BY k ORDER BY t) AS prev_a,
                     ROW_NUMBER() OVER (PARTITION BY k ORDER BY t) AS rn
              FROM obs),
            flagged AS (
              SELECT k, t, a,
                     CASE WHEN rn = 1 OR prev_a IS DISTINCT FROM a
                          THEN 1 ELSE 0 END AS chg
              FROM lagged),
            runs AS (
              SELECT k, t, a,
                     SUM(chg) OVER (PARTITION BY k ORDER BY t
                                    ROWS UNBOUNDED PRECEDING) AS version
              FROM flagged),
            dim AS (
              SELECT k, version, a AS volume_class,
                     MIN(t) AS valid_from, MAX(t) AS valid_to
              FROM runs GROUP BY k, version, a),
            facts AS (
              SELECT user_id % 50 AS f_host,
                     date_diff('day', DATE '1970-01-01',
                               CAST(ts AS DATE)) AS f_day
              FROM events
              WHERE user_id IS NOT NULL AND ts IS NOT NULL)
            SELECT d.volume_class,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(COUNT(DISTINCT (f.f_host, f.f_day)) AS BIGINT)
                     AS n_host_days
            FROM facts f JOIN dim d
              ON f.f_host = d.k
             AND f.f_day BETWEEN d.valid_from AND d.valid_to
            GROUP BY d.volume_class
        """,
        "events_theilsen_trend": """
            WITH f AS (
              SELECT event_type AS g,
                     date_diff('day', DATE '1970-01-01',
                               CAST(ts AS DATE)) AS t
              FROM events
              WHERE event_type IS NOT NULL AND ts IS NOT NULL),
            ticks AS (SELECT g, t, COUNT(*) AS y FROM f GROUP BY g, t),
            p AS (
              SELECT a.g,
                     CAST(b.y - a.y AS BIGINT) AS dy,
                     CAST(b.t - a.t AS BIGINT) AS dt
              FROM ticks a JOIN ticks b ON a.g = b.g AND a.t < b.t),
            slopes AS (
              SELECT g,
                     CAST(CASE WHEN dy < 0
                          THEN -(CAST(-dy AS HUGEINT) * 1000000 // dt)
                          ELSE CAST(dy AS HUGEINT) * 1000000 // dt
                          END AS BIGINT) AS s_micro
              FROM p),
            m AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_ticks
                  FROM ticks GROUP BY g)
            SELECT s.g AS event_type,
                   MAX(m.n_ticks) AS n_ticks,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(quantile_cont(2 * s.s_micro, 0.5) AS BIGINT)
                       AS slope_med2_micro
            FROM slopes s JOIN m ON s.g = m.g
            GROUP BY s.g
        """,
        "events_rate_dispersion": """
            WITH f AS (
              SELECT event_type AS g,
                     date_diff('day', DATE '1970-01-01',
                               CAST(ts AS DATE)) AS t
              FROM events
              WHERE event_type IS NOT NULL AND ts IS NOT NULL),
            ticks AS (SELECT g, t, COUNT(*) AS y FROM f GROUP BY g, t),
            agg AS (
              SELECT g, COUNT(*) AS n_ticks,
                     MAX(t) - MIN(t) + 1 AS span,
                     SUM(y) AS tot, SUM(y * y) AS syy
              FROM ticks GROUP BY g)
            SELECT g AS event_type,
                   CAST(n_ticks AS BIGINT) AS n_ticks,
                   CAST(span AS BIGINT) AS span,
                   CAST(tot AS BIGINT) AS total_rows,
                   CAST((CAST(span AS HUGEINT) * syy
                         - CAST(tot AS HUGEINT) * tot) * 1000000
                        // (CAST(span AS HUGEINT) * tot) AS BIGINT)
                     AS dispersion_ppm
            FROM agg
        """,
        "lineitem_price_wmedian": """
            WITH f AS (
              SELECT l_returnflag AS g,
                     CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
                     CAST(l_quantity AS BIGINT) AS w
              FROM lineitem
              WHERE l_returnflag IS NOT NULL
                AND CAST(l_quantity AS BIGINT) > 0),
            cells AS (SELECT g, v, SUM(w) AS wv FROM f GROUP BY g, v),
            run AS (
              SELECT g, v,
                     SUM(wv) OVER (PARTITION BY g ORDER BY v) AS cumw,
                     SUM(wv) OVER (PARTITION BY g) AS tot_w
              FROM cells)
            SELECT g AS l_returnflag,
                   CAST(tot_w AS BIGINT) AS total_weight,
                   CAST(MIN(v) AS BIGINT) AS weighted_quantile
            FROM run WHERE cumw * 2 >= tot_w * 1
            GROUP BY g, tot_w
        """,
        # Cohen's kappa: chance-corrected two-rater agreement; the
        # numerator n*diag - pe_num can be negative -> sign-symmetric
        # ABS routing (Spark div truncates, DuckDB // floors)
        "docs_rater_kappa": """
            WITH f AS (
              SELECT source AS g,
                     CASE WHEN n_chars > 400 THEN 1 ELSE 0 END AS a,
                     CASE WHEN LENGTH(text) -
                               LENGTH(REPLACE(text, ' ', '')) > 60
                          THEN 1 ELSE 0 END AS b
              FROM documents
              WHERE source IS NOT NULL AND n_chars IS NOT NULL
                AND text IS NOT NULL),
            cells AS (
              SELECT g, a, b, COUNT(*) AS o FROM f GROUP BY g, a, b),
            per_g AS (
              SELECT g, SUM(o) AS n,
                     SUM(CASE WHEN a = b THEN o ELSE 0 END) AS diag
              FROM cells GROUP BY g),
            ma AS (SELECT g, a AS k, SUM(o) AS ra FROM cells GROUP BY g, a),
            mb AS (SELECT g, b AS k, SUM(o) AS cb FROM cells GROUP BY g, b),
            pe AS (
              SELECT ma.g, SUM(ra * cb) AS pe_num
              FROM ma JOIN mb ON ma.g = mb.g AND ma.k = mb.k
              GROUP BY ma.g)
            SELECT p.g AS source,
                   CAST(p.n AS BIGINT) AS n_rows,
                   CAST(CAST(p.diag AS HUGEINT) * 1000000 // p.n AS BIGINT)
                     AS po_ppm,
                   CAST(CAST(e.pe_num AS HUGEINT) * 1000000
                        // (CAST(p.n AS HUGEINT) * p.n) AS BIGINT) AS pe_ppm,
                   CAST(CASE WHEN p.n * p.diag - e.pe_num < 0
                        THEN -(CAST(-(p.n * p.diag - e.pe_num) AS HUGEINT)
                               * 1000000
                               // (CAST(p.n AS HUGEINT) * p.n - e.pe_num))
                        ELSE CAST(p.n * p.diag - e.pe_num AS HUGEINT)
                             * 1000000
                             // (CAST(p.n AS HUGEINT) * p.n - e.pe_num)
                        END AS BIGINT) AS kappa_ppm
            FROM per_g p JOIN pe e ON p.g = e.g
            WHERE CAST(p.n AS HUGEINT) * p.n <> e.pe_num
        """,
        # lag-7 autocorrelation of daily counts: subrange sums from the
        # nonzero cells only (implicit zero days contribute nothing to
        # any sum; only n = span - lag carries the span); num^2 is
        # non-negative so only num's SIGN needs the symmetric CASE
        "events_weekly_autocorr": """
            WITH f AS (
              SELECT event_type AS g,
                     date_diff('day', DATE '1970-01-01',
                               CAST(ts AS DATE)) AS t
              FROM events
              WHERE event_type IS NOT NULL AND ts IS NOT NULL),
            ticks AS (SELECT g, t, COUNT(*) AS y FROM f GROUP BY g, t),
            span AS (SELECT g, MIN(t) AS lo, MAX(t) AS hi
                     FROM ticks GROUP BY g),
            side AS (
              SELECT k.g, k.lo, k.hi,
                     SUM(CASE WHEN c.t <= k.hi - 7 THEN c.y ELSE 0 END)
                       AS sx,
                     SUM(CASE WHEN c.t <= k.hi - 7 THEN c.y * c.y ELSE 0 END)
                       AS sxx,
                     SUM(CASE WHEN c.t >= k.lo + 7 THEN c.y ELSE 0 END)
                       AS sz,
                     SUM(CASE WHEN c.t >= k.lo + 7 THEN c.y * c.y ELSE 0 END)
                       AS szz
              FROM span k JOIN ticks c ON c.g = k.g
              GROUP BY k.g, k.lo, k.hi),
            x AS (
              SELECT a.g, SUM(a.y * b.y) AS sxz
              FROM ticks a JOIN ticks b ON a.g = b.g AND b.t = a.t + 7
              GROUP BY a.g),
            agg AS (
              SELECT s.g, s.hi - s.lo + 1 - 7 AS n,
                     s.sx, s.sxx, s.sz, s.szz,
                     COALESCE(x.sxz, 0) AS sxz
              FROM side s LEFT JOIN x ON s.g = x.g),
            d AS (
              SELECT g, n,
                     n * sxz - sx * sz AS num,
                     n * sxx - sx * sx AS denx,
                     n * szz - sz * sz AS denz
              FROM agg WHERE n >= 2)
            SELECT g AS event_type,
                   CAST(n AS BIGINT) AS n_pairs,
                   CAST(num AS BIGINT) AS acov_num,
                   CAST(denx AS BIGINT) AS den_x,
                   CAST(denz AS BIGINT) AS den_z,
                   CAST(CASE WHEN num < 0
                        THEN -(CAST(num AS HUGEINT) * num * 1000000
                               // (CAST(denx AS HUGEINT) * denz))
                        ELSE CAST(num AS HUGEINT) * num * 1000000
                             // (CAST(denx AS HUGEINT) * denz)
                        END AS BIGINT) AS r2_signed_ppm
            FROM d WHERE denx > 0 AND denz > 0
        """,
        "docs_profile": """
            SELECT 'doc_id' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_nulls,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct,
                   COALESCE(CAST(MIN(doc_id) AS VARCHAR), '') AS min_s,
                   COALESCE(CAST(MAX(doc_id) AS VARCHAR), '') AS max_s
            FROM documents
            UNION ALL
            SELECT 'text', CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT),
                   CAST(COUNT(DISTINCT text) AS BIGINT),
                   COALESCE(MIN(text), ''), COALESCE(MAX(text), '')
            FROM documents
            UNION ALL
            SELECT 'lang', CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT),
                   CAST(COUNT(DISTINCT lang) AS BIGINT),
                   COALESCE(MIN(lang), ''), COALESCE(MAX(lang), '')
            FROM documents
            UNION ALL
            SELECT 'source', CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT),
                   CAST(COUNT(DISTINCT source) AS BIGINT),
                   COALESCE(MIN(source), ''), COALESCE(MAX(source), '')
            FROM documents
            UNION ALL
            SELECT 'n_chars', CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT),
                   CAST(COUNT(DISTINCT n_chars) AS BIGINT),
                   COALESCE(CAST(MIN(n_chars) AS VARCHAR), ''),
                   COALESCE(CAST(MAX(n_chars) AS VARCHAR), '')
            FROM documents
        """,
        "ref_integrity": """
            SELECT 'lineitem_orders' AS fk_edge,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CASE WHEN f.l_orderkey IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_null_fk,
                   CAST(SUM(CASE WHEN f.l_orderkey IS NOT NULL
                                  AND d.k IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_orphans
            FROM lineitem f LEFT JOIN
                 (SELECT DISTINCT o_orderkey AS k FROM orders) d
                 ON f.l_orderkey = d.k
            UNION ALL
            SELECT 'lineitem_part', CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(CASE WHEN f.l_partkey IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT),
                   CAST(SUM(CASE WHEN f.l_partkey IS NOT NULL
                                  AND d.k IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT)
            FROM lineitem f LEFT JOIN
                 (SELECT DISTINCT p_partkey AS k FROM part) d
                 ON f.l_partkey = d.k
            UNION ALL
            SELECT 'lineitem_supplier', CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(CASE WHEN f.l_suppkey IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT),
                   CAST(SUM(CASE WHEN f.l_suppkey IS NOT NULL
                                  AND d.k IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT)
            FROM lineitem f LEFT JOIN
                 (SELECT DISTINCT s_suppkey AS k FROM supplier) d
                 ON f.l_suppkey = d.k
            UNION ALL
            SELECT 'orders_customer', CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(CASE WHEN f.o_custkey IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT),
                   CAST(SUM(CASE WHEN f.o_custkey IS NOT NULL
                                  AND d.k IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT)
            FROM orders f LEFT JOIN
                 (SELECT DISTINCT c_custkey AS k FROM customer) d
                 ON f.o_custkey = d.k
            UNION ALL
            SELECT 'customer_nation', CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(CASE WHEN f.c_nationkey IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT),
                   CAST(SUM(CASE WHEN f.c_nationkey IS NOT NULL
                                  AND d.k IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT)
            FROM customer f LEFT JOIN
                 (SELECT DISTINCT n_nationkey AS k FROM nation) d
                 ON f.c_nationkey = d.k
        """,
        "classifier_calibration": _CLF_SCORED_CTE + """
            , conf AS (
              SELECT LEAST(1000000, GREATEST(0,
                       (s.score_fp + 1000 * s.n_feats) * 500
                       // s.n_feats)) AS conf,
                     (d.n_chars > 400) AS y
              FROM documents d JOIN scored s ON s.doc_id = d.doc_id
              WHERE s.n_feats > 0 AND d.n_chars IS NOT NULL),
            cells AS (
              SELECT LEAST(9, conf * 10 // 1000000) AS bin,
                     COUNT(*) AS n,
                     SUM(CASE WHEN y THEN 1 ELSE 0 END) AS pos,
                     SUM(conf) AS conf_sum
              FROM conf GROUP BY 1)
            SELECT CAST(bin AS BIGINT) AS bin,
                   CAST(n AS BIGINT) AS n,
                   CAST(pos AS BIGINT) AS n_pos,
                   CAST(pos * 1000000 // n AS BIGINT) AS acc_ppm,
                   CAST(conf_sum // n AS BIGINT) AS mean_conf_ppm,
                   CAST(ABS(pos * 1000000 // n - conf_sum // n) AS BIGINT)
                     AS gap_ppm,
                   CAST(n * ABS(pos * 1000000 // n - conf_sum // n)
                        AS BIGINT) AS ece_num
            FROM cells
        """,
        # rendezvous owner via the same packed-BIGINT argmax as the
        # engine: (w // 32)*32 + s — ties break to the larger shard id
        "shard_rebalance": """
            WITH ids AS (
              SELECT DISTINCT CAST(doc_id AS VARCHAR) AS id FROM documents
              WHERE doc_id IS NOT NULL),
            hm AS (
              SELECT id, ('0x' || substr(md5(id), 1, 15))::BIGINT AS h
              FROM ids),
            modp AS (
              SELECT 'mod' AS policy, COUNT(*) AS n_docs,
                     SUM(CASE WHEN h % 8 <> h % 10 THEN 1 ELSE 0 END)
                       AS n_moved
              FROM hm),
            fan AS (
              SELECT id, s,
                     ('0x' || substr(md5('shard:' || CAST(s AS VARCHAR)
                                         || ':' || id), 1, 15))::BIGINT AS w
              FROM ids, UNNEST(range(0, 10)) AS u(s)),
            packed AS (
              SELECT id,
                     MAX(CASE WHEN s < 8 THEN w // 32 * 32 + s END) AS p_old,
                     MAX(CASE WHEN s < 10 THEN w // 32 * 32 + s END) AS p_new
              FROM fan GROUP BY id),
            rdv AS (
              SELECT 'rendezvous' AS policy, COUNT(*) AS n_docs,
                     SUM(CASE WHEN p_old % 32 <> p_new % 32
                              THEN 1 ELSE 0 END) AS n_moved
              FROM packed),
            u AS (SELECT * FROM modp UNION ALL SELECT * FROM rdv)
            SELECT policy, CAST(n_docs AS BIGINT) AS n_docs,
                   CAST(n_moved AS BIGINT) AS n_moved,
                   CAST(CASE WHEN n_docs = 0 THEN 0
                        ELSE CAST(n_moved AS HUGEINT) * 1000000 // n_docs
                        END AS BIGINT) AS moved_ppm
            FROM u
        """,
        "events_attribution": """
            WITH e AS (
              SELECT user_id, event_id, ts, event_type,
                     CASE WHEN event_type <> 'purchase'
                          THEN event_type END AS touch
              FROM events
              WHERE user_id IS NOT NULL AND ts IS NOT NULL
                AND event_type IS NOT NULL AND event_id IS NOT NULL),
            c AS (
              SELECT event_type,
                     FIRST_VALUE(touch IGNORE NULLS) OVER w AS first_touch,
                     LAST_VALUE(touch IGNORE NULLS) OVER w AS last_touch
              FROM e
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING)),
            conv AS (SELECT * FROM c WHERE event_type = 'purchase'),
            u AS (
              SELECT 'first' AS model,
                     COALESCE(first_touch, 'none') AS touch_type FROM conv
              UNION ALL
              SELECT 'last', COALESCE(last_touch, 'none') FROM conv)
            SELECT model, touch_type,
                   CAST(COUNT(*) AS BIGINT) AS n_conversions
            FROM u GROUP BY model, touch_type
        """,
    }
