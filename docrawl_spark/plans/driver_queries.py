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


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: big scan + groupBy + many aggregates."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
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
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
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
# Registry
# --------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
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
    }


def oracle_sql() -> dict[str, str]:
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
        "frontier_host_metrics": f"""
            SELECT host,
                   COUNT(*) AS n_docs,
                   SUM(n_chars) AS sum_chars,
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
                   ROUND(SUM(l_quantity), 4) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
                   ROUND(AVG(l_quantity), 4) AS avg_qty,
                   ROUND(AVG(l_discount), 4) AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "revenue_by_nation": """
            SELECT n_name,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
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
    }
