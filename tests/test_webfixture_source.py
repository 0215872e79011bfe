"""Python Data Source (Spark 4) reads of the web fixture
(sources/webfixture_source.py)."""

from __future__ import annotations

from docrawl_spark.sources.fixtures import fixture_to_dfs, generate_web
from docrawl_spark.sources.webfixture_source import WebFixtureDataSource


def test_source_matches_fixture_dfs(spark):
    spark.dataSource.register(WebFixtureDataSource)
    via_source = (
        spark.read.format("webfixture").option("seed", 7).load()
    )
    # host-partitioned scan: one input partition per host
    assert via_source.rdd.getNumPartitions() == 6
    fx = generate_web(seed=7)
    via_df, _, _ = fixture_to_dfs(spark, fx)
    a = {(r["doc_id"], tuple(map(tuple, r["spans"]))) for r in via_source.collect()}
    b = {(r["doc_id"], tuple(map(tuple, r["spans"]))) for r in via_df.collect()}
    assert a == b


def test_crawl_over_source_documents(spark, tmp_path):
    """The source can feed the engine directly: crawl results over
    format('webfixture') == crawl results over createDataFrame."""
    from docrawl_spark.plans.crawl import run_crawl
    from docrawl_spark.sources.storage import Warehouse

    spark.dataSource.register(WebFixtureDataSource)
    docs_src = spark.read.format("webfixture").option("seed", 11).load()
    fx = generate_web(seed=11)
    docs_df, hosts, seeds = fixture_to_dfs(spark, fx)
    r1 = run_crawl(spark, docs_src, hosts, seeds, max_waves=4,
                   warehouse=Warehouse(str(tmp_path / "a"), spark))
    r2 = run_crawl(spark, docs_df, hosts, seeds, max_waves=4,
                   warehouse=Warehouse(str(tmp_path / "b"), spark))
    assert r1.visits == r2.visits and r1.seen_urls == r2.seen_urls
