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
                   warehouse=Warehouse(str(tmp_path / "a"), spark),
                   collect_visits=True)
    r2 = run_crawl(spark, docs_df, hosts, seeds, max_waves=4,
                   warehouse=Warehouse(str(tmp_path / "b"), spark),
                   collect_visits=True)
    assert r1.visits == r2.visits and r1.seen_urls == r2.seen_urls


def test_sitemap_image_entries(spark):
    """Image extension: document order, absent caption -> NULL, blank
    image loc dropped, imageless pages yield no rows, malformed doc
    parses to nothing."""
    from docrawl_spark.operators.sitemap import sitemap_image_entries

    good = (
        "<urlset><url><loc>https://h/p1</loc>"
        "<image:image><image:loc>https://h/i1.png</image:loc>"
        "<image:caption>one</image:caption></image:image>"
        "<image:image><image:loc>https://h/i2.png</image:loc></image:image>"
        "<image:image><image:loc> </image:loc></image:image>"
        "</url><url><loc>https://h/p2</loc></url></urlset>"
    )
    rows = [(1, good), (2, "not xml at all"), (3, "<urlset></urlset>")]
    df = spark.createDataFrame(rows, "doc_id long, sitemap_xml string")
    got = [
        (r["doc_id"], r["loc"], r["img_order"], r["image_loc"], r["caption"])
        for r in sitemap_image_entries(df, keep_cols=["doc_id"])
        .orderBy("doc_id", "img_order")
        .collect()
    ]
    assert got == [
        (1, "https://h/p1", 0, "https://h/i1.png", "one"),
        (1, "https://h/p1", 1, "https://h/i2.png", None),
    ]
