"""Crawl-order equality across MANY fixture webs (different graph
shapes, robots patterns, budgets), plus the quarantine error path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docrawl_spark.plans.crawl import run_crawl
from docrawl_spark.plans.simulator import simulate_crawl
from docrawl_spark.sources.fixtures import fixture_to_dfs, generate_web
from docrawl_spark.sources.schemas import DOCUMENTS_SCHEMA, SEEDS_SCHEMA
from docrawl_spark.sources.storage import Warehouse


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_crawl_equality_across_seeds(spark, tmp_path, seed):
    fx = generate_web(seed=seed, n_hosts=5, pages_cold=5, pages_hot=12, n_seeds=4)
    sim = simulate_crawl(fx.documents_raw, fx.hosts, fx.seeds, max_waves=5)
    docs_raw, hosts_df, seeds_df = fixture_to_dfs(spark, fx)
    wh = Warehouse(str(tmp_path / f"wh{seed}"), spark)
    res = run_crawl(
        spark, docs_raw, hosts_df, seeds_df, max_waves=5, warehouse=wh, use_bloom=True
    )
    assert res.visits == sim.visits
    assert res.seen_urls == sim.seen


def test_bloom_growth_preserves_exactness(spark, tmp_path):
    """Deliberately undersized Bloom (capacity 4) forces repeated 4x
    growth rebuilds mid-crawl; results must stay identical to the
    simulator (the exact anti-join is always the source of truth)."""
    fx = generate_web(seed=404)
    sim = simulate_crawl(fx.documents_raw, fx.hosts, fx.seeds, max_waves=5)
    docs_raw, hosts_df, seeds_df = fixture_to_dfs(spark, fx)
    wh = Warehouse(str(tmp_path / "whg"), spark)
    res = run_crawl(
        spark, docs_raw, hosts_df, seeds_df, max_waves=5, warehouse=wh,
        use_bloom=True, expected_total_urls=4,
    )
    assert res.visits == sim.visits
    assert res.seen_urls == sim.seen


def test_quarantine_captures_canon_errors(spark, tmp_path):
    """A link whose relative path underflows ('../..' past the root)
    must be quarantined — never visited, never fatal."""
    docs = spark.createDataFrame(
        [
            (
                "https://q.test/p0",
                [
                    ("link", "bad", "../../../x", 0),
                    ("link", "good", "/p1", 1),
                ],
            ),
            ("https://q.test/p1", [("text", "leaf", "", 0)]),
        ],
        DOCUMENTS_SCHEMA,
    )
    hosts = spark.createDataFrame(
        [("q.test", 1.0, 5, "")],
        "host string, crawl_delay double, budget int, robots_blob string",
    )
    seeds = spark.createDataFrame([("https://q.test/p0", 0)], SEEDS_SCHEMA)
    wh = Warehouse(str(tmp_path / "whq"), spark)
    res = run_crawl(spark, docs, hosts, seeds, max_waves=3, warehouse=wh)
    assert [u for _, u in res.visits] == ["https://q.test/p0", "https://q.test/p1"]
    quarantined = wh.read("quarantine").collect()
    assert len(quarantined) == 1
    assert quarantined[0]["bad_ref"] == "../../../x"
    assert quarantined[0]["discovered_by"] == "https://q.test/p0"
    assert quarantined[0]["canon_error"] is not None
