"""Warehouse (Iceberg-semantics-on-parquet) commit guarantees."""

from __future__ import annotations

import os

from docrawl_spark.sources.storage import Warehouse


def test_append_overwrite_time_travel(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "w"), spark)
    s1 = wh.append("t", spark.range(3).selectExpr("id"))
    s2 = wh.append("t", spark.range(3, 5).selectExpr("id"))
    assert {r["id"] for r in wh.read("t").collect()} == set(range(5))
    # time travel to the first snapshot
    assert {r["id"] for r in wh.read("t", as_of=s1).collect()} == {0, 1, 2}
    # overwrite resets visible state; history remains addressable
    wh.overwrite("t", spark.range(100, 102).selectExpr("id"))
    assert {r["id"] for r in wh.read("t").collect()} == {100, 101}
    assert {r["id"] for r in wh.read("t", as_of=s2).collect()} == set(range(5))


def test_uncommitted_snapshot_is_invisible(spark, tmp_path):
    """A crash between data write and manifest commit must roll back
    cleanly: data dirs without a manifest entry are never read."""
    wh = Warehouse(str(tmp_path / "w2"), spark)
    wh.append("t", spark.range(2).selectExpr("id"))
    # simulate a crashed writer: snapshot dir exists, manifest not updated
    orphan = os.path.join(str(tmp_path / "w2"), "t", "snap-deadbeef0000")
    spark.range(50, 60).selectExpr("id").write.parquet(orphan)
    assert {r["id"] for r in wh.read("t").collect()} == {0, 1}


def test_empty_table_needs_schema(spark, tmp_path):
    import pytest
    from docrawl_spark.sources.schemas import URL_SEEN_SCHEMA

    wh = Warehouse(str(tmp_path / "w3"), spark)
    df = wh.read("missing", empty_schema=URL_SEEN_SCHEMA)
    assert df.count() == 0 and "url_hash" in df.columns
    with pytest.raises(ValueError):
        wh.read("missing2")


def test_merge_upsert_semantics(spark, tmp_path):
    """MERGE INTO analogue: same-key rows are replaced, new keys
    append, and the merge lands as one atomic snapshot (time travel to
    the pre-merge state still works)."""
    wh = Warehouse(str(tmp_path / "w4"), spark)
    pre = wh.append(
        "t", spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    )
    wh.merge_upsert(
        "t", spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string"), ["k"]
    )
    got = {(r["k"], r["v"]) for r in wh.read("t").collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}
    before = {(r["k"], r["v"]) for r in wh.read("t", as_of=pre).collect()}
    assert before == {(1, "a"), (2, "b")}
    # merge into a missing table = plain insert
    wh.merge_upsert("t2", spark.createDataFrame([(9, "z")], "k long, v string"), ["k"])
    assert {(r["k"], r["v"]) for r in wh.read("t2").collect()} == {(9, "z")}
