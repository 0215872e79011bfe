"""Warehouse compaction/expiry (sources/storage) and adaptive
politeness (operators/politeness.adaptive_crawl_delays) — unit
semantics; adaptive_delays cross-engine parity is in
test_oracle_parity."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from docrawl_spark.sources.storage import Warehouse


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _data_files(root: str, table: str) -> list[str]:
    out = []
    tdir = os.path.join(root, table)
    for dirpath, _dirs, files in os.walk(tdir):
        out += [
            os.path.join(dirpath, f)
            for f in files
            if f.endswith(".parquet")
        ]
    return out


def test_compact_preserves_rows_and_time_travel(spark, tmp_path):
    wh = Warehouse(str(tmp_path), spark)
    for i in range(4):
        wh.append(
            "t",
            spark.range(i * 10, i * 10 + 10).select(
                F.col("id"), (F.col("id") * 2).alias("v")
            ),
        )
    pre_snap = wh.snapshot_ids("t")[-1]
    before = _rows(wh.read("t"))
    n_files_before = len(_data_files(str(tmp_path), "t"))

    wh.compact("t", target_files=1)
    assert _rows(wh.read("t")) == before
    # time travel to a pre-compaction snapshot still replays correctly
    assert _rows(wh.read("t", as_of=pre_snap)) == before
    # current read now plans exactly ONE snapshot dir
    m = wh._load_manifest("t")
    assert m["snapshots"][-1].get("compacted") is True


def test_compact_after_merge_upsert(spark, tmp_path):
    wh = Warehouse(str(tmp_path), spark)
    wh.append("t", spark.range(10).select("id", (F.col("id") * 2).alias("v")))
    wh.merge_upsert(
        "t",
        spark.createDataFrame([(3, 999), (42, 1)], "id long, v long"),
        ["id"],
    )
    before = _rows(wh.read("t"))
    assert (3, 999) in before and (42, 1) in before and len(before) == 11
    wh.compact("t", target_files=1)
    assert _rows(wh.read("t")) == before


def test_expire_snapshots_gc(spark, tmp_path):
    wh = Warehouse(str(tmp_path), spark)
    for i in range(3):
        wh.append("t", spark.range(i * 5, i * 5 + 5).select("id"))
    before = _rows(wh.read("t"))
    old_ids = wh.snapshot_ids("t")
    wh.compact("t", target_files=1)
    expired = wh.expire_snapshots("t")
    assert set(expired) == set(old_ids)
    # expired dirs are gone; current read unchanged
    for sid in expired:
        assert not os.path.exists(os.path.join(str(tmp_path), "t", f"snap-{sid}"))
    assert _rows(wh.read("t")) == before
    # nothing left to expire (single overwrite barrier at index 0)
    assert wh.expire_snapshots("t") == []


def test_expire_noop_without_barrier(spark, tmp_path):
    wh = Warehouse(str(tmp_path), spark)
    wh.append("t", spark.range(5).select("id"))
    wh.append("t", spark.range(5, 9).select("id"))
    # appends only — nothing is shadowed, nothing may be deleted
    assert wh.expire_snapshots("t") == []
    assert len(wh.snapshot_ids("t")) == 2


def test_adaptive_delays_branches(spark):
    from docrawl_spark.operators.politeness import adaptive_crawl_delays

    rows = (
        # fast + healthy -> recover to base/2
        [("fast.test", 200, 100)] * 10
        # slow but healthy -> hold at base
        + [("slow.test", 200, 1500)] * 10
        # erroring -> multiplicative backoff: 5/10 errors = 500000 ppm,
        # ceil(500000/50000)=10 capped at 4 -> 1000*16 = 16000
        + [("bad.test", 503, 100)] * 5
        + [("bad.test", 200, 100)] * 5
        # lightly erroring: 1/10 = 100000 ppm -> steps=2 -> 4000
        + [("meh.test", 500, 100)]
        + [("meh.test", 200, 100)] * 9
    )
    log = spark.createDataFrame(rows, "host string, status int, latency_ms long")
    out = {r["host"]: r for r in adaptive_crawl_delays(log).collect()}
    assert out["fast.test"]["next_delay_ms"] == 500
    assert out["slow.test"]["next_delay_ms"] == 1000
    assert out["bad.test"]["next_delay_ms"] == 16000
    assert out["meh.test"]["next_delay_ms"] == 4000
    assert out["bad.test"]["err_ppm"] == 500000
    assert out["slow.test"]["p95_latency_ms"] == 1500


def test_adaptive_delays_clamps(spark):
    from docrawl_spark.operators.politeness import adaptive_crawl_delays

    log = spark.createDataFrame(
        [("h.test", 200, 10)] * 4, "host string, status int, latency_ms long"
    )
    # base 400 -> recover = 200, clamped up to min_delay 250
    out = adaptive_crawl_delays(
        log, base_delay_ms=400, min_delay_ms=250, max_delay_ms=1000
    ).first()
    assert out["next_delay_ms"] == 250
