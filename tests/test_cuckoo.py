"""Cuckoo seen-set filter: soundness, deletion, sharded build/probe."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from docrawl_spark.functions.cuckoo import (
    CuckooFilter,
    build_sharded_cuckoo,
    might_contain_cuckoo_col,
)


@settings(max_examples=60, deadline=None)
@given(
    keys=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        max_size=150, unique=True,
    )
)
def test_no_false_negatives(keys):
    cf = CuckooFilter.for_items(max(len(keys), 16))
    arr = np.array(keys, dtype=np.int64)
    failed = cf.insert(arr)
    assert failed == 0
    if keys:
        assert cf.contains(arr).all()


def test_delete_and_fpp():
    rng = np.random.default_rng(9)
    keys = rng.choice(2**62, size=20_000, replace=False).astype(np.int64)
    other = (rng.choice(2**61, size=20_000, replace=False) + 2**62).astype(np.int64)
    cf = CuckooFilter.for_items(len(keys))
    assert cf.insert(keys) == 0
    assert cf.contains(keys).all()
    assert cf.contains(other).mean() < 0.01  # 16-bit fp → ~0.1% expected
    half = keys[:10_000]
    assert cf.delete(half) == len(half)
    # deleted keys mostly gone (residual hits = other keys' fp collisions)
    assert cf.contains(half).mean() < 0.01
    # the other half must still ALL be present (deletion is precise)
    assert cf.contains(keys[10_000:]).all()


def test_roundtrip():
    cf = CuckooFilter.for_items(100)
    keys = np.arange(100, dtype=np.int64) * 104729
    cf.insert(keys)
    again = CuckooFilter.from_bytes(cf.to_bytes())
    assert again.contains(keys).all()


def test_sharded_build_and_probe(spark):
    seen = spark.range(0, 4000).selectExpr("xxhash64(cast(id as string)) as url_hash")
    cand = spark.range(2000, 6000).selectExpr(
        "xxhash64(cast(id as string)) as url_hash", "id"
    )
    shards = build_sharded_cuckoo(seen, "url_hash", expected_items=4000, n_shards=4)
    flagged = cand.withColumn("maybe", might_contain_cuckoo_col(cand, shards))
    rows = flagged.collect()
    seen_ids = {r["id"] for r in rows if 2000 <= r["id"] < 4000}
    maybe = {r["id"] for r in rows if r["maybe"]}
    # every truly-seen candidate flagged (no false negatives)
    assert seen_ids <= maybe
    # false-positive rate on the unseen half is tiny
    fp = len(maybe - seen_ids) / 2000
    assert fp < 0.01, fp
