"""chunk_documents / pack_sequences (datapipe/packing) semantics:
hand-computed windows, the straddle-bound property, and a fully
independent Python reimplementation of the packing spec (md5 ppm order
+ running sum) — cross-engine oracle rows live in test_oracle_parity."""

from __future__ import annotations

import hashlib

import pytest

from docrawl_spark.datapipe.packing import (
    chunk_documents,
    pack_manifest,
    pack_sequences,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_windows_hand_computed(spark):
    """10 tokens, chunk 4, overlap 1 (stride 3): starts 0/3/6 kept, the
    start-9 window is dropped (adds only overlap)."""
    text = " ".join(f"t{i}" for i in range(10))
    out = sorted(
        (r["chunk_idx"], r["start_tok"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(
            _docs(spark, [(1, text)]), chunk_tokens=4, overlap=1
        ).collect()
    )
    assert out == [
        (0, 0, 4, "t0 t1 t2 t3"),
        (1, 3, 4, "t3 t4 t5 t6"),
        (2, 6, 4, "t6 t7 t8 t9"),
    ]


def test_chunk_short_and_empty_docs(spark):
    """A doc shorter than the window yields one whole-doc chunk; an
    empty doc yields none."""
    out = chunk_documents(
        _docs(spark, [(1, "a b c"), (2, "")]), chunk_tokens=8, overlap=2
    ).collect()
    assert [(r["doc_id"], r["chunk_idx"], r["n_tokens"], r["chunk_text"]) for r in out] == [
        (1, 0, 3, "a b c")
    ]


def test_chunk_overlap_validation(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "a b")]), chunk_tokens=4, overlap=4)


def _ppm(doc_id: int, salt: str = "pack1") -> int:
    h = hashlib.md5(f"{salt}|{doc_id}".encode()).hexdigest()[:15]
    return int(h, 16) % 1_000_000


def test_pack_matches_independent_python_spec(spark):
    """The whole pipeline (md5 ppm → shard → order → running sum →
    pack cut) re-derived in pure Python must agree row-for-row."""
    rows = [(i, " ".join(["w"] * (5 + 3 * (i % 7)))) for i in range(1, 41)]
    budget, n_shards = 24, 4
    got = {
        r["doc_id"]: (r["shard"], r["pack_idx"], r["n_tokens"], r["cum_tokens"])
        for r in pack_sequences(
            _docs(spark, rows), budget_tokens=budget, n_shards=n_shards
        ).collect()
    }
    toks = {i: min(budget, 5 + 3 * (i % 7)) for i, _ in rows}
    expected = {}
    by_shard: dict[int, list[int]] = {}
    for i, _ in rows:
        by_shard.setdefault(_ppm(i) % n_shards, []).append(i)
    for shard, ids in by_shard.items():
        cum = 0
        for i in sorted(ids, key=lambda d: (_ppm(d), d)):
            cum += toks[i]
            pack = (cum - 1) // budget if toks[i] > 0 else cum // budget
            expected[i] = (shard, pack, toks[i], cum)
    assert got == expected


def test_pack_straddle_bound_and_manifest(spark):
    """No pack exceeds budget + cap − 1 tokens; the manifest reproduces
    per-pack sums and every doc is assigned exactly once."""
    rows = [(i, " ".join(["w"] * (1 + i % 50))) for i in range(1, 101)]
    budget = 64
    packs = pack_sequences(_docs(spark, rows), budget_tokens=budget, n_shards=2)
    man = pack_manifest(packs, budget_tokens=budget).collect()
    assert sum(r["n_docs"] for r in man) == 100
    cap = 50  # longest doc
    for r in man:
        assert r["pack_tokens"] <= budget + cap - 1
        assert r["fill_ppm"] == r["pack_tokens"] * 1_000_000 // budget
    # last pack per shard may be underfull; every other pack must be
    # past the budget-minus-cap line (greedy fill has no holes)
    by_shard: dict[int, list] = {}
    for r in man:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard_rows in by_shard.values():
        for r in sorted(shard_rows, key=lambda x: x["pack_idx"])[:-1]:
            assert r["pack_tokens"] > budget - cap
