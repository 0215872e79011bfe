"""Exact shared-substring detection (datapipe/dedup.substring_dup_spans
and substring_dedup_docs) on hand-computed cases — the cross-engine
oracle row lives in test_oracle_parity; these pin the island/diagonal
semantics, the stop-gram caps, and the packed-BIGINT tiebreak."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from docrawl_spark.datapipe.dedup import (
    substring_dedup_docs,
    substring_dup_spans,
    substring_gram_table,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_single_shared_span_exact_length_and_starts(spark):
    """Two docs embed the same 10-token run at different offsets: one
    span of exactly 10 tokens, located at the right starts."""
    shared = _words("s", 10)
    rows = [
        (1, _words("a", 3) + " " + shared + " " + _words("b", 4)),
        (2, _words("c", 6) + " " + shared + " " + _words("d", 2)),
    ]
    out = substring_dup_spans(_docs(spark, rows), k=4, min_span_tokens=8).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["max_span_tokens"] == 10
    assert r["n_spans"] == 1
    assert (r["start_a"], r["start_b"]) == (3, 6)


def test_gap_splits_into_two_islands(spark):
    """Shared prefix run + shared suffix run with differing middles:
    two spans on (generally) different diagonals, max = the longer."""
    p, q = _words("p", 8), _words("q", 6)
    rows = [
        (1, p + " x0 x1 " + q),
        (2, p + " y0 y1 y2 " + q),
    ]
    out = substring_dup_spans(_docs(spark, rows), k=4, min_span_tokens=5).collect()
    assert len(out) == 1
    r = out[0]
    assert r["max_span_tokens"] == 8
    assert r["n_spans"] == 2
    assert (r["start_a"], r["start_b"]) == (0, 0)


def test_below_min_span_is_dropped(spark):
    """A 6-token shared run does not survive min_span_tokens=8."""
    shared = _words("s", 6)
    rows = [
        (1, shared + " " + _words("a", 8)),
        (2, shared + " " + _words("b", 8)),
    ]
    assert (
        substring_dup_spans(_docs(spark, rows), k=4, min_span_tokens=8).count() == 0
    )


def test_max_gram_tf_drops_degenerate_repetition(spark):
    """'w w w ... w' repeated 40x in both docs: every gram is the same,
    within-doc TF cap (8) removes it before the self-join, so NO pair
    row is produced (those docs are gopher-repetition rejects)."""
    rep = " ".join(["w"] * 40)
    rows = [(1, rep), (2, rep)]
    assert substring_dup_spans(_docs(spark, rows), k=4, min_span_tokens=4).count() == 0


def test_max_gram_df_drops_boilerplate_gram(spark):
    """A gram present in MORE than max_gram_df docs is excluded; the
    same corpus passes once the cap is raised."""
    shared = _words("s", 4)
    rows = [(i, shared + " " + _words(f"u{i}_", 4)) for i in range(1, 6)]
    low = substring_dup_spans(
        _docs(spark, rows), k=4, min_span_tokens=4, max_gram_df=4
    )
    assert low.count() == 0
    high = substring_dup_spans(
        _docs(spark, rows), k=4, min_span_tokens=4, max_gram_df=64
    )
    assert high.count() == 10  # C(5,2) pairs all share the 4-token run


def test_dedup_docs_keeps_smallest_id(spark):
    """Pairs (1,2) and (1,3) via a shared run: ids 2 and 3 drop, 1 and
    the unrelated 4 stay."""
    shared = _words("s", 9)
    rows = [
        (1, shared + " " + _words("a", 3)),
        (2, shared + " " + _words("b", 3)),
        (3, _words("c", 2) + " " + shared),
        (4, _words("z", 14)),
    ]
    kept = sorted(
        r["doc_id"]
        for r in substring_dedup_docs(
            _docs(spark, rows), k=4, min_span_tokens=8
        ).collect()
    )
    assert kept == [1, 4]


def test_gram_table_positions_and_hash_modes(spark):
    """Positions are 0-based and contiguous; md5hex and xxhash64 modes
    produce the same (doc, pos) skeleton."""
    rows = [(7, _words("t", 6))]
    for mode in ("xxhash64", "md5hex"):
        g = substring_gram_table(_docs(spark, rows), k=4, hash_mode=mode)
        got = sorted((r["doc_id"], r["pos"]) for r in g.collect())
        assert got == [(7, 0), (7, 1), (7, 2)]


def test_spans_plan_has_no_cartesian(spark):
    """The pair stage must be an equi-join on the gram hash — never a
    cartesian/broadcast-nested-loop over docs."""
    rows = [(i, _words(f"v{i}_", 12)) for i in range(1, 9)]
    buf = io.StringIO()
    with redirect_stdout(buf):
        substring_dup_spans(_docs(spark, rows), k=4).explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- content-defined chunking (datapipe/dedup.cdc_chunk_table) -------


def _cdc_chunks(spark, rows, **kw):
    from docrawl_spark.datapipe.dedup import cdc_chunk_table

    return cdc_chunk_table(_docs(spark, rows), **kw)


def test_cdc_chunks_reassemble_to_document(spark):
    """Chunks, concatenated in order of discovery, must reproduce the
    exact document bytes — boundaries partition, never drop/overlap."""
    text = _words("w", 60)
    out = _cdc_chunks(spark, [(1, text)], k=8, divisor=16).collect()
    assert "".join(r["chunk"] for r in out) == text
    assert all(len(r["chunk"]) >= 1 for r in out)


def test_cdc_short_doc_is_one_whole_chunk(spark):
    """Docs shorter than k can have no k-gram boundary: one chunk."""
    out = _cdc_chunks(spark, [(1, "abc")], k=8).collect()
    assert [(r["doc_id"], r["chunk"]) for r in out] == [(1, "abc")]


def test_cdc_boundaries_survive_prefix_insertion(spark):
    """The CDC motivation: prepending bytes shifts every fixed-size
    block but the chunks after the first content-defined cut are
    IDENTICAL — the suffix's chunk multiset is shared."""
    base = _words("page", 80)
    rows = [(1, base), (2, "INSERTED HEADER " + base)]
    out = _cdc_chunks(spark, rows, k=8, divisor=16).collect()
    by_doc = {1: [], 2: []}
    for r in out:
        by_doc[r["doc_id"]].append(r["chunk"])
    # both docs produced >1 chunk (otherwise the test is vacuous)
    assert len(by_doc[1]) > 1 and len(by_doc[2]) > 1
    shared = set(by_doc[1]) & set(by_doc[2])
    # everything after doc 1's first cut reappears verbatim in doc 2
    assert set(by_doc[1][1:]) <= set(by_doc[2])
    assert shared, "no shared chunks — boundaries were not content-defined"


def test_cdc_hash_modes_cut_independently_but_partition(spark):
    """xxhash64 mode is the scale twin: different cut points are fine
    (different hash), but it must still exactly partition the text."""
    text = _words("mix", 50)
    out = _cdc_chunks(spark, [(3, text)], k=8, divisor=16, hash_mode="xxhash64").collect()
    assert "".join(r["chunk"] for r in out) == text


def test_cdc_dedup_stats_counts_copies(spark):
    """Two identical docs: every chunk row has n_copies=2, n_docs=2,
    and SUM(chunk_len * n_copies) = total corpus bytes."""
    from docrawl_spark.datapipe.dedup import cdc_dedup_stats

    text = _words("dup", 40)
    chunks = _cdc_chunks(spark, [(1, text), (2, text)], k=8, divisor=16)
    stats = cdc_dedup_stats(chunks).collect()
    assert stats and all(r["n_copies"] == 2 and r["n_docs"] == 2 for r in stats)
    assert sum(r["chunk_len"] * r["n_copies"] for r in stats) == 2 * len(text)
