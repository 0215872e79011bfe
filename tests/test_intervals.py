"""Bucketized interval-overlap join (datapipe/intervals): exactly-once
semantics vs a brute-force overlap reference, plan shape (equi-join on
the bucket id, never a cartesian), guards, and the hypothesis sweep
over widths."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from docrawl_spark.datapipe.intervals import overlap_join_bucketed

from test_determinism_and_plans import plan_of


def _frames(spark, left_rows, right_rows):
    l = spark.createDataFrame(left_rows, "lid int, ls long, le long")
    r = spark.createDataFrame(right_rows, "rid int, rs long, re long")
    return l, r


def _brute(left_rows, right_rows):
    out = set()
    for lid, ls, le in left_rows:
        if le < ls:
            continue
        for rid, rs, re in right_rows:
            if re < rs:
                continue
            if ls <= re and rs <= le:
                out.add((lid, rid))
    return out


def test_overlap_matches_brute_and_exactly_once(spark):
    left = [(1, 0, 10), (2, 5, 5), (3, 20, 30), (4, 8, 22)]
    right = [(10, 3, 6), (11, 9, 25), (12, 31, 40), (13, 0, 100)]
    l, r = _frames(spark, left, right)
    got = overlap_join_bucketed(l, r, "ls", "le", "rs", "re", bucket_width=4)
    rows = [(x["lid"], x["rid"]) for x in got.collect()]
    assert len(rows) == len(set(rows)), "pair emitted more than once"
    assert set(rows) == _brute(left, right)


def test_invalid_intervals_dropped_both_sides(spark):
    # end < start rows must be silently dropped, not crash sequence()
    l, r = _frames(spark, [(1, 10, 2), (2, 0, 4)], [(10, 3, 1), (11, 2, 6)])
    got = overlap_join_bucketed(l, r, "ls", "le", "rs", "re", bucket_width=3)
    assert [(x["lid"], x["rid"]) for x in got.collect()] == [(2, 11)]


def test_rejects_bad_width_and_name_collisions(spark):
    l, r = _frames(spark, [(1, 0, 1)], [(2, 0, 1)])
    with pytest.raises(ValueError, match="width"):
        overlap_join_bucketed(l, r, "ls", "le", "rs", "re", bucket_width=0)
    with pytest.raises(ValueError, match="disjoint"):
        overlap_join_bucketed(
            l, l.select(F.col("lid"), F.col("ls"), F.col("le")),
            "ls", "le", "ls", "le", bucket_width=3,
        )


def test_plan_is_bucket_equijoin_no_cartesian(spark):
    l, r = _frames(
        spark, [(i, i * 3, i * 3 + 7) for i in range(50)],
        [(i, i * 5, i * 5 + 2) for i in range(40)],
    )
    out = overlap_join_bucketed(l, r, "ls", "le", "rs", "re", bucket_width=8)
    plan = plan_of(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the join key is the bucket column, i.e. a hash-partitioned or
    # broadcast equi-join, and the explode feeds it
    assert "__ovl_bucket" in plan
    assert "Generate" in plan  # the sequence explode


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 15)), min_size=1, max_size=12
    ),
    st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 15)), min_size=1, max_size=12
    ),
    st.sampled_from([1, 2, 5, 7, 13]),
)
def test_overlap_hypothesis_any_width(spark, lspec, rspec, width):
    left = [(i, s, s + d) for i, (s, d) in enumerate(lspec)]
    right = [(i, s, s + d) for i, (s, d) in enumerate(rspec)]
    l, r = _frames(spark, left, right)
    got = overlap_join_bucketed(l, r, "ls", "le", "rs", "re", bucket_width=width)
    rows = [(x["lid"], x["rid"]) for x in got.collect()]
    assert len(rows) == len(set(rows))
    assert set(rows) == _brute(left, right)


# ----------------------------------------------------------------- SCD2


def _scd2(spark, rows):
    from docrawl_spark.datapipe.intervals import scd2_intervals

    df = spark.createDataFrame(rows, "k string, t long, a string")
    out = scd2_intervals(df, "k", "t", "a").collect()
    return {
        (r.k, r.version): (r.a, r.valid_from, r.valid_to, r.n_obs, r.is_current)
        for r in out
    }


def test_scd2_basic_runs(spark):
    got = _scd2(
        spark,
        [
            ("h", 1, "ok"), ("h", 2, "ok"), ("h", 3, "slow"),
            ("h", 5, "slow"), ("h", 9, "ok"),
        ],
    )
    assert got == {
        ("h", 1): ("ok", 1, 2, 2, 0),
        ("h", 2): ("slow", 3, 5, 2, 0),  # the 3->5 tick gap does NOT split
        ("h", 3): ("ok", 9, 9, 1, 1),  # newest run is current
    }


def test_scd2_gap_does_not_close_run_and_null_attrs_are_states(spark):
    got = _scd2(
        spark,
        [
            ("h", 1, "ok"), ("h", 7, "ok"),  # same value across a gap: one run
            ("h", 8, None), ("h", 9, None),  # NULL is a real state (one run)
            ("h", 10, "ok"),
        ],
    )
    assert got == {
        ("h", 1): ("ok", 1, 7, 2, 0),
        ("h", 2): (None, 8, 9, 2, 0),
        ("h", 3): ("ok", 10, 10, 1, 1),
    }


def test_scd2_per_key_independence(spark):
    got = _scd2(
        spark,
        [("a", 1, "x"), ("a", 2, "y"), ("b", 1, "x"), ("b", 2, "x")],
    )
    assert got == {
        ("a", 1): ("x", 1, 1, 1, 0),
        ("a", 2): ("y", 2, 2, 1, 1),
        ("b", 1): ("x", 1, 2, 2, 1),
    }


def test_overlap_join_with_entity_keys(spark):
    """keys=... adds an equi-key to the bucket join: same time window on
    different entities must NOT match, and the plan stays an equi hash
    join (no cartesian / BNLJ)."""
    left = spark.createDataFrame(
        [("h1", 5, 5), ("h2", 5, 5)], "lh string, ls long, le long"
    )
    right = spark.createDataFrame(
        [("h1", 0, 10, "r1"), ("h2", 20, 30, "r2")],
        "rh string, rs long, re long, rid string",
    )
    out = overlap_join_bucketed(
        left, right, "ls", "le", "rs", "re", bucket_width=4,
        keys=[("lh", "rh")],
    )
    rows = [(r["lh"], r["rid"]) for r in out.collect()]
    assert rows == [("h1", "r1")]  # h2's day-5 point is outside r2
    plan = plan_of(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
