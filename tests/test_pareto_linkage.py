"""Skyline (datapipe/pareto) and edit-distance-1 linkage
(datapipe/linkage): brute-force references, tie semantics, recall
completeness of the symmetric-delete block, and plan shapes."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from docrawl_spark.datapipe.linkage import deletion_variants_col, edit1_pairs
from docrawl_spark.datapipe.pareto import skyline_2d

from test_determinism_and_plans import plan_of


def _brute_skyline(rows):
    out = set()
    for rid, mx, mn in rows:
        dominated = any(
            bmx >= mx and bmn <= mn and (bmx > mx or bmn < mn)
            for _, bmx, bmn in rows
        )
        if not dominated:
            out.add(rid)
    return out


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_skyline_brute_and_ties(spark):
    rows = [
        (1, 5, 100), (2, 5, 100),  # tie at a skyline point: both kept
        (3, 5, 120),               # dominated at same size
        (4, 7, 100),               # dominates 1/2 on size? no: equal price,
                                   # larger size -> strictly better -> 1,2 out
        (5, 9, 150), (6, 2, 40), (7, 9, 150),
    ]
    df = spark.createDataFrame(rows, "rid int, mx int, mn long")
    got = {r["rid"] for r in skyline_2d(df, "mx", "mn").collect()}
    assert got == _brute_skyline(rows)
    assert {4, 5, 6, 7} == got  # ties 5/7 both kept; 1/2 dominated by 4


def test_skyline_nulls_excluded_and_plan(spark):
    rows = [(1, 3, 10), (2, None, 5), (3, 4, None), (4, 1, 1)]
    df = spark.createDataFrame(rows, "rid int, mx int, mn long")
    out = skyline_2d(df, "mx", "mn")
    assert {r["rid"] for r in out.collect()} == _brute_skyline(
        [(1, 3, 10), (4, 1, 1)]
    )
    plan = plan_of(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashAggregate" in plan  # the per-value min dim


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=1, max_size=20
    )
)
def test_skyline_hypothesis(spark, pts):
    rows = [(i, mx, mn) for i, (mx, mn) in enumerate(pts)]
    df = spark.createDataFrame(rows, "rid int, mx int, mn long")
    got = {r["rid"] for r in skyline_2d(df, "mx", "mn").collect()}
    assert got == _brute_skyline(rows)


def test_deletion_variants_exact(spark):
    df = spark.createDataFrame([("abc",), ("",), ("x",)], "s string")
    got = {
        r["s"]: r["v"]
        for r in df.select("s", deletion_variants_col(F.col("s")).alias("v")).collect()
    }
    assert got["abc"] == ["abc", "bc", "ac", "ab"]
    assert got[""] == [""]
    assert got["x"] == ["x", ""]


def test_edit1_pairs_reference_and_plan(spark):
    vals = [
        "host.com", "host.co", "hosts.com", "hoat.com",  # ed1 cluster
        "ab", "ba",            # ed2 via shared variants (false candidate)
        "zzz", "zzz",          # duplicate input rows: not a pair
        "aa", "aaa", "aaaa",   # chain: consecutive ed1, ends ed2
    ]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    out = edit1_pairs(df, "s")
    got = {(r["a"], r["b"]) for r in out.collect()}
    uni = sorted(set(vals))
    want = {
        (a, b)
        for i, a in enumerate(uni)
        for b in uni[i + 1 :]
        if _lev(a, b) == 1
    }
    assert got == want
    assert ("ab", "ba") not in got  # verify step kills ed-2 false candidates
    assert ("aa", "aaaa") not in got
    plan = plan_of(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=0, max_size=5), min_size=1, max_size=15
    )
)
def test_edit1_recall_complete_hypothesis(spark, vals):
    """Every true ed==1 pair must be found (the block is recall-complete,
    unlike LSH) and nothing else."""
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {(r["a"], r["b"]) for r in edit1_pairs(df, "s").collect()}
    uni = sorted(set(vals))
    want = {
        (a, b)
        for i, a in enumerate(uni)
        for b in uni[i + 1 :]
        if _lev(a, b) == 1
    }
    assert got == want
