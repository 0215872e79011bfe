"""Warehouse data-quality audits (datapipe/audit) and classifier
calibration (datapipe/classifier.calibration_bins): hand-checked
profiles, orphan multiplicity weighting, exact reliability cells."""

from docrawl_spark.datapipe.audit import column_profile, fk_orphan_audit
from docrawl_spark.datapipe.classifier import calibration_bins


def test_column_profile_hand(spark):
    rows = [
        (1, "b", None),
        (2, "a", None),
        (2, None, None),
        (None, "a", None),
    ]
    df = spark.createDataFrame(rows, "id int, s string, dead string")
    got = {r["col_name"]: r for r in column_profile(df, ["id", "s", "dead"]).collect()}
    assert got["id"]["n_rows"] == 4
    assert got["id"]["n_nulls"] == 1
    assert got["id"]["n_distinct"] == 2  # distinct skips null
    assert (got["id"]["min_s"], got["id"]["max_s"]) == ("1", "2")
    assert got["s"]["n_nulls"] == 1
    assert got["s"]["n_distinct"] == 2
    assert (got["s"]["min_s"], got["s"]["max_s"]) == ("a", "b")
    # all-null column: zero distinct, empty-string min/max (COALESCE)
    assert got["dead"]["n_nulls"] == 4
    assert got["dead"]["n_distinct"] == 0
    assert (got["dead"]["min_s"], got["dead"]["max_s"]) == ("", "")


def test_fk_orphan_audit_multiplicity_and_nulls(spark):
    fact = spark.createDataFrame(
        [(10,), (10,), (99,), (99,), (99,), (None,)], "fk int"
    )
    dim = spark.createDataFrame([(10,), (11,)], "pk int")
    [r] = fk_orphan_audit([("edge", fact, "fk", dim, "pk")]).collect()
    assert r["fk_edge"] == "edge"
    assert r["n_rows"] == 6
    assert r["n_null_fk"] == 1  # null FK is excused, not an orphan
    assert r["n_orphans"] == 3  # 99 appears 3x: rows, not keys


def test_fk_orphan_audit_clean_edge_and_union(spark):
    fact = spark.createDataFrame([(1,), (2,)], "fk int")
    dim = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    out = fk_orphan_audit(
        [("clean", fact, "fk", dim, "pk"), ("clean2", fact, "fk", dim, "pk")]
    ).collect()
    assert sorted(r["fk_edge"] for r in out) == ["clean", "clean2"]
    assert all(r["n_orphans"] == 0 and r["n_null_fk"] == 0 for r in out)


def test_calibration_bins_hand(spark):
    # bin 0: conf {0, 50000}, labels F,F -> acc 0, mean_conf 25000
    # bin 9: conf {950000, 1000000} (1e6 clamps into bin 9 via least),
    #        labels T,F -> acc 500000, mean_conf 975000
    rows = [
        (0, False),
        (50000, False),
        (950000, True),
        (1000000, False),
        (None, True),       # null conf drops
        (500000, None),     # null label drops
    ]
    df = spark.createDataFrame(rows, "conf long, y boolean")
    got = {r["bin"]: r for r in calibration_bins(df, "conf", "y").collect()}
    assert set(got) == {0, 9}
    b0, b9 = got[0], got[9]
    assert (b0["n"], b0["n_pos"], b0["acc_ppm"], b0["mean_conf_ppm"]) == (
        2, 0, 0, 25000
    )
    assert b0["gap_ppm"] == 25000 and b0["ece_num"] == 50000
    assert (b9["n"], b9["n_pos"], b9["acc_ppm"], b9["mean_conf_ppm"]) == (
        2, 1, 500000, 975000
    )
    assert b9["gap_ppm"] == 475000 and b9["ece_num"] == 950000


def test_audit_plan_shapes(spark, plan_of):
    """Scale shape: the profile is ONE aggregate pass (multi-distinct
    via Expand, no join at all — min(STRING) demotes the agg to
    SortAggregate, the documented benign oracle-mode demotion; with
    no grouping keys it never sorts the corpus); the FK audit's
    orphan detection is a broadcast-able ANTI equi-join, never a
    cartesian (the single-row crossJoin stitches are the documented
    benign BNLJ)."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    prof = column_profile(docs, ["doc_id", "lang", "source"])
    pplan = plan_of(prof)
    assert "Expand" in pplan  # one-pass multi-distinct, not per-column scans
    assert "Join" not in pplan.replace("BroadcastNestedLoopJoin", "")
    # the corpus is read ONCE (simple mode prints each node once)
    simple = prof._jdf.queryExecution().executedPlan().toString()
    assert simple.count("Scan parquet") == 1

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    audit = fk_orphan_audit(
        [("e", li, "l_orderkey", orders, "o_orderkey")]
    )
    aplan = plan_of(audit)
    assert "CartesianProduct" not in aplan
    assert "LeftAnti" in aplan


def test_calibration_plan_shape(spark, plan_of):
    """The reliability cells are one projection + one HashAggregate:
    no window, no join, no SortAggregate demotion (all-integer agg)."""
    df = spark.createDataFrame(
        [(100000 * i, i % 2 == 0) for i in range(10)], "conf long, y boolean"
    )
    plan = plan_of(calibration_bins(df, "conf", "y"))
    assert "HashAggregate" in plan
    assert "SortAggregate" not in plan
    assert "Window" not in plan
    assert "Join" not in plan


def test_rebalance_audit_python_reference_and_guard(spark):
    """Exact mirror of the md5 placement math in pure Python: both
    policies' moved counts must match, rendezvous must move at most
    what mod moves on this fixture, and n_old == n_new moves nothing."""
    import hashlib

    import pytest

    from docrawl_spark.datapipe.audit import rebalance_audit

    ids = [str(i) for i in range(300)]

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def rdv_owner(i, n):
        best = max(((h60(f"shard:{s}:{i}") // 32) * 32 + s for s in range(n)))
        return best % 32

    mod_moved = sum(1 for i in ids if h60(i) % 8 != h60(i) % 10)
    rdv_moved = sum(1 for i in ids if rdv_owner(i, 8) != rdv_owner(i, 10))

    df = spark.createDataFrame([(i,) for i in ids], "doc_id string")
    got = {r["policy"]: r for r in rebalance_audit(df, "doc_id", 8, 10).collect()}
    assert got["mod"]["n_moved"] == mod_moved
    assert got["rendezvous"]["n_moved"] == rdv_moved
    assert got["rendezvous"]["n_moved"] < got["mod"]["n_moved"]
    assert all(r["n_docs"] == 300 for r in got.values())

    same = {r["policy"]: r["n_moved"]
            for r in rebalance_audit(df, "doc_id", 10, 10).collect()}
    assert same == {"mod": 0, "rendezvous": 0}

    with pytest.raises(ValueError):
        rebalance_audit(df, "doc_id", 8, 64)


def test_rebalance_audit_dup_ids_and_empty(spark):
    """Both policies count DISTINCT keys (comparable ppms even on
    non-unique id columns) and an empty input yields zero-count rows
    instead of a divide-by-zero."""
    from docrawl_spark.datapipe.audit import rebalance_audit

    dup = spark.createDataFrame([("a",), ("a",), ("b",)], "doc_id string")
    got = {r["policy"]: r for r in rebalance_audit(dup, "doc_id", 8, 10).collect()}
    assert got["mod"]["n_docs"] == 2
    assert got["rendezvous"]["n_docs"] == 2

    empty = spark.createDataFrame([], "doc_id string")
    rows = {r["policy"]: r for r in rebalance_audit(empty, "doc_id", 8, 10).collect()}
    assert set(rows) == {"mod", "rendezvous"}
    assert all(
        (r["n_docs"], r["n_moved"], r["moved_ppm"]) == (0, 0, 0)
        for r in rows.values()
    )


def test_audit_input_guards(spark):
    import pytest

    from docrawl_spark.datapipe.audit import column_profile, fk_orphan_audit
    from docrawl_spark.datapipe.classifier import calibration_bins

    df = spark.createDataFrame([(1,)], "a int")
    with pytest.raises(ValueError):
        column_profile(df, [])
    with pytest.raises(ValueError):
        column_profile(df, ["bad name"])
    with pytest.raises(ValueError):
        fk_orphan_audit([])
    with pytest.raises(ValueError):
        calibration_bins(df.selectExpr("a as conf", "a > 0 as y"), "conf", "y", n_bins=0)
