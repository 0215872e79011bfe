"""Budget-constrained greedy selection (datapipe/sampling) and
group-vocabulary Jaccard (datapipe/text): hand references, edge
semantics (greedy prefix, cost exclusion, sparse zero-overlap pairs)."""

from pyspark.sql import functions as F

from docrawl_spark.datapipe.sampling import greedy_budget_select
from docrawl_spark.datapipe.text import group_vocab_jaccard


def _sel(spark, rows, budget):
    df = spark.createDataFrame(rows, "g string, id int, score long, cost long")
    out = greedy_budget_select(
        df, group_col="g", id_col="id", score_col="score",
        cost_col="cost", budget=budget,
    )
    return {r["id"]: (r["pick_rank"], r["cum_cost"]) for r in out.collect()}


def test_greedy_prefix_and_budget_edge(spark):
    rows = [
        # g1: ratios 10, 5, 4 (per unit); costs 3, 4, 5; budget 8
        ("g1", 1, 30, 3),   # ratio 10 -> cum 3  kept
        ("g1", 2, 20, 4),   # ratio 5  -> cum 7  kept
        ("g1", 3, 20, 5),   # ratio 4  -> cum 12 dropped (over budget)
        # g2: exact-fit boundary: cum == budget is kept
        ("g2", 4, 80, 8),   # cum 8 == budget -> kept
        ("g2", 5, 10, 1),   # cum 9 -> dropped even though cheap
    ]
    got = _sel(spark, rows, budget=8)
    assert got == {1: (1, 3), 2: (2, 7), 4: (1, 8)}
    # greedy-PREFIX semantics: id 5 (cost 1) is not pulled past the
    # budget-crossing id 4... id 4 fits exactly; 5 crosses and is out


def test_greedy_ties_and_cost_exclusion(spark):
    rows = [
        ("g", 2, 10, 2), ("g", 1, 10, 2),  # equal ratio: id asc wins
        ("g", 3, 99, 0),                   # cost 0: excluded entirely
        ("g", 4, None, 1),                 # null score: excluded
    ]
    got = _sel(spark, rows, budget=2)
    assert got == {1: (1, 2)}


def test_group_vocab_jaccard_hand(spark):
    docs = spark.createDataFrame(
        [
            ("s1", "red green blue"),
            ("s1", "green yellow"),
            ("s2", "green blue black"),
            ("s3", "quartz"),  # disjoint from everything
        ],
        "source string, text string",
    )
    out = group_vocab_jaccard(docs, group_col="source")
    got = {
        (r["source_a"], r["source_b"]): (
            r["n_types_a"], r["n_types_b"], r["n_common"], r["jaccard_ppm"]
        )
        for r in out.collect()
    }
    # s1 vocab {red,green,blue,yellow} (4), s2 {green,blue,black} (3)
    # inter 2, union 5 -> 400000 ppm
    assert got == {("s1", "s2"): (4, 3, 2, 400000)}
    # s3 pairs are absent (sparse zero-overlap), not zero rows
    assert all("s3" not in k for k in got)


def test_group_vocab_jaccard_empty_text_excluded(spark):
    docs = spark.createDataFrame(
        [("a", ""), ("a", "tok"), ("b", "tok")], "source string, text string"
    )
    out = group_vocab_jaccard(docs, group_col="source").collect()
    assert len(out) == 1 and out[0]["jaccard_ppm"] == 1000000


def test_greedy_negative_scores_sign_symmetric(spark):
    """Negative-score ratios must truncate toward zero (the ABS route)
    so Spark and a floor-division mirror order identically: with
    ratio_scale=1, score=-3/cost=2 is ratio -1 (NOT floor's -2) and
    ranks ABOVE an exact ratio -2."""
    df = spark.createDataFrame(
        [("g", 1, -3, 2), ("g", 2, -2, 1)],
        "g string, id int, score long, cost long",
    )
    out = greedy_budget_select(
        df, group_col="g", id_col="id", score_col="score",
        cost_col="cost", budget=10, ratio_scale=1,
    ).collect()
    by_id = {r["id"]: (r["ratio"], r["pick_rank"]) for r in out}
    assert by_id[1] == (-1, 1)   # -3 div 2 -> -1 (toward zero), first
    assert by_id[2] == (-2, 2)


def test_bpe_driver_side_equals_distributed_selection(spark):
    """The driver-side greedy (vocab fits) and the per-round
    distributed argmax (vocab doesn't) must learn the IDENTICAL merge
    table — adversarial corpus: count ties broken lexicographically,
    fused tokens out-ranking remaining pairs ('a b c' makes ('ab','c')
    beat any lower-count pair after round 1), repeats that must not
    re-merge within a round, and non-ASCII tokens (binary collation ≡
    code-point order)."""
    from docrawl_spark.datapipe.text import _bpe_train

    rows = (
        [("abc xy",)] * 100      # (a,b):100,(b,c):100 -> then (ab,c):100
        + [("xyq",)] * 90
        + [("aaaa",)] * 7        # overlapping pairs: aaaa -> (a,a) twice
        + [("éclair café",)] * 3 # non-ASCII collation
    )
    df = spark.createDataFrame(rows, "text string")
    fast, wf_f, wf0_f = _bpe_train(df, n_merges=8)
    slow, wf_s, wf0_s = _bpe_train(df, n_merges=8, driver_vocab_limit=0)
    wf0_f.unpersist()
    wf0_s.unpersist()
    assert fast == slow
    assert len(fast) == 8
    # the fused-token re-rank actually exercised: ('ab','c') chosen
    # while 'xyq''s pairs (90) were pending
    assert ("ab", "c") in [(l, r) for _, l, r, _ in fast]
    # final re-tokenization identical too (encode_stats path)
    a = sorted(map(tuple, wf_f.select("word", "n", "tokstr").collect()))
    b = sorted(map(tuple, wf_s.select("word", "n", "tokstr").collect()))
    assert a == b
