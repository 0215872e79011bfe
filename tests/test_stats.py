"""Integer-exact chi-square contingency cells (datapipe/stats):
hand-computed integer reference, zero-cell materialization, float
cross-check, null exclusion, and row-score consistency."""

from fractions import Fraction

from docrawl_spark.datapipe.stats import chisq_cells, chisq_row_scores


def _ref_cells(pairs):
    """Pure-Python integer reference (Fraction-exact, then truncated to
    micro units exactly like the engine's div)."""
    from collections import Counter

    o = Counter(pairs)
    rt = Counter(r for r, _ in pairs)
    ct = Counter(c for _, c in pairs)
    n = len(pairs)
    out = {}
    for r in rt:
        for c in ct:
            obs = o.get((r, c), 0)
            e_micro = (rt[r] * ct[c] * 10**6) // n
            diff = obs * n - rt[r] * ct[c]
            chi_micro = (diff * diff * 10**6) // (n * rt[r] * ct[c])
            out[(r, c)] = (obs, e_micro, chi_micro)
    return out


def test_chisq_cells_hand_reference_and_zero_cells(spark):
    pairs = (
        [("s1", "en")] * 8 + [("s1", "de")] * 2
        + [("s2", "en")] * 3 + [("s2", "de")] * 7
        + [("s3", "en")] * 5  # s3 never emits de: zero cell must appear
    )
    df = spark.createDataFrame(pairs, "source string, lang string")
    got = {
        (r["source"], r["lang"]): (
            r["observed"], r["expected_micro"], r["chi2_cell_micro"]
        )
        for r in chisq_cells(df, "source", "lang").collect()
    }
    assert got == _ref_cells(pairs)
    assert got[("s3", "de")][0] == 0  # zero cell present
    assert got[("s3", "de")][2] > 0  # and it contributes deviation

    # float cross-check: micro cells within 1 micro of the exact value
    from collections import Counter

    o = Counter(pairs)
    rt, ct, n = Counter(r for r, _ in pairs), Counter(c for _, c in pairs), len(pairs)
    for (r, c), (_, _, chi_micro) in got.items():
        e = Fraction(rt[r] * ct[c], n)
        exact = (Fraction(o.get((r, c), 0)) - e) ** 2 / e
        assert 0 <= exact * 10**6 - chi_micro < 1


def test_chisq_nulls_excluded_and_row_scores(spark):
    rows = [("s1", "en"), ("s1", None), (None, "de"), ("s2", "de"), ("s2", "en")]
    df = spark.createDataFrame(rows, "source string, lang string")
    cells = chisq_cells(df, "source", "lang").collect()
    assert sum(r["observed"] for r in cells) == 3  # null rows dropped
    scores = {
        r["source"]: (r["row_total"], r["chi2_row_micro"])
        for r in chisq_row_scores(df, "source", "lang").collect()
    }
    by_src = {}
    for r in cells:
        t, chi = by_src.get(r["source"], (0, 0))
        by_src[r["source"]] = (t + r["observed"], chi + r["chi2_cell_micro"])
    assert scores == by_src


def test_gini_impurity_hand(spark):
    from docrawl_spark.datapipe.stats import gini_impurity

    rows = (
        [("pure", "en")] * 5
        + [("uni4", "a"), ("uni4", "b"), ("uni4", "c"), ("uni4", "d")]
        + [("skew", "en")] * 9 + [("skew", "de")]
        + [("nul", None), (None, "x")]
    )
    df = spark.createDataFrame(rows, "source string, lang string")
    got = {
        r["source"]: (r["n_rows"], r["n_labels"], r["gini_ppm"])
        for r in gini_impurity(df, "source", "lang").collect()
    }
    assert got["pure"] == (5, 1, 0)
    assert got["uni4"] == (4, 4, 750000)  # uniform k=4 -> 1 - 1/4
    # skew: 1 - (81+1)/100 = 0.18 exactly
    assert got["skew"] == (10, 2, 180000)
    assert set(got) == {"pure", "uni4", "skew"}  # null keys excluded


def test_rank_drift_stats_hand(spark):
    from docrawl_spark.datapipe.stats import rank_drift_stats

    # A = [1, 2, 2], B = [2, 3]: midranks 1, 3, 3 (tie block 2,3,4),
    # ranksum_A = 7 -> u2_a = 14 - 12 = 2 (U_A = 1: one tie pair at
    # half credit x2 plus the 2>2 half ... exact pair count checked
    # below); KS at v=2: |F_A - F_B| = |1 - 1/2| -> ks_ppm = 500000.
    rows = (
        [("g", True, 1), ("g", True, 2), ("g", True, 2)]
        + [("g", False, 2), ("g", False, 3)]
        + [("solo", True, 1)]          # one-sample group: excluded
        + [("g", None, 9), ("g", True, None), (None, True, 1)]  # nulls
    )
    df = spark.createDataFrame(rows, "g string, a boolean, v long")
    out = rank_drift_stats(df, "g", "a", "v").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["g"], r["n_a"], r["n_b"]) == ("g", 3, 2)
    # exact pair check: U_A = sum over (a,b) of 1[a>b] + 0.5*1[a==b]
    av, bv = [1, 2, 2], [2, 3]
    u2 = sum(2 * (x > y) + (x == y) for x in av for y in bv)
    assert r["u2_a"] == u2 == 2
    assert r["auc_ppm"] == (u2 * 10**6) // (2 * 3 * 2) == 166666
    assert r["ks_num"] == 3 and r["ks_ppm"] == 500000
    # TV cells: v=1 |1*2-0*3|=2, v=2 |2*2-1*3|=1, v=3 |0*2-1*3|=3
    # -> 6; ppm = 6e6 // (2*3*2) = 500000 = (1/3 + 1/6 + 1/2) / 2
    assert r["tv_num"] == 6 and r["tv_ppm"] == 500000


def test_rank_drift_identical_samples_is_half(spark):
    from docrawl_spark.datapipe.stats import rank_drift_stats

    rows = [("g", lab, v) for lab in (True, False) for v in (1, 5, 5, 9)]
    df = spark.createDataFrame(rows, "g string, a boolean, v long")
    r = rank_drift_stats(df, "g", "a", "v").collect()[0]
    assert r["auc_ppm"] == 500000  # identical dists: AUC exactly 1/2
    assert r["ks_num"] == 0 and r["ks_ppm"] == 0
    assert r["tv_num"] == 0 and r["tv_ppm"] == 0


def test_cusum_changepoint_hand(spark):
    from docrawl_spark.datapipe.stats import cusum_changepoint

    # counts per tick: t1 -> 5, t2..t4 -> 1 each; m=4, T=8;
    # dev = |S*m - j*T| = 12, 8, 4, 0 -> peak at t1, ppm = 12e6//32.
    rows = [("g", "t1")] * 5 + [("g", "t2"), ("g", "t3"), ("g", "t4")]
    rows += [("flat", t) for t in ("t1", "t2") for _ in range(3)]
    df = spark.createDataFrame(rows, "g string, t string")
    got = {r["g"]: r for r in cusum_changepoint(df, "g", "t").collect()}
    r = got["g"]
    assert (r["n_ticks"], r["total_rows"], r["change_tick"]) == (4, 8, "t1")
    assert r["cusum_num"] == 12 and r["cusum_ppm"] == 375000
    # perfectly uniform rate: dev 0 everywhere, earliest tick wins
    assert got["flat"]["cusum_num"] == 0
    assert got["flat"]["change_tick"] == "t1"


def test_k_anonymity_hand(spark):
    from docrawl_spark.datapipe.stats import k_anonymity

    # class sizes: (a,x):3  (a,y):1  (b,x):2  (None,x):1 — null is a
    # real quasi-identifier value
    rows = (
        [("a", "x")] * 3 + [("a", "y")] + [("b", "x")] * 2 + [(None, "x")]
    )
    df = spark.createDataFrame(rows, "q1 string, q2 string")
    got = {r["k"]: r for r in k_anonymity(df, ["q1", "q2"], [2, 5]).collect()}
    assert got[2]["n_groups"] == 4 and got[2]["n_rows"] == 7
    assert got[2]["groups_below"] == 2 and got[2]["rows_at_risk"] == 2
    assert got[5]["groups_below"] == 4 and got[5]["rows_at_risk"] == 7
    assert got[2]["min_class_size"] == 1


def test_lorenz_and_gini_hand(spark):
    from docrawl_spark.datapipe.stats import gini_concentration, lorenz_deciles

    # unit counts: u1->1 u2->1 u3->2 u4->4 (n=4, T=8)
    rows = [("u1",)] + [("u2",)] + [("u3",)] * 2 + [("u4",)] * 4
    df = spark.createDataFrame(rows, "u string")
    lz = {r["decile"]: r for r in lorenz_deciles(df, "u").collect()}
    assert len(lz) == 10
    # naive reference: sort counts asc, prefix-sum the first (d*4)//10
    xs = [1, 1, 2, 4]
    for d in range(1, 11):
        r = (d * 4) // 10
        cum = sum(xs[:r])
        assert lz[d]["unit_rank"] == r
        assert lz[d]["cum_rows"] == cum
        assert lz[d]["cum_share_ppm"] == (cum * 10**6) // 8
    g = gini_concentration(df, "u").collect()[0]
    # 2*sum(i*x_i) = 2*(1+2+6+16) = 50; (n+1)*T = 40; /(n*T)=10/32
    assert (g["n_units"], g["tot_rows"], g["gini_ppm"]) == (4, 8, 312500)


def test_gini_concentration_equal_counts_is_zero(spark):
    from docrawl_spark.datapipe.stats import gini_concentration

    rows = [(f"u{i}",) for i in range(5) for _ in range(3)]
    df = spark.createDataFrame(rows, "u string")
    assert gini_concentration(df, "u").collect()[0]["gini_ppm"] == 0


def test_mann_kendall_hand(spark):
    from docrawl_spark.datapipe.stats import mann_kendall_trend

    rows = []
    # up: counts 1,2,3,4 -> S=6, pairs=6, tau=+1e6
    for i, c in enumerate([1, 2, 3, 4]):
        rows += [("up", f"t{i}")] * c
    # down: counts 4,3,2,1 -> S=-6, tau=-1e6 (sign-symmetric exact)
    for i, c in enumerate([4, 3, 2, 1]):
        rows += [("down", f"t{i}")] * c
    # mixed: counts 2,1,1 -> pairs (2,1)-1 (2,1)-1 (1,1)0 -> S=-2,
    # pairs 3, ties 1, tau = -(2e6 div 3) = -666666 (truncation
    # symmetric on BOTH engines via the ABS route)
    for i, c in enumerate([2, 1, 1]):
        rows += [("mixed", f"t{i}")] * c
    rows += [("solo", "t0")]  # single tick: no pairs -> excluded
    df = spark.createDataFrame(rows, "g string, t string")
    got = {r["g"]: r for r in mann_kendall_trend(df, "g", "t").collect()}
    assert got["up"]["s_num"] == 6 and got["up"]["tau_ppm"] == 1000000
    assert got["down"]["s_num"] == -6 and got["down"]["tau_ppm"] == -1000000
    m = got["mixed"]
    assert (m["s_num"], m["n_pairs"], m["n_tie_pairs"]) == (-2, 3, 1)
    assert m["tau_ppm"] == -666666
    assert "solo" not in got


def test_trend_ols_hand(spark):
    from docrawl_spark.datapipe.stats import trend_ols

    rows = []
    for i, c in enumerate([1, 2, 3]):       # slope exactly +1/tick
        rows += [("up", f"t{i}")] * c
    for i, c in enumerate([3, 2, 1]):       # slope exactly -1/tick
        rows += [("down", f"t{i}")] * c
    for i, c in enumerate([5, 5, 5]):       # flat: slope 0
        rows += [("flat", f"t{i}")] * c
    rows += [("solo", "t0")] * 7            # m=1: excluded (den 0)
    df = spark.createDataFrame(rows, "g string, t string")
    got = {r["g"]: r for r in trend_ols(df, "g", "t").collect()}
    up = got["up"]
    assert (up["slope_num"], up["slope_den"]) == (6, 6)
    assert up["slope_micro"] == 1000000 and up["total_rows"] == 6
    assert got["down"]["slope_micro"] == -1000000
    assert got["flat"]["slope_num"] == 0 and got["flat"]["slope_micro"] == 0
    assert "solo" not in got


def test_dispersion_hand(spark):
    from docrawl_spark.datapipe.stats import dispersion_stats

    rows = []
    # poissonish: ticks 0,2 counts 3,3 over span 3 (tick 1 = zero):
    # var_num = 3*18 - 36 = 18 -> ppm = 18e6 // (3*6) = 1e6
    rows += [("even", 0)] * 3 + [("even", 2)] * 3
    # bursty: ticks 0:4, 3:1, span 4: (4*17 - 25) = 43 -> 43e6//20
    rows += [("burst", 0)] * 4 + [("burst", 3)]
    # single tick: span 1, var 0 -> 0 ppm
    rows += [("one", 5)] * 4
    df = spark.createDataFrame(rows, "g string, t long")
    got = {r["g"]: r for r in dispersion_stats(df, "g", "t").collect()}
    e = got["even"]
    assert (e["n_ticks"], e["span"], e["total_rows"]) == (2, 3, 6)
    assert e["dispersion_ppm"] == 1000000
    assert got["burst"]["dispersion_ppm"] == 43 * 10**6 // 20  # 2150000
    assert got["one"]["dispersion_ppm"] == 0


def test_weighted_quantile_hand(spark):
    from docrawl_spark.datapipe.stats import weighted_quantile

    rows = [
        ("g", 1, 1), ("g", 2, 1), ("g", 10, 2),   # W=4: median at v=2
        ("g", 3, 0),                               # weight 0: excluded
        ("h", 7, 5),                               # single value
        ("z", 9, None),
    ]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    med = {
        r["g"]: (r["total_weight"], r["weighted_quantile"])
        for r in weighted_quantile(df, "g", "v", "w").collect()
    }
    assert med["g"] == (4, 2)       # cumw(2)=2, 2*2 >= 4*1
    assert med["h"] == (5, 7)
    assert "z" not in med           # null weight excluded -> empty
    q3 = {
        r["g"]: r["weighted_quantile"]
        for r in weighted_quantile(df, "g", "v", "w", 3, 4).collect()
    }
    assert q3["g"] == 10            # need cumw*4 >= 4*3 -> cumw >= 3


def test_agreement_kappa_hand(spark):
    from docrawl_spark.datapipe.stats import agreement_kappa

    # N=50, diag=35 (po=0.7); margins a: 30/20, b: 25/25 ->
    # pe_num = 30*25 + 20*25 = 1250 (pe=0.5);
    # kappa = (50*35 - 1250) / (2500 - 1250) = 0.4 exactly
    rows = (
        [("g", 1, 1)] * 20 + [("g", 0, 0)] * 15
        + [("g", 1, 0)] * 10 + [("g", 0, 1)] * 5
    )
    df = spark.createDataFrame(rows, "g string, a int, b int")
    [r] = agreement_kappa(df, "g", "a", "b").collect()
    assert (r["n_rows"], r["po_ppm"], r["pe_ppm"], r["kappa_ppm"]) == (
        50, 700000, 500000, 400000
    )


def test_agreement_kappa_negative_and_excluded(spark):
    from docrawl_spark.datapipe.stats import agreement_kappa

    # systematic disagreement: kappa = -1 exactly
    rows = [("neg", 1, 0)] * 5 + [("neg", 0, 1)] * 5
    # both raters constant with the SAME single label: denominator 0,
    # group excluded
    rows += [("const", 1, 1)] * 4
    # null rater rows drop
    rows += [("neg", None, 1), ("neg", 1, None)]
    df = spark.createDataFrame(rows, "g string, a int, b int")
    got = {r["g"]: r for r in agreement_kappa(df, "g", "a", "b").collect()}
    assert set(got) == {"neg"}
    assert got["neg"]["n_rows"] == 10
    assert got["neg"]["kappa_ppm"] == -1000000
    assert got["neg"]["po_ppm"] == 0


def test_autocorr_perfect_weekly_and_antiphase(spark):
    from docrawl_spark.datapipe.stats import autocorr_lag

    rows = []
    # period-7 spike train over a 28-day span: lag-7 r = +1 exactly
    for t in range(28):
        rows += [("weekly", t)] * (5 if t % 7 == 0 else 1)
    # period-14 block wave: lag-7 pairs are perfectly anti-phase,
    # r = -1 exactly
    for t in range(28):
        rows += [("anti", t)] * (5 if (t // 7) % 2 == 0 else 1)
    df = spark.createDataFrame(rows, "g string, t int")
    got = {r["g"]: r for r in autocorr_lag(df, "g", "t", lag=7).collect()}
    assert got["weekly"]["n_pairs"] == 21
    assert got["weekly"]["r2_signed_ppm"] == 1000000
    assert got["anti"]["r2_signed_ppm"] == -1000000


def test_autocorr_implicit_zero_days_carry_the_cycle(spark):
    from docrawl_spark.datapipe.stats import autocorr_lag

    # Mondays-only feed: rows exist ONLY at t = 0,7,14,21 — the six
    # silent days each week are implicit zeros, and with them the
    # series is perfectly weekly (without them there would be no
    # variance at all)
    rows = [("mon", t) for t in (0, 7, 14, 21) for _ in range(3)]
    # constant daily feed: zero variance in both windows -> excluded
    rows += [("flat", t) for t in range(20)]
    df = spark.createDataFrame(rows, "g string, t int")
    got = {r["g"]: r for r in autocorr_lag(df, "g", "t", lag=7).collect()}
    assert set(got) == {"mon"}
    assert got["mon"]["n_pairs"] == 15  # span 22 minus lag 7
    assert got["mon"]["r2_signed_ppm"] == 1000000


def test_kappa_and_autocorr_plan_shapes(spark, plan_of):
    """Scale shapes: kappa is cell/margin HashAggregates + dim joins
    (no SortAggregate, no cartesian); autocorr's Σxz is an equi-join
    over the TICK dim (no cartesian), all aggregation hash-based."""
    from docrawl_spark.datapipe.stats import agreement_kappa, autocorr_lag

    rows = [("g", i % 2, (i * 3) % 2) for i in range(40)]
    df = spark.createDataFrame(rows, "g string, a int, b int")
    kplan = plan_of(agreement_kappa(df, "g", "a", "b"))
    assert "HashAggregate" in kplan
    assert "SortAggregate" not in kplan
    assert "CartesianProduct" not in kplan

    tick_rows = [("g", t) for t in range(30) for _ in range(t % 3 + 1)]
    tdf = spark.createDataFrame(tick_rows, "g string, t int")
    aplan = plan_of(autocorr_lag(tdf, "g", "t", lag=7))
    assert "HashAggregate" in aplan
    assert "SortAggregate" not in aplan
    assert "CartesianProduct" not in aplan


def test_poisson_bootstrap_means_hand_and_plan(spark, plan_of):
    """Point estimate is the exact floor mean in micro-units, bounds
    are ordered and bracket-free of the fact table: one explode + one
    (group, rep) HashAggregate, no cartesian, no fact-table window.
    The weights are pure hash functions, so the result is invariant
    under repartitioning."""
    from docrawl_spark.datapipe.stats import poisson_bootstrap_means

    rows = [("a", i, 100 + (i * 7) % 50) for i in range(60)] + [
        ("b", 1000 + i, 2000 + i) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "event_type string, event_id long, vc long")
    out = poisson_bootstrap_means(
        df, "event_type", "vc", "event_id", n_reps=24, salt="boot1"
    )
    got = {r["event_type"]: r.asDict() for r in out.collect()}
    assert set(got) == {"a", "b"}
    for g, grows in (
        ("a", [v for (k, _i, v) in rows if k == "a"]),
        ("b", [v for (k, _i, v) in rows if k == "b"]),
    ):
        r = got[g]
        assert r["n_events"] == len(grows)
        assert r["point_mean_micro"] == (sum(grows) * 10000) // len(grows)
        assert r["n_reps_used"] == 24
        assert r["boot_lo_micro"] <= r["boot_hi_micro"]
        # Poisson weights average 1: replicate means stay in the value
        # envelope, so the order statistics do too.
        assert min(grows) * 10000 <= r["boot_lo_micro"]
        assert r["boot_hi_micro"] <= max(grows) * 10000

    again = poisson_bootstrap_means(
        df.repartition(7, "event_id"),
        "event_type",
        "vc",
        "event_id",
        n_reps=24,
        salt="boot1",
    )
    assert {tuple(r) for r in again.collect()} == {
        tuple(r.asDict().values()) for r in out.collect()
    }

    plan = plan_of(out)
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan
    assert "SortAggregate" not in plan
    assert "Window" not in plan


def test_poisson_bootstrap_quantiles_hand_and_plan(spark, plan_of):
    """The weight-1 replicate reproduces the exact lower median;
    bounds are ordered and inside the value envelope; the result is
    partitioning-invariant; the only window runs over the
    (group, rep, value) cell dim, and nothing is cartesian."""
    from docrawl_spark.datapipe.stats import poisson_bootstrap_quantiles

    vals = [100, 101, 102, 150, 200, 201, 202, 300, 301, 400] * 6
    rows = [("a", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "event_type string, event_id long, vc long")
    out = poisson_bootstrap_quantiles(
        df, "event_type", "vc", "event_id", n_reps=24, salt="bootq1"
    )
    r = out.collect()[0].asDict()
    svals = sorted(vals)
    # lower weighted median with unit weights == value at ceil(n/2)
    exact = svals[(len(svals) + 1) // 2 - 1]
    assert r["n_events"] == len(vals)
    assert r["point_q"] == exact
    assert r["n_reps_used"] == 24
    assert min(vals) <= r["boot_lo_q"] <= r["boot_hi_q"] <= max(vals)

    again = poisson_bootstrap_quantiles(
        df.repartition(5, "event_id"),
        "event_type",
        "vc",
        "event_id",
        n_reps=24,
        salt="bootq1",
    ).collect()[0].asDict()
    assert again == r

    plan = plan_of(out)
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------- KS drift


def test_ks_two_sample_hand_reference(spark):
    from docrawl_spark.datapipe.stats import ks_two_sample

    rows = [("g", v, 0) for v in [1, 2, 3, 4]] + [
        ("g", v, 1) for v in [3, 4, 5, 6]
    ]
    df = spark.createDataFrame(rows, "g string, v long, side int")
    out = ks_two_sample(df, "g", "v", "side").collect()
    assert len(out) == 1
    r = out[0]
    # cumulative A over v=1..6: 1,2,3,4,4,4; B: 0,0,1,2,3,4 (n_a=n_b=4)
    # dnum = |A*4 - B*4| = 4,8,8,8,4,0 -> max 8 first at v=2
    assert (r.n_a, r.n_b) == (4, 4)
    assert r.ks_ppm == (8 * 1000000) // 16  # D = 0.5
    assert r.ks_at == 2


def test_ks_two_sample_identical_and_excluded_groups(spark):
    from docrawl_spark.datapipe.stats import ks_two_sample

    rows = (
        [("same", v, 0) for v in [10, 20, 30]]
        + [("same", v, 1) for v in [10, 20, 30]]
        + [("onesided", v, 0) for v in [1, 2]]  # no side-1 rows: excluded
    )
    df = spark.createDataFrame(rows, "g string, v long, side int")
    got = {r.g: r for r in ks_two_sample(df, "g", "v", "side").collect()}
    assert set(got) == {"same"}
    assert got["same"].ks_ppm == 0
    assert got["same"].ks_at == 10  # deterministic tie-break: min lattice v


def test_ks_two_sample_disjoint_is_full_distance(spark):
    from docrawl_spark.datapipe.stats import ks_two_sample

    rows = [("g", v, 0) for v in [1, 2]] + [("g", v, 1) for v in [5, 6]]
    df = spark.createDataFrame(rows, "g string, v long, side int")
    r = ks_two_sample(df, "g", "v", "side").collect()[0]
    assert r.ks_ppm == 1000000  # fully separated distributions
    assert r.ks_at == 2


# ------------------------------------------------------------- Theil-Sen


def _ts_frame(spark, ticks):
    """ticks: list of (g, t, y) -> one row per unit of y."""
    rows = [(g, t) for (g, t, y) in ticks for _ in range(y)]
    return spark.createDataFrame(rows, "g string, t long")


def test_theil_sen_hand_reference_with_gap(spark):
    from docrawl_spark.datapipe.stats import theil_sen_trend

    # y = 2,4,6,7 at t = 0,1,2,10 — pairwise micro-slopes:
    # 2e6, 2e6, 5e5, 2e6, 333333, 125000 -> doubled sorted
    # [25e4, 666666, 1e6, 4e6, 4e6, 4e6], median = (1e6+4e6)/2
    df = _ts_frame(spark, [("g", 0, 2), ("g", 1, 4), ("g", 2, 6), ("g", 10, 7)])
    r = theil_sen_trend(df, "g", "t").collect()[0]
    assert (r.n_ticks, r.n_pairs) == (4, 6)
    assert r.slope_med2_micro == 2500000


def test_theil_sen_negative_slope_sign_symmetric(spark):
    from docrawl_spark.datapipe.stats import theil_sen_trend

    df = _ts_frame(spark, [("g", 0, 5), ("g", 1, 3), ("g", 2, 1)])
    r = theil_sen_trend(df, "g", "t").collect()[0]
    assert r.slope_med2_micro == -4000000  # all pairwise slopes = -2/tick


def test_theil_sen_robust_to_single_burst_day(spark):
    from docrawl_spark.datapipe.stats import theil_sen_trend, trend_ols

    # flat series y=3 except one 100x bot-storm day
    ticks = [("g", t, 3) for t in range(9)] + [("g", 9, 300)]
    df = _ts_frame(spark, ticks)
    ts = theil_sen_trend(df, "g", "t").collect()[0]
    ols = trend_ols(df, "g", "t").collect()[0]
    assert ts.slope_med2_micro == 0  # median slope unmoved by the burst
    assert ols.slope_micro > 1000000  # OLS dragged hard by the same day


# ------------------------------------------------------------ l-diversity


def test_l_diversity_hand_reference(spark):
    from docrawl_spark.datapipe.stats import l_diversity

    rows = [
        # class (en, 1): 3 rows, all source A -> diversity 1
        ("en", 1, "A"), ("en", 1, "A"), ("en", 1, "A"),
        # class (en, 2): 2 rows, sources A, B -> diversity 2
        ("en", 2, "A"), ("en", 2, "B"),
        # class (de, 1): 2 rows, one NULL sensitive -> diversity 1,
        # but BOTH rows count as exposed members
        ("de", 1, "C"), ("de", 1, None),
        # class (NULL, 9): null quasi is a real class, diversity 1
        (None, 9, "D"),
    ]
    df = spark.createDataFrame(rows, "lang string, b long, src string")
    out = {
        r["l"]: r for r in l_diversity(df, ["lang", "b"], "src", [2, 3]).collect()
    }
    assert out[2]["n_classes"] == 4 and out[2]["n_rows"] == 8
    # classes below l=2: (en,1), (de,1), (NULL,9) -> 3+2+1 = 6 rows
    assert out[2]["classes_below"] == 3
    assert out[2]["rows_at_risk"] == 6
    assert out[2]["min_diversity"] == 1
    # l=3: (en,2) with diversity 2 also falls below
    assert out[3]["classes_below"] == 4
    assert out[3]["rows_at_risk"] == 8


# ------------------------------------------------------------- MRR


def test_retrieval_mrr_hand_reference(spark):
    from docrawl_spark.datapipe.search import retrieval_mrr

    ranked = spark.createDataFrame(
        [
            # q1: first hit at rank 3; two hits total in top-5
            (1, "a", 1), (1, "b", 2), (1, "c", 3), (1, "d", 4), (1, "e", 5),
            # q2: no relevant docs at all
            (2, "x", 1), (2, "y", 2),
            # q3: hit at rank 1
            (3, "m", 1), (3, "n", 2),
        ],
        "query_id int, doc_id string, rank int",
    )
    qrels = spark.createDataFrame(
        [(1, "c", 2), (1, "e", 1), (1, "zz", 3), (3, "m", 1), (2, "y", 0)],
        "query_id int, doc_id string, rel int",
    )
    out = {r["query_id"]: r for r in retrieval_mrr(ranked, qrels, k=5).collect()}
    assert out[1]["first_hit_rank"] == 3
    assert out[1]["rr_ppm"] == 1000000 // 3
    assert out[1]["n_hits"] == 2
    assert out[1]["precision_ppm"] == 2 * 1000000 // 5
    assert out[2]["first_hit_rank"] == 0 and out[2]["rr_ppm"] == 0
    assert out[3]["rr_ppm"] == 1000000


# ------------------------------------------------------------- hazard


def test_discrete_hazard_hand_reference(spark):
    from docrawl_spark.datapipe.stats import discrete_hazard

    df = spark.createDataFrame([(0,), (1,), (1,), (3,)], "dur long")
    out = {r["dur"]: r for r in discrete_hazard(df, "dur").collect()}
    assert out[0]["n_at_risk"] == 4 and out[0]["n_ended"] == 1
    assert out[0]["hazard_ppm"] == 250000
    assert out[0]["survival_ppm"] == 750000
    assert out[1]["n_at_risk"] == 3 and out[1]["n_ended"] == 2
    assert out[1]["hazard_ppm"] == 666666
    assert out[1]["survival_ppm"] == 250000
    assert out[3]["n_at_risk"] == 1 and out[3]["hazard_ppm"] == 1000000
    assert out[3]["survival_ppm"] == 0


# ----------------------------------------------------- equi-depth hist


def test_equi_depth_histogram_hand_reference(spark):
    from docrawl_spark.datapipe.stats import equi_depth_histogram

    # 8 rows, k=4 -> boundaries at cum >= 2,4,6,8
    df = spark.createDataFrame(
        [(10,), (10,), (20,), (30,), (40,), (40,), (50,), (60,)], "v long"
    )
    out = {r["bucket"]: r for r in equi_depth_histogram(df, "v", k=4).collect()}
    assert [out[i]["upper_v"] for i in (1, 2, 3, 4)] == [10, 30, 40, 60]
    assert [out[i]["n_in_bucket"] for i in (1, 2, 3, 4)] == [2, 2, 2, 2]
    assert out[4]["cum_rows"] == 8


def test_equi_depth_histogram_heavy_value_spans_buckets(spark):
    from docrawl_spark.datapipe.stats import equi_depth_histogram

    # one value holds 6 of 8 rows: it is the boundary for buckets 1-3
    # (first of the span carries the rows, the rest are degenerate 0s)
    rows = [(5,)] + [(7,)] * 6 + [(9,)]
    df = spark.createDataFrame(rows, "v long")
    out = {r["bucket"]: r for r in equi_depth_histogram(df, "v", k=4).collect()}
    assert [out[i]["upper_v"] for i in (1, 2, 3, 4)] == [7, 7, 7, 9]
    assert out[1]["n_in_bucket"] == 7  # the hot-value signal
    assert out[2]["n_in_bucket"] == 0 and out[3]["n_in_bucket"] == 0
    assert out[4]["n_in_bucket"] == 1


# ------------------------------------------- session-8 property tests


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.sampled_from(["a", "b", None])),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    )
)
def test_scd2_matches_python_reference(spark, obs):
    """Random observation sequences: run lengths, versions, and
    is_current must equal a pure-Python fold."""
    from docrawl_spark.datapipe.intervals import scd2_intervals

    df = spark.createDataFrame(
        [("k", t, a) for t, a in obs], "k string, t long, a string"
    )
    got = {
        r["version"]: (r["a"], r["valid_from"], r["valid_to"], r["n_obs"],
                       r["is_current"])
        for r in scd2_intervals(df, "k", "t", "a").collect()
    }
    runs = []
    for t, a in sorted(obs):
        if runs and runs[-1][0] == a:
            runs[-1][2] = t
            runs[-1][3] += 1
        else:
            runs.append([a, t, t, 1])
    expect = {
        i + 1: (a, lo, hi, n, 1 if i == len(runs) - 1 else 0)
        for i, (a, lo, hi, n) in enumerate(runs)
    }
    assert got == expect


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(0, 400), min_size=1, max_size=30),
    st.sampled_from([50, 100, 333]),
)
def test_pps_telescoping_invariant(spark, weights, step):
    """Sum of n_hits always equals total_weight div step, regardless
    of weights or step — the Horvitz-Thompson exactness property."""
    from docrawl_spark.datapipe.sampling import pps_systematic_sample

    rows = [("g", i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "src string, id long, w long")
    out = pps_systematic_sample(df, "src", "id", "w", step=step).collect()
    assert sum(r["n_hits"] for r in out) == sum(weights) // step


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(0, 50), min_size=1, max_size=40),
    st.sampled_from([2, 4, 7]),
)
def test_equi_depth_matches_python_reference(spark, vals, k):
    """Boundaries equal the pure-Python nearest-rank quantiles and
    bucket counts always sum to n."""
    from docrawl_spark.datapipe.stats import equi_depth_histogram

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    out = sorted(
        equi_depth_histogram(df, "v", k=k).collect(),
        key=lambda r: r["bucket"],
    )
    s = sorted(vals)
    n = len(s)
    import math

    expect_upper = [s[math.ceil(i * n / k) - 1] for i in range(1, k + 1)]
    assert [r["upper_v"] for r in out] == expect_upper
    assert sum(r["n_in_bucket"] for r in out) == n
    assert [r["bucket"] for r in out] == list(range(1, k + 1))


# --------------------------------------------------------- day gaps


def test_events_day_gaps_finds_interior_outages(spark, tmp_path):
    """sf0.01 events have no missing days (the driver row is a
    0-row parity check), so prove the semantics on a fixture with
    real outages: interior gaps reported inclusively, edges ignored."""
    from pyspark.sql import functions as F

    from docrawl_spark.plans.driver_queries import q_events_day_gaps

    rows = []
    for d in [1, 2, 5, 6, 10]:  # gaps: 3-4 and 7-9
        rows.append((d, "2024-01-%02d 12:00:00" % d, 1, "click", 1.0, "{}"))
    rows.append((99, "2024-01-03 12:00:00", 2, "view", 1.0, "{}"))  # other type
    df = spark.createDataFrame(
        rows,
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double, props string",
    ).select(
        "event_id",
        F.to_timestamp("ts_s").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    out = {
        (r["event_type"], r["gap_start"], r["gap_end"], r["gap_days"])
        for r in q_events_day_gaps(spark, str(tmp_path)).collect()
    }
    day1 = 19723  # 2024-01-01 epoch day
    assert out == {
        ("click", day1 + 2, day1 + 3, 2),  # Jan 3-4
        ("click", day1 + 6, day1 + 8, 3),  # Jan 7-9
    }  # 'view' has one day: no interior gap; edges never reported
