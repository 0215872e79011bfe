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
