"""Water-filling budget allocator (operators/fairness.waterfill_budgets)
and the distributed prefix-sum it rides on
(operators/ranking.with_global_prefix_sum). Cross-engine oracle row in
test_oracle_parity."""

from __future__ import annotations

from docrawl_spark.operators.fairness import waterfill_budgets
from docrawl_spark.operators.ranking import with_global_prefix_sum


def _hosts(spark, demands: dict[str, int], parts: int = 5):
    return spark.createDataFrame(
        list(demands.items()), "host string, demand long"
    ).repartition(parts)


def _waterfill_py(demands: dict[str, int], budget: int) -> dict[str, int]:
    """Independent reimplementation of the spec in the docstring."""
    items = sorted(demands.items(), key=lambda kv: (kv[1], kv[0]))
    n, total = len(items), sum(demands.values())
    if total <= budget:
        return dict(demands)
    pfx, kstar, pstar = 0, 0, 0
    for k, (_, d) in enumerate(items, start=1):
        pfx += d
        if pfx + d * (n - k) <= budget:
            kstar, pstar = k, pfx
    lvl = (budget - pstar) // (n - kstar)
    rem = budget - pstar - lvl * (n - kstar)
    out = {}
    for k, (h, d) in enumerate(items, start=1):
        if k <= kstar:
            out[h] = d
        elif k <= kstar + rem:
            out[h] = lvl + 1
        else:
            out[h] = lvl
    return out


def _run(spark, demands, budget):
    return {
        r["host"]: r["quota"]
        for r in waterfill_budgets(_hosts(spark, demands), budget).collect()
    }


def test_waterfill_hand_case(spark):
    """{1, 5, 10} at budget 8: level 3, one +1 remainder → (1, 4, 3)."""
    assert _run(spark, {"a": 1, "b": 5, "c": 10}, 8) == {"a": 1, "b": 4, "c": 3}


def test_waterfill_budget_not_binding(spark):
    d = {"a": 3, "b": 7, "c": 2}
    assert _run(spark, d, 100) == d


def test_waterfill_zero_demand_and_kstar_edge(spark):
    """A zero-demand host stays at 0; remainder lands on the first
    clipped host in (demand, host) order."""
    assert _run(spark, {"a": 0, "b": 10, "c": 10}, 5) == {"a": 0, "b": 3, "c": 2}


def test_waterfill_matches_independent_python(spark):
    """Uneven synthetic demands across several budgets: exact match to
    the pure-Python spec; total = min(budget, Σd); quota ≤ demand;
    clipped quotas within 1 of each other (max-min fairness)."""
    demands = {f"h{i:02d}": (i * 7) % 23 for i in range(30)}
    for budget in (1, 17, 100, 150, 10_000):
        got = _run(spark, demands, budget)
        assert got == _waterfill_py(demands, budget)
        assert sum(got.values()) == min(budget, sum(demands.values()))
        assert all(got[h] <= demands[h] for h in demands)
        clipped = [q for h, q in got.items() if q < demands[h]]
        if clipped:
            assert max(clipped) - min(clipped) <= 1


def test_global_prefix_sum_matches_sorted_python(spark):
    """rank is the 1-based position and prefix the inclusive running
    sum in (v, key) order, regardless of input partitioning."""
    rows = [(f"k{i:02d}", (i * 13) % 7 + 1) for i in range(40)]
    df = spark.createDataFrame(rows, "key string, v long").repartition(7)
    got = sorted(
        (r["rank"], r["key"], r["prefix"])
        for r in with_global_prefix_sum(df, ["v", "key"], "v").collect()
    )
    cum, expected = 0, []
    for k, (key, v) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])), start=1):
        cum += v
        expected.append((k, key, cum))
    assert got == expected
