"""Golden-file guards (FIXTURES.md §5): the simulator must keep
reproducing the checked-in goldens — so a change to fixture generation
or simulator semantics can't silently move BOTH sides of the
engine-vs-simulator equality tests."""

from __future__ import annotations

import json
import os

from docrawl_spark.plans.simulator import simulate_crawl
from docrawl_spark.sources.fixtures import generate_web

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_simulator_reproduces_goldens():
    fx = generate_web(seed=42)
    sim = simulate_crawl(fx.documents_raw, fx.hosts, fx.seeds, max_waves=6)
    with open(os.path.join(GOLDEN, "visit_order.json")) as f:
        assert [list(v) for v in sim.visits] == json.load(f)
    with open(os.path.join(GOLDEN, "url_seen_final.json")) as f:
        assert sorted(sim.seen) == json.load(f)
    with open(os.path.join(GOLDEN, "spans_expected.json")) as f:
        expected = json.load(f)
    got = {u: sim.docs_spans[u] for _, u in sim.visits if u in sim.docs_spans}
    assert got == expected
