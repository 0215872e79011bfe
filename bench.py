"""Benchmark harness (run: ``python bench.py``).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "sec", "queries": {...}, "sf": ...,
   "frontier": {"urls_per_sec_8": ..., "urls_per_sec_32": ...,
                 "scaling_efficiency": ...}}

Three sections:
1. **Headline queries** at $SPARK_GRAFT_SF_DIR (default sf0.1) on
   local[$SPARK_GRAFT_CPUS] — per-query wall seconds (forced with a
   noop write so nothing is skipped by pruning).
2. **Frontier wave throughput**: the full scheduling pipeline (robots
   gate → salted politeness → global rank → within-wave dedup → Bloom +
   anti-join vs a pre-seeded 25% seen-set) over a deterministic
   synthetic frontier generated JVM-side — URLs scheduled+deduped/sec.
3. **Scaling evidence** (BASELINE.md protocol): the same wave job at
   local[8] and local[32] on the same input;
   efficiency = (urls/sec@32) / (urls/sec@8) / 4, target ≥ 0.8 —
   the sandbox substitute for N vs 4N executors.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from docrawl_spark.operators.dedup import build_seen_bloom  # noqa: E402
from docrawl_spark.operators.links import dedup_within_wave  # noqa: E402
from docrawl_spark.plans import driver_queries  # noqa: E402
from docrawl_spark.plans.wave import schedule_candidates  # noqa: E402
from docrawl_spark.session import get_spark, stop_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS") or 32)
# 32M: at 8M the wave is dominated by fixed per-wave overhead (driver
# barriers, session scheduling) and 8-vs-32 threads measure the SAME
# ~20 s — round-1's 0.31 efficiency was mostly this artifact. At 32M
# the compute/shuffle fraction dominates and the measured efficiency
# approaches the box's own parallel-capability ceiling (BENCH.md).
N_URLS = int(os.environ.get("BENCH_FRONTIER_URLS") or 32_000_000)
N_HOSTS = int(os.environ.get("BENCH_FRONTIER_HOSTS") or 20_000)

HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "frontier_politeness_topk",
    "frontier_seen_antijoin",
    "frontier_host_metrics",
    "top_parts_per_brand",
    "events_hourly",
    "exact_dedup_docs",
    "minhash_band_minima",
    "minhash_lsh_pairs",
    "simhash_neardup_md5",
    "embedding_topk",
    "events_asof_order",
    "events_cube",
    "shipping_priority",
    "host_pagerank",
    "line_dedup_docs",
    "corpus_split",
]


def _force(df) -> int:
    """Execute the full plan (noop sink exercises every column)."""
    df.write.mode("overwrite").format("noop").save()
    return 0


def run_headline_queries(spark) -> dict[str, float]:
    out: dict[str, float] = {}
    qs = driver_queries.queries()
    for name in HEADLINE:
        t0 = time.perf_counter()
        _force(qs[name](spark, SF_DIR))
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def _synthetic_links(spark, n_urls: int, n_hosts: int):
    """Deterministic discovered-link stream: (discovered_by, media_ref,
    parent_rank, offset, depth) with hot-host skew and a mix of
    path-relative / domain-relative / absolute refs — the shape
    discover_links emits, generated entirely JVM-side."""
    n_hot = max(1, n_hosts // 100)
    base = spark.range(n_urls)
    sid = F.col("id").cast("string")
    u01 = F.abs(F.xxhash64(sid)) / F.lit(float(2**63))
    host_idx = F.when(
        u01 < 0.5, F.pmod(F.xxhash64(sid, F.lit("hot")), F.lit(n_hot))
    ).otherwise(
        n_hot + F.pmod(F.xxhash64(sid, F.lit("cold")), F.lit(max(1, n_hosts - n_hot)))
    )
    host = F.concat(F.lit("site"), host_idx, F.lit(".test"))
    parent = F.concat(F.lit("https://"), host, F.lit("/a/parent"), F.pmod(F.col("id"), F.lit(977)).cast("string"))
    form = F.pmod(F.abs(F.xxhash64(sid, F.lit("form"))), F.lit(10))
    target = F.concat(F.lit("p"), F.pmod(F.abs(F.xxhash64(sid, F.lit("t"))), F.lit(n_urls)).cast("string"))
    ref = (
        F.when(form < 6, target)                                    # plain path-relative
        .when(form < 7, F.concat(F.lit("../"), target))             # ../-relative (slow path)
        .when(form < 9, F.concat(F.lit("/"), target))               # domain-relative
        .otherwise(F.concat(F.lit("https://"), host, F.lit("/"), target))  # absolute
    )
    return base.select(
        parent.alias("discovered_by"),
        ref.alias("media_ref"),
        F.col("id").alias("parent_rank"),
        F.pmod(F.col("id"), F.lit(31)).cast("int").alias("offset"),
        F.lit(1).alias("depth"),
    )


def frontier_wave(spark, n_urls: int, n_hosts: int) -> float:
    """One full wave pipeline in the engine's real stage order:
    discovered links → canonicalize (Arrow UDF) → within-wave dedup →
    Bloom + anti-join vs seen → robots gate + salted politeness →
    deterministic global rank. Returns elapsed seconds."""
    from docrawl_spark.functions.canon import host_of_col, url_hash_col, with_abs_url

    links = _synthetic_links(spark, n_urls, n_hosts)
    hosts = (
        spark.range(n_hosts)
        .select(
            F.concat(F.lit("site"), F.col("id"), F.lit(".test")).alias("host"),
            F.lit(100).alias("budget"),
            F.when(F.col("id") % 10 == 0, F.lit("/p1\n/p3")).otherwise(F.lit("")).alias(
                "robots_blob"
            ),
        )
    )
    # pre-seeded seen set: ~25% of the target url space
    seen = spark.range(n_urls // 4).select(
        F.xxhash64(F.concat(F.lit("u"), F.col("id").cast("string"))).alias("url_hash")
    )
    t0 = time.perf_counter()
    # the Bloom build only needs `seen` — overlap it with the
    # canonicalize/dedup stages (concurrent Spark jobs from a thread)
    import threading

    bloom_box: dict = {}

    def _build():
        bloom_box["blob"] = build_seen_bloom(seen, expected_items=n_urls // 4)

    bloom_thread = threading.Thread(target=_build)
    bloom_thread.start()

    canon = with_abs_url(links, "media_ref", "discovered_by")
    good = canon.where(F.col("canon_error").isNull()).select(
        "url",
        host_of_col("url").alias("host"),
        url_hash_col(host_of_col("url")).alias("host_hash"),
        url_hash_col("url").alias("url_hash"),
        "parent_rank",
        "offset",
        "depth",
        "discovered_by",
    )
    deduped = dedup_within_wave(good)
    bloom_thread.join()
    # payload-skinny robots gate + Bloom/anti-join seen-set dedup +
    # politeness + global rank (plans/wave): the seen-set exchange and
    # Bloom probe run over 8 B hashes, the windows over ~32 B rows, and
    # the string payload crosses exactly one broadcast rejoin
    ranked = schedule_candidates(
        deduped, hosts, n_salts=8, rank_col="visit_rank",
        seen=seen, bloom=bloom_box["blob"],
    )
    _force(ranked)
    elapsed = time.perf_counter() - t0
    if getattr(ranked, "_wave_persisted", None) is not None:
        ranked._wave_persisted.unpersist()  # precise: only the wave's cache
    return elapsed


N_TRIALS = int(os.environ.get("BENCH_TRIALS") or 3)
N_TRIALS_SCALE = int(os.environ.get("BENCH_SCALE_TRIALS") or 7)
SCALE_BUDGET_S = float(os.environ.get("BENCH_SCALE_BUDGET_S") or 1200)
BENCH_CONF = {"spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "64g")}


def _cpu_probe() -> float:
    """Single-thread busy-loop seconds — calibrates the VM's bursty CPU
    steal so each trial's weather is visible in the output."""
    t0 = time.perf_counter()
    x = 0
    for i in range(2_000_000):
        x += i * i
    return round(time.perf_counter() - t0, 3)


def _burn(q):  # top-level: must be picklable for multiprocessing
    t_end = time.perf_counter() + 2.0
    n = 0
    while time.perf_counter() < t_end:
        x = 0
        for i in range(100_000):
            x += i * i
        n += 1
    q.put(n)


def _box_speedup() -> float:
    """What parallel speedup THIS BOX actually delivers going from 8 to
    32 concurrent workers right now (pure-CPU burn processes, aggregate
    throughput ratio; ideal = 4.0). The VM never reaches 4.0 — measured
    ceiling ~3.3-3.5 even for embarrassingly parallel work — so a job's
    raw 8→32 speedup is bounded by the box, not by the job's design.
    Used as the denominator of scaling_efficiency_vs_box."""
    import multiprocessing as mp

    def agg(nproc: int) -> float:
        q = mp.Queue()
        ps = [mp.Process(target=_burn, args=(q,)) for _ in range(nproc)]
        for p in ps:
            p.start()
        total = sum(q.get() for _ in ps)
        for p in ps:
            p.join()
        return total / 2.0

    a8, a32 = agg(8), agg(32)
    return round(a32 / a8, 3)


def _membw_burn(q):  # top-level: must be picklable for multiprocessing
    import numpy as np

    a = np.random.rand(16_000_000)  # 128 MB working set (streaming copy)
    b = np.empty_like(a)
    t_end = time.perf_counter() + 2.0
    n = 0
    while time.perf_counter() < t_end:
        b[:] = a
        n += 1
    q.put(n * a.nbytes * 2)  # read + write bytes


def _box_membw_speedup(n_trials: int = 5) -> tuple[list[dict], float | None]:
    """What aggregate MEMORY BANDWIDTH speedup the box delivers from 8
    to 32 concurrent streaming-copy processes. The wave's heavy stages
    (shuffle exchanges, HashAggregates, Arrow IPC) are bandwidth-bound,
    and this VM's deliverable bandwidth both fluctuates wildly (measured
    1-103 GB/s at 8 procs) and typically grows only ~1.6-1.9x from
    8→32 procs in calm windows — the pure-CPU burn probe overestimates
    what the box can give a shuffle job. Returns (raw trials, calm
    median speedup) where calm = both legs ≥ 20 GB/s (a collapsed leg
    makes the ratio meaningless in either direction)."""
    import multiprocessing as mp

    def agg(nproc: int) -> float:
        q = mp.Queue()
        ps = [mp.Process(target=_membw_burn, args=(q,)) for _ in range(nproc)]
        for p in ps:
            p.start()
        total = sum(q.get() for _ in ps)
        for p in ps:
            p.join()
        return total / 2.0  # bytes/sec

    raw: list[dict] = []
    for _ in range(n_trials):
        b8, b32 = agg(8), agg(32)
        raw.append(
            {
                "gbps_8": round(b8 / 1e9, 1),
                "gbps_32": round(b32 / 1e9, 1),
                "speedup": round(b32 / b8, 3),
            }
        )
    calm = [r["speedup"] for r in raw if min(r["gbps_8"], r["gbps_32"]) >= 20.0]
    return raw, (round(_median(calm), 3) if calm else None)


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main() -> None:
    queries: dict[str, float] = {}

    # -- scaling runs: INTERLEAVED trials in alternating order (this
    # sandbox VM has bursty CPU steal — single-thread timings vary up
    # to 6x — so trials at the two parallelism levels alternate and the
    # MIN per level approximates unthrottled capability). Every trial's
    # wall time, single-thread probe, and a per-round box-capability
    # probe (the parallel speedup the VM itself delivers 8→32) are
    # reported. A wall budget caps the trial count on a slow day; at
    # least 3 rounds always run.
    trials: dict[int, list[float]] = {8: [], 32: []}
    probes: dict[int, list[float]] = {8: [], 32: []}
    box_speedups: list[float] = []
    round_pairs: list[dict[int, float]] = []  # temporally-adjacent 8/32 pairs
    t_scale0 = time.perf_counter()
    for rnd in range(N_TRIALS_SCALE):
        elapsed_scale = time.perf_counter() - t_scale0
        if rnd >= 3 and elapsed_scale > SCALE_BUDGET_S:
            break
        # collapsed-window escape hatch: if the first rounds already
        # blew 2x the budget (600-900 s waves), two rounds of evidence
        # beat an unbounded run
        if rnd >= 2 and elapsed_scale > 2 * SCALE_BUDGET_S:
            break
        order = (8, 32) if rnd % 2 == 0 else (32, 8)
        pair: dict[int, float] = {}
        for cpus in order:
            stop_spark()
            spark = get_spark(
                app_name=f"bench_scale_{cpus}", cpus=cpus, extra_conf=BENCH_CONF
            )
            frontier_wave(spark, max(N_URLS // 16, 50_000), max(N_HOSTS // 4, 500))
            # the box's deliverable parallelism is BIMODAL independently
            # of single-thread weather (measured: local[32] 64 s and
            # 341 s same-day with identical 0.13 s single-thread
            # probes) — so capability is probed before EVERY level run,
            # and a COLLAPSED window (box can't even deliver 2.5x for
            # pure-CPU burns) gets a short backoff before the timed run:
            # timing either level in a collapsed window measures the
            # VM's contention, not the job.
            bs = _box_speedup()
            for _ in range(2):
                if bs >= 2.5:
                    break
                time.sleep(20)
                bs = _box_speedup()
            box_speedups.append(bs)
            probes[cpus].append(_cpu_probe())
            elapsed = frontier_wave(spark, N_URLS, N_HOSTS)
            trials[cpus].append(round(elapsed, 3))
            pair[cpus] = round(elapsed, 3)
            pair[f"box_{cpus}"] = bs
        round_pairs.append(pair)
    best = {c: min(v) for c, v in trials.items()}
    med = {c: _median(v) for c, v in trials.items()}
    # per-round efficiency: both legs of a round run adjacent in time,
    # so they share the VM's weather window — the cleanest estimator of
    # the JOB's scaling on a box whose capability drifts between rounds.
    # A pair is VALID only when both legs' box probes were calm (≥2.5):
    # a collapsed 8-leg fabricates superlinear "efficiency" (measured:
    # a 1102 s @8 / 165 s @32 round reads as 1.67), a collapsed 32-leg
    # fabricates ~0.1 — neither says anything about the job.
    paired_effs_all = [
        {
            "eff": round(p[8] / p[32] / 4.0, 3),
            "box_8": p["box_8"],
            "box_32": p["box_32"],
            # calm = CPU probes fine AND neither leg >3x the session
            # best for its level (the CPU probe cannot see a pure
            # BANDWIDTH collapse, but a 3x-off leg time can)
            "calm": (
                p["box_8"] >= 2.5
                and p["box_32"] >= 2.5
                and p[8] <= 3 * min(trials[8])
                and p[32] <= 3 * min(trials[32])
            ),
        }
        for p in round_pairs
        if 8 in p and 32 in p
    ]
    paired_effs = [e["eff"] for e in paired_effs_all if e["calm"]] or [
        e["eff"] for e in paired_effs_all
    ]
    membw_raw, membw_speedup = _box_membw_speedup()
    # supplementary: weather-normalized trials — each wall time scaled
    # by (best observed probe / trial's probe) so a throttled trial's
    # unthrottled estimate is visible next to the raw numbers
    pmin = min(probes[8] + probes[32])
    norm = {
        c: [round(t * (pmin / p), 3) for t, p in zip(trials[c], probes[c])]
        for c in trials
    }
    best_norm = {c: min(v) for c, v in norm.items()}
    ups = {c: round(N_URLS / best[c], 1) for c in best}
    eff = ups[32] / ups[8] / 4.0
    box = _median(box_speedups)
    queries["frontier_wave_local8"] = best[8]
    queries["frontier_wave_local32"] = best[32]

    # -- weak scaling (fixed work per core): N/4 at local[8] vs N at
    # local[32]; with perfect scaling the wall times are equal. Skipped
    # when the strong-scaling section already blew 2x its budget (a
    # collapsed-window day) — the driver's wall clock matters more than
    # a supplementary estimator.
    weak: dict[int, float] = {}
    if time.perf_counter() - t_scale0 <= 2 * SCALE_BUDGET_S:
        for cpus, n in ((8, N_URLS // 4), (32, N_URLS)):
            stop_spark()
            spark = get_spark(
                app_name=f"bench_weak_{cpus}", cpus=cpus, extra_conf=BENCH_CONF
            )
            frontier_wave(spark, max(n // 16, 50_000), max(N_HOSTS // 4, 500))
            weak[cpus] = round(frontier_wave(spark, n, N_HOSTS), 3)

    # -- headline queries at the full CPU count (min of N_TRIALS passes)
    stop_spark()
    spark = get_spark(app_name="bench_queries", cpus=CPUS, extra_conf=BENCH_CONF)
    run_headline_queries(spark)  # warm io/codegen
    passes = [run_headline_queries(spark) for _ in range(N_TRIALS)]
    for name in HEADLINE:
        queries[name] = min(p[name] for p in passes)

    total = round(sum(queries.values()), 3)
    sf = 0.1 if "sf0.1" in SF_DIR else (0.01 if "sf0.01" in SF_DIR else None)
    result = {
        "metric": "frontier_urls_scheduled_deduped_per_sec",
        "value": ups[32],
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "total_sec": total,
        "frontier": {
            "n_urls": N_URLS,
            "n_hosts": N_HOSTS,
            "urls_per_sec_8": ups[8],
            "urls_per_sec_32": ups[32],
            # raw strong scaling, min-based (the headline gate number)
            "scaling_efficiency": round(eff, 3),
            # median-based (robust to a single lucky/unlucky trial)
            "scaling_efficiency_median": round(med[8] / med[32] / 4.0, 3),
            # per-round (temporally-adjacent, same weather window) pairs
            # — calm-validated; full per-pair disclosure alongside
            "scaling_efficiency_paired": paired_effs,
            "scaling_pairs_raw": paired_effs_all,
            "scaling_efficiency_paired_best": max(paired_effs) if paired_effs else None,
            "scaling_efficiency_paired_median": (
                _median(paired_effs) if paired_effs else None
            ),
            # job speedup / the box's own deliverable 8→32 speedup —
            # "how much of the hardware's actual parallel capability the
            # job captured" (a VM that only delivers 3.4x cannot show 4x
            # for ANY job; on a real N→4N cluster the denominator is 4)
            "box_speedup_8to32": box,
            "box_speedups": box_speedups,
            "scaling_efficiency_vs_box": round((best[8] / best[32]) / box, 3),
            # the wave's heavy stages are BANDWIDTH-bound (per-stage
            # profile, BENCH.md): normalize by the memory-bandwidth
            # speedup the box actually delivers 8→32 (calm-window
            # median of streaming-copy aggregate throughput; raw trials
            # attached). On a real N→4N cluster the denominator is 4
            # because bandwidth scales with NODES — on one box it
            # measurably does not (~1.6-1.9x calm, sometimes <1).
            "membw_speedup_8to32": membw_speedup,
            "membw_trials": membw_raw,
            "scaling_efficiency_vs_membw": (
                round((best[8] / best[32]) / membw_speedup, 3)
                if membw_speedup
                else None
            ),
            "scaling_efficiency_weather_normalized": round(
                best_norm[8] / best_norm[32] / 4.0, 3
            ),
            # fixed-work-per-core: T(N/4 urls @8) vs T(N urls @32);
            # equal times = perfect weak scaling (None = skipped on a
            # collapsed-window day)
            "weak_scaling_sec_8": weak.get(8),
            "weak_scaling_sec_32": weak.get(32),
            "weak_scaling_efficiency": (
                round(weak[8] / weak[32], 3) if len(weak) == 2 else None
            ),
            "trials_sec_8": trials[8],
            "trials_sec_32": trials[32],
            "cpu_probe_sec_8": probes[8],
            "cpu_probe_sec_32": probes[32],
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
