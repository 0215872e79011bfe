"""One-off wave profiler: stage walls + total at a given local[N].

Usage: python scripts/profile_wave.py [cpus] [n_urls_millions] [trials]

Prints one JSON line per run: the full-wave wall (bench.frontier_wave)
and the per-stage cumulative/delta breakdown
(bench.frontier_wave_stage_profile). Run solo — never alongside another
Spark session (CLAUDE.md bench rule).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
n_m = float(sys.argv[2]) if len(sys.argv) > 2 else 16
trials = int(sys.argv[3]) if len(sys.argv) > 3 else 2
os.environ["SPARK_GRAFT_CPUS"] = str(cpus)

import bench  # noqa: E402
from docrawl_spark.session import get_spark, stop_spark  # noqa: E402

n_urls = int(n_m * 1_000_000)
spark = get_spark("profile_wave", cpus=cpus, extra_conf=bench.BENCH_CONF)
# warm leg: absorbs the one-time arrow_udf worker spin-up (BENCH.md)
bench.frontier_wave(spark, max(n_urls // 16, 50_000), 5_000)
walls = []
for _ in range(trials):
    walls.append(round(bench.frontier_wave(spark, n_urls, 20_000), 3))
    # with_global_rank persists internal frames; a SECOND identical
    # wave plan in the same session is otherwise served from the
    # CacheManager (canonicalized-plan match) — a 32M "wave" measured
    # 4 s that way. Bench's own legs are immune (fresh session per
    # leg); the profiler must clear between trials.
    spark.catalog.clearCache()
prof = bench.frontier_wave_stage_profile(spark, n_urls, 20_000)
print(
    json.dumps(
        {
            "cpus": cpus,
            "n_urls": n_urls,
            "wave_walls_sec": walls,
            "stage_profile": prof,
        }
    )
)
stop_spark()
