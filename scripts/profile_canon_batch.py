"""Measure the canon Arrow stage vs spark.sql.execution.arrow.maxRecordsPerBatch.

Usage: python scripts/profile_canon_batch.py [cpus] [n_urls_millions]

The canonicalize stage is the wave's largest Python-boundary cost; its
per-batch fixed work (RE2 compiles via pc.* calls, dictionary encode
setup, numpy conversions) amortizes with batch size. Interleaves batch
sizes A/B/A/B so VM weather hits both. Run solo.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
n_m = float(sys.argv[2]) if len(sys.argv) > 2 else 8
os.environ["SPARK_GRAFT_CPUS"] = str(cpus)

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from docrawl_spark.functions.canon import with_abs_url  # noqa: E402
from docrawl_spark.session import get_spark  # noqa: E402

n_urls = int(n_m * 1_000_000)
spark = get_spark("profile_canon", cpus=cpus, extra_conf=bench.BENCH_CONF)

def canon_wall() -> float:
    links = bench._synthetic_links(spark, n_urls, 20_000)
    out = with_abs_url(links, "media_ref", "discovered_by").select("url", "canon_error")
    t0 = time.perf_counter()
    bench._force(out)
    return round(time.perf_counter() - t0, 3)

# warm (absorbs arrow_udf worker spin-up)
spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
bench._force(with_abs_url(bench._synthetic_links(spark, 200_000, 1000), "media_ref", "discovered_by"))

sizes = [10000, 65536, 131072]
walls: dict[int, list[float]] = {s: [] for s in sizes}
for _ in range(3):
    for s in sizes:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(s))
        walls[s].append(canon_wall())
for s in sizes:
    print(s, walls[s], "min:", min(walls[s]))
