"""One frontier wave against a REAL multi-executor Spark cluster.

Submitted by scripts/standalone_scaling.sh to a local standalone
master at two cluster sizes (N and 4N executors — the north_rule's
two-cluster-size protocol with actual separate executor JVMs, one
step closer than local[8]/local[32] thread counts):

    spark-submit --master spark://localhost:7077 \
        --py-files dist/docrawl_spark.zip \
        --conf spark.cores.max=8 --conf spark.executor.cores=4 \
        scripts/standalone_wave.py --n-urls 4000000

Prints one JSON line: {"executors": E, "cores": C, "elapsed": sec,
"urls_per_sec": r}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# driver-side imports (client mode): repo root = this script's parent dir
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n-urls", type=int, default=4_000_000)
    p.add_argument("--n-hosts", type=int, default=20_000)
    args = p.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.appName("docrawl_standalone_wave")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    sc = spark.sparkContext
    total_cores = int(sc.getConf().get("spark.cores.max", "0"))
    spark.conf.set("spark.sql.shuffle.partitions", str(max(8, total_cores)))

    import bench  # repo-root module: the wave pipeline definition

    # warm the executors (JVM + python worker spin-up off the clock)
    spark.range(1_000_000).select(F.sum("id")).collect()

    elapsed = bench.frontier_wave(spark, args.n_urls, args.n_hosts)
    # executor JVMs = block managers minus the driver's
    n_execs = sc._jsc.sc().getExecutorMemoryStatus().size() - 1
    print(
        json.dumps(
            {
                "executors": n_execs,
                "cores": total_cores,
                "elapsed": round(elapsed, 3),
                "urls_per_sec": round(args.n_urls / elapsed, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
