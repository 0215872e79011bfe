"""Cluster entry point for the crawl engine (north_rule launch path):

    ./scripts/package.sh                        # builds dist/docrawl_spark.zip
    spark-submit --py-files dist/docrawl_spark.zip \
        --master <cluster> --num-executors N ... \
        scripts/submit_crawl.py \
        --documents s3://.../documents --hosts s3://.../hosts \
        --seeds s3://.../seeds --warehouse s3://.../wh --max-waves 20

Reads the three input tables (parquet; Iceberg identifiers work the
same through spark.read.table), runs (or resumes) the wave loop, and
leaves every artifact committed in the warehouse. The same entry run
at two cluster sizes (N and 4N executors) is the scaling-efficiency
protocol; in the sandbox, bench.py substitutes local[8]/local[32].
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--documents", required=True)
    p.add_argument("--hosts", required=True)
    p.add_argument("--seeds", required=True)
    p.add_argument("--warehouse", required=True)
    p.add_argument("--max-waves", type=int, default=10)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--no-bloom", action="store_true")
    p.add_argument("--n-salts", type=int, default=8)
    # sizes the seen-set Bloom; it auto-grows 4x (rebuild from the
    # committed url_seen) whenever the crawl outgrows it, so under-
    # sizing costs a rebuild, never correctness. Set ~total expected
    # urls on big cluster runs to avoid rebuilds (1<<30 ≈ 915 MB blob).
    p.add_argument("--expected-total-urls", type=int, default=1 << 20)
    args = p.parse_args()

    from docrawl_spark.plans.crawl import run_crawl
    from docrawl_spark.session import get_spark
    from docrawl_spark.sources.storage import Warehouse

    # master=None → spark-submit decides (cluster); falls back to local
    spark = get_spark(app_name="docrawl_spark_crawl", master=None)

    documents = spark.read.parquet(args.documents)
    hosts = spark.read.parquet(args.hosts)
    seeds = spark.read.parquet(args.seeds)
    wh = Warehouse(args.warehouse, spark)

    result = run_crawl(
        spark,
        documents,
        hosts,
        seeds,
        max_waves=args.max_waves,
        warehouse=wh,
        use_bloom=not args.no_bloom,
        n_salts=args.n_salts,
        resume=args.resume,
        collect_visits=False,
        expected_total_urls=args.expected_total_urls,
    )
    print(json.dumps({"waves": result.metrics}))
    spark.stop()


if __name__ == "__main__":
    main()
