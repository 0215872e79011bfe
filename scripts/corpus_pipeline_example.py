"""End-to-end training-corpus pipeline example — the datapipe twin of
the reference's crawl example (`/root/reference/examples/
docrawl_example1.py`: run_spider → load_website → extract → close).
Here: clean → quality-filter → near-dedup → split → pack → index,
each stage a tested operator from docrawl_spark.datapipe.

Run: python scripts/corpus_pipeline_example.py [sf_dir]
(defaults to /root/testdata/sf0.001; prints stage row counts).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    from docrawl_spark.datapipe.dedup import minhash_band_index, near_dedup
    from docrawl_spark.datapipe.packing import pack_sequences
    from docrawl_spark.datapipe.sampling import hash_split
    from docrawl_spark.datapipe.text import clean_text, quality_score_col
    from docrawl_spark.session import get_spark

    spark = get_spark(cpus=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    print("docs:", docs.count())

    # 1. unicode canonicalization (Arrow-native)
    cleaned = clean_text(docs).drop("text").withColumnRenamed(
        "text_clean", "text"
    )

    # 2. quality floor (integer-exact [0, 1000] score)
    kept = cleaned.where(quality_score_col(F.col("text")) >= 400)
    print("after quality floor:", kept.count())

    # 3. near-dedup (MinHash-LSH -> connected components -> keep-first)
    deduped = near_dedup(kept)
    print("after near-dedup:", deduped.count())

    # 4. deterministic split + sequence packing of the train side
    split = hash_split(deduped, weights={"train": 0.9, "val": 0.05, "test": 0.05})
    packed = pack_sequences(
        split.where(F.col("split") == "train"), budget_tokens=512
    )
    print("train packs:", packed.select("shard", "pack_idx").distinct().count())

    # 5. persistable incremental-dedup index for the NEXT crawl wave
    idx = minhash_band_index(deduped)
    print("band-index rows:", idx.count())
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
