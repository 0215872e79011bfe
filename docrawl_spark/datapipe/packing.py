"""Training-sequence construction: token-window chunking and
deterministic sequence packing.

Two ops every LLM data pipeline runs between "clean corpus" and
"training shards":

- ``chunk_documents`` — slide a fixed token window (with overlap) over
  each doc; pure per-row array ops (posexplode of the start sequence),
  no shuffle at all.
- ``pack_sequences`` — greedily fill fixed token budgets ("sequence
  packing"): docs are sharded by a deterministic hash, ordered by the
  same hash within the shard, and cut into packs by a running token
  sum. The window runs per shard — shard count is the parallelism
  knob, so no global sort and no single-partition window at 100 TB.
  Everything is a pure function of (salt, id): bit-reproducible across
  runs, engines, partitionings — same rule as datapipe/sampling.

Packing spec (exact, oracle-reproducible): within a shard, docs are
ordered by (hash_ppm, id); tok = min(token_count, budget); cum is the
running sum of tok; a doc lands in pack (cum − 1) div budget (empty
docs: pack cum div budget). A pack's total can exceed the budget by at
most cap − 1 tokens (the straddling doc stays whole — the standard
"approximate packing" trade; exact packing would need per-row state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from docrawl_spark.datapipe.sampling import _hash_ppm
from docrawl_spark.datapipe.text import token_count_col


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding token windows: chunks start every ``chunk_tokens −
    overlap`` tokens; a non-initial start whose window would add only
    overlap tokens (start + overlap ≥ n) is dropped. Returns
    (id, chunk_idx, start_tok, n_tokens, chunk_text). Zero-token docs
    produce no chunks."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = (
        df.select(F.col(id_col), toks.alias("_ts"))
        .where(token_count_col(F.col(text_col)) >= 1)
        .withColumn("_n", F.size("_ts"))
    )
    starts = F.expr(f"sequence(0, _n - 1, {stride})")
    chunks = base.select(
        id_col, "_ts", "_n", F.posexplode(starts).alias("chunk_idx", "start_tok")
    ).where((F.col("start_tok") == 0) | (F.col("start_tok") + overlap < F.col("_n")))
    return chunks.select(
        id_col,
        "chunk_idx",
        F.col("start_tok").cast("long").alias("start_tok"),
        F.least(F.lit(chunk_tokens), F.col("_n") - F.col("start_tok"))
        .cast("long")
        .alias("n_tokens"),
        F.expr(f"array_join(slice(_ts, start_tok + 1, {chunk_tokens}), ' ')").alias(
            "chunk_text"
        ),
    )


def pack_sequences(
    df: DataFrame,
    budget_tokens: int = 256,
    n_shards: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "pack1",
    hash_mode: str = "md5hex",
) -> DataFrame:
    """Assign every doc to a (shard, pack_idx) training sequence under
    a token budget — the docstring at module top has the exact spec.
    Returns (id, shard, pack_idx, n_tokens, cum_tokens)."""
    ppm = _hash_ppm(F.col(id_col), salt, hash_mode)
    tok = F.least(F.lit(budget_tokens), token_count_col(F.col(text_col)))
    base = df.select(
        F.col(id_col),
        F.pmod(ppm, F.lit(n_shards)).cast("int").alias("shard"),
        ppm.alias("_ppm"),
        tok.cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("_ppm", id_col)
    return base.withColumn("_cum", F.sum("n_tokens").over(w)).select(
        id_col,
        "shard",
        F.when(
            F.col("n_tokens") > 0,
            F.expr(f"(_cum - 1) div {budget_tokens}"),
        )
        .otherwise(F.expr(f"_cum div {budget_tokens}"))
        .cast("long")
        .alias("pack_idx"),
        "n_tokens",
        F.col("_cum").cast("long").alias("cum_tokens"),
    )


def pack_manifest(
    packs: DataFrame, budget_tokens: int = 256, id_col: str = "doc_id"
) -> DataFrame:
    """Per-pack fill stats over ``pack_sequences`` output: (shard,
    pack_idx, n_docs, pack_tokens, fill_ppm). One HashAggregate on the
    (shard, pack) key — pack count is corpus_tokens/budget, always far
    smaller than the corpus."""
    return packs.groupBy("shard", "pack_idx").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("pack_tokens"),
        F.expr(f"(sum(n_tokens) * 1000000L) div {budget_tokens}").alias("fill_ppm"),
    )
