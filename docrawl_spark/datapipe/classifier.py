"""Hashed linear quality classifier — the fastText-style model-based
corpus filter (Joulin et al. 2016; the filtering recipe behind
DCLM/FineWeb-Edu-class pipelines: a cheap linear model over hashed
bag-of-words features scores every document, and the corpus keeps the
high-scoring tail).

The reference has no notion of document quality (it extracts whatever
the page gives, `/root/reference/docrawl/docrawl_core.py:377-718`);
this is a rebuild-side training-data operator per the task brief.

Scale shape: tokenize → explode → feature-hash to a fixed bucket space
(2^b buckets) → **broadcast** join the weights dim (the model is
bucket-count-sized, KBs-to-MBs — always broadcastable) → one per-doc
HashAggregate. Fully JVM-side, map-side combinable, no Python in the
hot path. Scoring is integer fixed-point end to end: weights are
milli-units (BIGINT), the keep decision compares ``sum_fp`` against
``threshold_fp · n_feats`` (multiplication, not division — integer
division of negative sums diverges between engines), so the verdict is
bit-exact cross-engine and overflow-safe (|sum_fp| ≤ n_tokens·10^3 ≪
2^63).

A real deployment loads trained weights as the dim table; tests and
the driver query use :func:`synthetic_weights`, a deterministic
md5-seeded stand-in with the same shape.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: fixed-point scale for weights: 1 weight unit = 1/1000.
WEIGHT_SCALE = 1000


def _md5_long(col):
    """60-bit positive BIGINT from md5 — identical in DuckDB as
    ('0x' || substr(md5(x), 1, 15))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hashed_features(
    docs: DataFrame,
    n_buckets: int,
    text_col: str = "text",
) -> DataFrame:
    """Hashed unigram bag-of-words: one row per token occurrence —
    ``(doc_id, bucket)`` with ``bucket = md5_60bit(token) % n_buckets``.
    Empty/whitespace-only docs produce no rows. Bigram features compose
    through the same pipeline by pre-concatenating adjacent tokens
    before the hash."""
    toks = docs.select(
        "doc_id",
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("tok"),
    ).where(F.col("tok") != "")
    return toks.select(
        "doc_id", (_md5_long(F.col("tok")) % n_buckets).alias("bucket")
    )


def synthetic_weights(
    spark: SparkSession, n_buckets: int, seed: int = 0
) -> DataFrame:
    """Deterministic stand-in for a trained model: bucket b gets
    ``weight_fp = md5_60bit('w:<seed>:<b>') % (2·WEIGHT_SCALE + 1)
    - WEIGHT_SCALE`` — uniform in [-1000, 1000] milli-units."""
    return spark.range(n_buckets).select(
        F.col("id").cast("long").alias("bucket"),
        (
            _md5_long(F.concat(F.lit(f"w:{seed}:"), F.col("id").cast("string")))
            % (2 * WEIGHT_SCALE + 1)
            - F.lit(WEIGHT_SCALE)
        ).cast("long").alias("weight_fp"),
    )


def linear_quality_scores(
    docs: DataFrame,
    weights: DataFrame,
    n_buckets: int,
    threshold_fp: int = 0,
    text_col: str = "text",
) -> DataFrame:
    """Score every document with the hashed linear model and emit the
    keep verdict: ``(doc_id, n_feats, score_fp, keep)`` where
    ``score_fp = Σ weight_fp(bucket(tok))`` over token occurrences and
    ``keep ⇔ score_fp ≥ threshold_fp · n_feats`` (i.e. mean feature
    weight ≥ threshold, expressed multiplicatively so it stays in
    integers). Docs with no features score 0 and fail any positive
    threshold, pass any non-positive one — explicit, not accidental:
    they are emitted with ``n_feats = 0``."""
    feats = hashed_features(docs, n_buckets, text_col)
    scored = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("weight_fp").alias("score_fp"),
        )
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("score_fp", F.lit(0)).cast("long").alias("score_fp"),
            F.when(
                F.coalesce("n_feats", F.lit(0)) == 0,
                F.lit(int(threshold_fp) <= 0),
            )
            .otherwise(
                F.col("score_fp") >= F.lit(int(threshold_fp)) * F.col("n_feats")
            )
            .alias("keep"),
        )
    )


def calibration_bins(
    df: DataFrame,
    conf_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram / expected-calibration-error cells for a
    classifier score against a boolean reference label — the "is the
    new quality model's confidence honest" audit run before its scores
    gate corpus admission. ``conf_col`` must already be a confidence
    in ppm [0, 1e6]; rows with null confidence or label are excluded.

    Bins are equal-width deciles of the confidence range
    (``bin = least(n_bins-1, conf*n_bins div 1e6)``). Per bin:
    row count, positive count, exact observed-accuracy ppm
    (pos*1e6 div n), exact mean-confidence ppm (Σconf div n — both
    numerators non-negative, so truncating div is cross-engine safe),
    the absolute accuracy-confidence gap, and ``ece_num = n * gap``
    whose sum over bins div N is the standard ECE. Empty bins are
    absent (sparse — the reader treats missing as n=0).

    Scale shape: one projection + one n_bins-cell HashAggregate over
    the corpus; no window, no join. BIGINT-safe: Σconf ≤ 1e6 * n ~
    1e6 * 1e12."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    facts = df.where(
        F.col(conf_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(conf_col).cast("long").alias("conf"),
        F.col(label_col).cast("boolean").alias("y"),
    ).select(
        F.least(
            F.lit(int(n_bins) - 1).cast("long"),
            F.expr(f"conf * {int(n_bins)} div 1000000"),
        ).alias("bin"),
        "conf",
        "y",
    )
    per = facts.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("y").cast("long")).alias("pos"),
        F.sum("conf").alias("conf_sum"),
    )
    return per.select(
        F.col("bin").cast("long").alias("bin"),
        F.col("n").cast("long").alias("n"),
        F.col("pos").cast("long").alias("n_pos"),
        F.expr("pos * 1000000 div n").cast("long").alias("acc_ppm"),
        F.expr("conf_sum div n").cast("long").alias("mean_conf_ppm"),
        F.expr(
            "abs(pos * 1000000 div n - conf_sum div n)"
        ).cast("long").alias("gap_ppm"),
        F.expr(
            "n * abs(pos * 1000000 div n - conf_sum div n)"
        ).cast("long").alias("ece_num"),
    )
