"""Deterministic training-shard export.

A training run wants the corpus as N shards whose membership is a pure
function of the data — stable across Spark versions, partition counts,
cluster sizes, and re-runs — so a resumed/re-exported dataset is
byte-comparable and any shard can be re-materialized independently.
Shard assignment is the repo's standard 60-bit md5 slice mod N (the
same construction as sampling.hash_split), so DuckDB reproduces the
manifest bit-for-bit.

The manifest is the verification artifact: per shard, the row count
and an order-independent BIT_XOR content signature over
hash60(id ':' md5(payload)) — XOR because it is associative,
commutative, and cannot overflow, so the signature is identical no
matter how rows were distributed when the shard was written. Two
exports match iff their manifests match, without comparing bytes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from docrawl_spark.functions.sketches import _hash60


def shard_col(id_col: Column, n_shards: int) -> Column:
    """Deterministic shard index: hash60(id) % n_shards."""
    return (_hash60(id_col.cast("string")) % F.lit(n_shards)).cast("int")


def shard_manifest(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    payload_col: str = "text",
) -> DataFrame:
    """(shard, n_rows, xor_sig): the export's verification manifest.
    One HashAggregate; xor partials combine map-side."""
    sig = _hash60(
        F.concat(
            F.col(id_col).cast("string"), F.lit(":"), F.md5(F.col(payload_col))
        )
    )
    return (
        df.select(
            shard_col(F.col(id_col), n_shards).alias("shard"),
            sig.alias("_sig"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(_sig)").alias("xor_sig"),
        )
    )


def write_training_shards(
    df: DataFrame,
    warehouse,
    n_shards: int,
    table: str = "training_shards",
    id_col: str = "doc_id",
    payload_col: str = "text",
) -> DataFrame:
    """Materialize the corpus shard-partitioned (hive-style ``_shard=``
    dirs — a single shard re-reads with directory pruning, same shape
    as the IVF index and the banded frontier) and return the manifest
    computed from what was actually written. Callers compare it to
    `shard_manifest(df, ...)` of the source to certify the export."""
    sharded = df.withColumn("_shard", shard_col(F.col(id_col), n_shards))
    warehouse.overwrite(table, sharded, partition_by=["_shard"])
    return shard_manifest(
        warehouse.read(table), n_shards, id_col, payload_col
    )


def zorder_key_col(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton / Z-order bit-interleave of two non-negative integer
    ranks — the multi-dimensional clustering key for warehouse writes:
    sorting (and thus file-splitting) by zkey keeps each file's rows
    inside a small rectangle of (x, y) space, so parquet min/max stats
    prune reads on EITHER dimension (the Delta/Iceberg OPTIMIZE ZORDER
    trick, here as a plain deterministic column). Unrolled JVM
    bit-exprs — whole-stage codegen, no UDF; shift amounts are Python
    ints (column shift amounts demote, CLAUDE.md)."""
    k = F.lit(0).cast("long")
    xl = x.cast("long")
    yl = y.cast("long")
    one = F.lit(1).cast("long")
    for i in range(bits):
        k = k.bitwiseOR(
            F.shiftleft(F.shiftright(xl, i).bitwiseAND(one), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(yl, i).bitwiseAND(one), 2 * i + 1)
        )
    return k


def zorder_sql_expr(x: str, y: str, bits: int = 8) -> str:
    """The DuckDB/ANSI mirror of ``zorder_key_col`` — same unrolled
    interleave as a SQL expression string (for oracles and pushdown
    into engines without the helper)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"
