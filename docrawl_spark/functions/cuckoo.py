"""Sharded cuckoo filter over int64 keys — the deletable alternative to
the Bloom seen-set prefilter (Fan et al., "Cuckoo Filter: Practically
Better Than Bloom", CoNEXT'14; the north_rule names "Bloom/cuckoo").

Why cuckoo at crawl scale: DELETION. A recrawl scheduler retires urls
from the seen-set (content expired, robots changed) — a Bloom can't
forget, a cuckoo filter can.

Distributed shape: cuckoo tables can't be OR-merged like Bloom bitmaps
(eviction chains differ), so the filter is SHARDED by
``pmod(key, n_shards)`` — a deterministic key property, not a
partitioning accident. Build = groupBy shard → one vectorized-probe
table per shard (applyInPandas); probe = broadcast shard list, each
key checks exactly its own shard. Inserts/deletes ship as per-shard
deltas.

Layout per shard: 2^k buckets × 4 slots of 16-bit fingerprints
(0 = empty; fingerprints remap 0→1). i2 = i1 XOR hash(fp) — closed
under power-of-two bucket counts, so partial-key eviction works.
"""

from __future__ import annotations

import math
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_MAGIC = b"DCKF1"
BUCKET_SIZE = 4
MAX_KICKS = 500


def _mix64(h: np.ndarray) -> np.ndarray:
    z = h.astype(np.int64).view(np.uint64).copy()
    z ^= z >> np.uint64(33)
    z *= np.uint64(0xFF51AFD7ED558CCD)
    z ^= z >> np.uint64(33)
    z *= np.uint64(0xC4CEB9FE1A85EC53)
    z ^= z >> np.uint64(33)
    return z


def _fingerprints(keys: np.ndarray) -> np.ndarray:
    fp = (_mix64(keys) & np.uint64(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = 1
    return fp


def _fp_hash(fp: np.ndarray) -> np.ndarray:
    z = fp.astype(np.uint64)
    z *= np.uint64(0x9E3779B97F4A7C15)
    z ^= z >> np.uint64(29)
    return z


class CuckooFilter:
    def __init__(self, n_buckets: int, table: np.ndarray | None = None):
        assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of two"
        self.n_buckets = n_buckets
        self.table = (
            table
            if table is not None
            else np.zeros((n_buckets, BUCKET_SIZE), dtype=np.uint16)
        )

    @classmethod
    def for_items(cls, n: int, load: float = 0.84) -> CuckooFilter:
        need = max(1, int(n / (BUCKET_SIZE * load)))
        return cls(1 << max(4, math.ceil(math.log2(need))))

    # -- core ---------------------------------------------------------------
    def _indices(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        fp = _fingerprints(keys)
        mask = np.uint64(self.n_buckets - 1)
        i1 = (_mix64(keys) >> np.uint64(16)) & mask
        i2 = (i1 ^ _fp_hash(fp)) & mask
        return fp, i1.astype(np.int64), i2.astype(np.int64)

    def insert(self, keys: np.ndarray) -> int:
        """Insert keys; returns the number that FAILED (table too full).
        Failures are a sizing bug, not a correctness hole — callers
        treat a failed filter as 'might contain' (see insert_strict)."""
        fp, i1, i2 = self._indices(keys)
        failed = 0
        rng = np.random.default_rng(12345)  # deterministic kicks
        for f, a, b in zip(fp, i1, i2):
            if self._place(f, a) or self._place(f, b):
                continue
            # evict: random walk
            idx = a
            cur = f
            ok = False
            for _ in range(MAX_KICKS):
                slot = int(rng.integers(BUCKET_SIZE))
                cur, self.table[idx, slot] = self.table[idx, slot], cur
                idx = int(
                    (np.uint64(idx) ^ _fp_hash(np.array([cur], dtype=np.uint16))[0])
                    & np.uint64(self.n_buckets - 1)
                )
                if self._place(cur, idx):
                    ok = True
                    break
            if not ok:
                failed += 1
        return failed

    def _place(self, fp: np.uint16, bucket: int) -> bool:
        row = self.table[bucket]
        empty = np.flatnonzero(row == 0)
        if len(empty):
            self.table[bucket, empty[0]] = fp
            return True
        return False

    def contains(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        fp, i1, i2 = self._indices(keys)
        t1 = self.table[i1]  # (n, 4)
        t2 = self.table[i2]
        return ((t1 == fp[:, None]).any(axis=1)) | ((t2 == fp[:, None]).any(axis=1))

    def delete(self, keys: np.ndarray) -> int:
        """Remove one matching fingerprint per key; returns how many
        were found. Only valid for previously-inserted keys."""
        fp, i1, i2 = self._indices(keys)
        removed = 0
        for f, a, b in zip(fp, i1, i2):
            for bucket in (a, b):
                hits = np.flatnonzero(self.table[bucket] == f)
                if len(hits):
                    self.table[bucket, hits[0]] = 0
                    removed += 1
                    break
        return removed

    # -- serde --------------------------------------------------------------
    def to_bytes(self) -> bytes:
        return _MAGIC + struct.pack("<q", self.n_buckets) + self.table.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> CuckooFilter:
        assert b[:5] == _MAGIC
        (n_buckets,) = struct.unpack("<q", b[5:13])
        table = (
            np.frombuffer(b[13:], dtype=np.uint16)
            .reshape(n_buckets, BUCKET_SIZE)
            .copy()
        )
        return cls(n_buckets, table)


# ---------------------------------------------------------------------------
# Distributed sharded build / probe
# ---------------------------------------------------------------------------

_SHARD_SCHEMA = T.StructType(
    [T.StructField("shard", T.IntegerType()), T.StructField("blob", T.BinaryType())]
)


def build_sharded_cuckoo(
    df: DataFrame, key_col: str, expected_items: int, n_shards: int = 8
) -> list[bytes]:
    """One cuckoo table per pmod(key, n_shards) shard, built in
    parallel (applyInPandas per shard group). Returns the shard list
    indexed by shard id."""
    per_shard = max(64, expected_items // n_shards)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["_shard"].iloc[0])
        cf = CuckooFilter.for_items(per_shard)
        failed = cf.insert(pdf[key_col].to_numpy(dtype=np.int64))
        if failed:
            raise ValueError(f"cuckoo shard {shard} overflow: {failed} failed inserts")
        return pd.DataFrame({"shard": [shard], "blob": [cf.to_bytes()]})

    rows = (
        df.select(key_col)
        .withColumn("_shard", F.pmod(F.col(key_col), F.lit(n_shards)).cast("int"))
        .groupBy("_shard")
        .applyInPandas(build, _SHARD_SCHEMA)
        .collect()
    )
    shards: list[bytes] = [CuckooFilter.for_items(per_shard).to_bytes()] * n_shards
    for r in rows:
        shards[int(r["shard"])] = bytes(r["blob"])
    return shards


def delete_from_sharded_cuckoo(
    shards: list[bytes], df: DataFrame, key_col: str = "url_hash"
) -> list[bytes]:
    """Delete the keys in ``df`` from their shards, in parallel
    (applyInPandas per shard group — the same distribution as the
    build). Returns the updated shard list; untouched shards are
    returned as-is."""
    n_shards = len(shards)
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(shards)

    def drop(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["_shard"].iloc[0])
        cf = CuckooFilter.from_bytes(bc.value[shard])
        cf.delete(pdf[key_col].to_numpy(dtype=np.int64))
        return pd.DataFrame({"shard": [shard], "blob": [cf.to_bytes()]})

    rows = (
        df.select(key_col)
        .withColumn("_shard", F.pmod(F.col(key_col), F.lit(n_shards)).cast("int"))
        .groupBy("_shard")
        .applyInPandas(drop, _SHARD_SCHEMA)
        .collect()
    )
    # shard blobs are MB-scale; repeated retirement cycles would leak
    # executor+driver memory if each call left its broadcast pinned
    bc.unpersist()
    out = list(shards)
    for r in rows:
        out[int(r["shard"])] = bytes(r["blob"])
    return out


def might_contain_cuckoo_col(df_or_spark, shards: list[bytes], key_col: str = "url_hash"):
    """Column: True where the key MIGHT be in its shard's filter."""
    spark = getattr(df_or_spark, "sparkSession", df_or_spark)
    bc = spark.sparkContext.broadcast(shards)
    n_shards = len(shards)

    @pandas_udf(T.BooleanType())
    def probe(keys: pd.Series) -> pd.Series:
        filters = [CuckooFilter.from_bytes(b) for b in bc.value]
        arr = keys.to_numpy(dtype=np.int64, na_value=0)
        shard_of = np.mod(arr, n_shards)
        shard_of = np.where(shard_of < 0, shard_of + n_shards, shard_of)
        out = np.zeros(len(arr), dtype=bool)
        for s in range(n_shards):
            m = shard_of == s
            if m.any():
                out[m] = filters[s].contains(arr[m])
        return pd.Series(out)

    return probe(F.col(key_col))
