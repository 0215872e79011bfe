"""Distributed Bloom filter over int64 keys — the seen-set prefilter.

Spark's internal ``BloomFilterAggregate`` isn't registered in the SQL
function registry (it only serves runtime join filters), so the engine
carries its own sketch, built Spark-first:

- **build**: ``mapInPandas`` computes one partial bitmap per partition
  (vectorized numpy bit-sets over the whole Arrow batch), the driver
  ORs the ``num_partitions`` partials — an aggregation tree exactly like
  ``treeAggregate``, but with zero per-row Python;
- **probe**: an Arrow-batched pandas UDF gathers bits for the whole
  batch at once; the bitmap ships to executors via a broadcast variable
  (not closure capture — one copy per executor, not per task).

Double hashing (Kirsch-Mitzenmacher): position_i = h1 + i·h2 (mod m),
with h1/h2 derived from the already-uniform xxhash64 key by splitmix64
finalizers. False negatives are impossible by construction
(property-tested in tests/test_bloom.py); false positives are resolved
by the exact anti-join downstream (operators/dedup.py).
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

_MAGIC = b"DBLM1"


def _optimal_params(n: int, fpp: float) -> tuple[int, int]:
    """(m_bits, k) for expected n items at false-positive rate fpp."""
    n = max(n, 1)
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = (m + 63) // 64 * 64  # whole uint64 words
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 16)


def _mix(h: np.ndarray, c1: np.uint64, c2: np.uint64) -> np.ndarray:
    """splitmix64-style finalizer, vectorized over a uint64 array."""
    z = h.copy()
    z ^= z >> np.uint64(30)
    z *= c1
    z ^= z >> np.uint64(27)
    z *= c2
    z ^= z >> np.uint64(31)
    return z


def _positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) bit positions for each key (double hashing)."""
    h = keys.astype(np.int64).view(np.uint64)
    h1 = _mix(h, np.uint64(0xBF58476D1CE4E5B9), np.uint64(0x94D049BB133111EB))
    h2 = _mix(h, np.uint64(0xFF51AFD7ED558CCD), np.uint64(0xC4CEB9FE1A85EC53))
    h2 |= np.uint64(1)  # odd, so strides cover the table
    i = np.arange(k, dtype=np.uint64)[:, None]
    return (h1[None, :] + i * h2[None, :]) % np.uint64(m_bits)


class Bloom:
    def __init__(self, m_bits: int, k: int, words: np.ndarray | None = None):
        self.m_bits = m_bits
        self.k = k
        self.words = (
            words if words is not None else np.zeros(m_bits // 64, dtype=np.uint64)
        )

    @classmethod
    def for_items(cls, n: int, fpp: float = 0.03) -> Bloom:
        return cls(*_optimal_params(n, fpp))

    def add(self, keys: np.ndarray) -> None:
        pos = _positions(keys, self.m_bits, self.k).ravel()
        np.bitwise_or.at(
            self.words, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    def contains(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = _positions(keys, self.m_bits, self.k)
        word = self.words[(pos >> np.uint64(6)).astype(np.int64)]
        bit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return bit.all(axis=0).astype(bool)

    def union(self, other: Bloom) -> Bloom:
        assert (self.m_bits, self.k) == (other.m_bits, other.k)
        return Bloom(self.m_bits, self.k, self.words | other.words)

    def to_bytes(self) -> bytes:
        return _MAGIC + struct.pack("<qi", self.m_bits, self.k) + self.words.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> Bloom:
        assert b[:5] == _MAGIC, "not a docrawl_spark bloom blob"
        m_bits, k = struct.unpack("<qi", b[5:17])
        words = np.frombuffer(b[17:], dtype=np.uint64).copy()
        return cls(m_bits, k, words)


def build_bloom(
    df: DataFrame,
    key_col: str,
    expected_items: int,
    fpp: float = 0.03,
    params: tuple[int, int] | None = None,
) -> bytes:
    """Aggregate ``df[key_col]`` (long) into one Bloom blob.

    One partial bitmap per partition (vectorized), OR-reduced on the
    driver: ``num_partitions`` rows of a few MB each — the same shape
    as any sketch aggregation. Pass ``params=(m_bits, k)`` to build a
    delta compatible with an existing Bloom for incremental union
    (the crawl loop adds only each wave's newly-seen keys)."""
    m_bits, k = params if params is not None else _optimal_params(expected_items, fpp)

    def partials(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bloom = Bloom(m_bits, k)
        seen_any = False
        for pdf in it:
            keys = pdf[key_col].to_numpy(dtype=np.int64, na_value=0)
            if len(keys):
                bloom.add(keys)
                seen_any = True
        if seen_any:
            yield pd.DataFrame({"blob": [bloom.to_bytes()]})

    rows = (
        df.select(key_col)
        .mapInPandas(partials, T.StructType([T.StructField("blob", T.BinaryType())]))
        .collect()
    )
    out = Bloom(m_bits, k)
    for r in rows:
        out = out.union(Bloom.from_bytes(bytes(r["blob"])))
    return out.to_bytes()


def might_contain_col(df_or_spark, bloom_blob: bytes, key_col: str = "url_hash"):
    """Column: True where key MIGHT be in the bloom (no false negatives).

    The blob rides a broadcast variable so each executor deserializes
    it once per task batch, not per row."""
    spark = getattr(df_or_spark, "sparkSession", df_or_spark)
    bc = spark.sparkContext.broadcast(bloom_blob)

    @pandas_udf(T.BooleanType())
    def probe(keys: pd.Series) -> pd.Series:
        bloom = Bloom.from_bytes(bc.value)
        arr = keys.to_numpy(dtype=np.int64, na_value=0)
        return pd.Series(bloom.contains(arr))

    return probe(F.col(key_col))


class WindowedSeenFilter:
    """Sliding-window membership over the last ``window`` crawl epochs —
    the recrawl-TTL filter shape (cf. the sliding-window AMQ literature,
    e.g. SIGMOD'23's windowed cuckoo: expiry by rotating sub-filters,
    never by per-key deletes or full rebuilds).

    One Bloom shard per epoch; ``advance()`` opens a new epoch and
    drops shards older than the window — O(1) expiry of an entire
    epoch's URLs, which is exactly how recrawl freshness works (a URL
    seen ``window`` epochs ago SHOULD come back). Querying ORs the live
    shards. No false negatives within the window; fpp grows ~linearly
    with the live shard count (size each shard for n/window items).

    Driver-side sketch object like ``Bloom`` itself: built from
    per-partition partials, broadcast as bytes per shard; the exact
    url_seen table remains the source of truth (operators/dedup)."""

    def __init__(self, window: int, shard_items: int, fpp: float = 0.03):
        if window < 1:
            raise ValueError("window must be >= 1")
        self.window = window
        self.shard_items = shard_items
        self.fpp = fpp
        self.epoch = 0
        self._shards: list[tuple[int, Bloom]] = [(0, Bloom.for_items(shard_items, fpp))]

    @property
    def current(self) -> Bloom:
        return self._shards[-1][1]

    def add(self, keys: np.ndarray) -> None:
        """Insert into the CURRENT epoch's shard."""
        self.current.add(keys)

    def advance(self) -> int:
        """Open the next epoch; expire shards that fell out of the
        window. Returns the new epoch number."""
        self.epoch += 1
        self._shards.append((self.epoch, Bloom.for_items(self.shard_items, self.fpp)))
        low = self.epoch - self.window + 1
        self._shards = [(e, b) for e, b in self._shards if e >= low]
        return self.epoch

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Membership across all LIVE epochs (OR of shards)."""
        out = np.zeros(len(keys), dtype=bool)
        for _, b in self._shards:
            out |= b.contains(keys)
        return out

    def live_epochs(self) -> list[int]:
        return [e for e, _ in self._shards]


# ---------------------------------------------------------------------------
# Relational Bloom twin — the filter as PLAIN SQL, for cross-engine
# FPR calibration. The production Bloom above is numpy/xxhash64 inside
# mapInPandas (fast, opaque); this twin builds the same double-hashed
# bit set as ROWS (position = (h1 + i*h2) mod m), so membership and
# the false-positive rate are auditable by any SQL engine, and the
# no-false-negative property is checkable value-for-value.
# ---------------------------------------------------------------------------


def _sql_bloom_h(key_col, salt: str):
    """60-bit md5 slice (DuckDB-reproducible) of salt|key."""
    from pyspark.sql import functions as F

    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}|"), key_col)), 1, 15), 16, 10
    ).cast("long")


def sql_bloom_positions(
    df, key_col: str, m_bits: int = 1024, k: int = 3
):
    """(key, pos) rows: the k double-hashed bit positions of each key
    — h1 = H('b1|key') mod m, step h2 = H('b2|key') mod (m-1) + 1
    (never 0, so the k probes are distinct mod m when m is prime-ish
    and k small). Feed the DISTINCT pos of the member set as the bit
    array; a candidate is bloom-positive iff ALL its k positions are
    set."""
    from pyspark.sql import functions as F

    key = F.col(key_col).cast("string")
    h1 = _sql_bloom_h(key, "b1") % F.lit(m_bits)
    h2 = _sql_bloom_h(key, "b2") % F.lit(m_bits - 1) + F.lit(1)
    return df.select(
        F.col(key_col),
        h1.alias("_h1"),
        h2.alias("_h2"),
        F.explode(F.sequence(F.lit(0), F.lit(int(k) - 1))).alias("_i"),
    ).select(
        key_col,
        F.pmod(F.col("_h1") + F.col("_i") * F.col("_h2"), F.lit(m_bits)).alias(
            "pos"
        ),
    )


def sql_bloom_membership(
    members, candidates, key_col: str, m_bits: int = 1024, k: int = 3
):
    """Per candidate key: bloom_positive (all k positions set by the
    member set). Structurally zero false negatives; false positives
    at the textbook (1 - e^(-kn/m))^k rate — the calibration twin for
    sizing the production filter. Shape: one distinct over member
    positions (≤ m rows — the bit array), broadcast to the candidate
    probes, one HashAggregate; never a key-by-key join."""
    from pyspark.sql import functions as F

    bits = (
        sql_bloom_positions(members, key_col, m_bits, k)
        .select("pos")
        .distinct()
        .withColumn("_set", F.lit(1))
    )
    probes = sql_bloom_positions(candidates, key_col, m_bits, k)
    return (
        probes.join(F.broadcast(bits), "pos", "left")
        .groupBy(key_col)
        .agg(
            (F.sum(F.coalesce(F.col("_set"), F.lit(0))) == k)
            .cast("int")
            .alias("bloom_positive")
        )
    )
