"""Rendezvous (highest-random-weight) sharding for fetch-fleet host
affinity.

A crawl fleet pins every host to exactly one fetcher shard so the
per-host politeness state (last-fetch clock, connection pool, robots
cache) lives in one place. Modulo hashing (``hash(host) % n``)
reshuffles ~100% of hosts whenever the fleet is resized; rendezvous
hashing (HRW, Thaler & Ravishankar 1996) moves only the hosts the new
shard *wins* (~1/(n+1) of them), and every moved host moves TO the
new shard — both properties are consequences of the argmax form and
are asserted by tests, not prose.

Reference parity: the reference runs one Selenium session, so docrawl
has no fleet (``docrawl_core.py`` ``run_spider``'s single driver is
the degenerate n_shards=1 case); this is the scale-out counterpart —
N shards, each behaving like one reference session over its hosts.

100 TB shape: weight computation is per-(host, shard) row compute
over the *host dim* (explode a 16..1024-element sequence), folded by
one codegen HashAggregate (the max is packed into a BIGINT — a
struct max would demote to SortAggregate, CLAUDE.md). No shuffle
beyond the host-dim groupBy; frontier rows pick up their shard via a
broadcast join against the host-dim result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# md5-derived weights use 13 hex chars = 52 bits, so weight*1024 stays
# under 2^63; the low 10 bits carry the shard for the packed argmax.
_MAX_SHARDS = 1024


def rendezvous_weight_col(host, shard, salt: str = "hrw"):
    """52-bit HRW weight for a (host, shard) pair — identical algebra
    in Spark and DuckDB (``('0x' || substr(md5(...), 1, 13))::BIGINT``),
    so shard plans are reproducible across engines.
    """
    return F.conv(
        F.substring(
            F.md5(F.concat_ws(":", host, F.lit(salt), shard.cast("string"))),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")


def rendezvous_assign(
    hosts: DataFrame,
    n_shards: int,
    host_col: str = "host",
    out_col: str = "shard",
    salt: str = "hrw",
) -> DataFrame:
    """One row per distinct ``host_col`` value with its winning shard
    in ``[0, n_shards)``.

    Winner = argmax over shards of the (host, shard) weight; ties (a
    52-bit md5 collision between two shards of one host) break toward
    the smaller shard id deterministically, because the packed key
    carries ``1023 - shard`` in its low bits.
    """
    if not 1 <= int(n_shards) <= _MAX_SHARDS:
        raise ValueError(f"n_shards must be in [1, {_MAX_SHARDS}], got {n_shards}")
    h = hosts.select(F.col(host_col).cast("string").alias(host_col)).distinct()
    e = h.select(
        host_col,
        F.explode(F.sequence(F.lit(0), F.lit(int(n_shards) - 1))).alias("_s"),
    )
    pack = rendezvous_weight_col(F.col(host_col), F.col("_s"), salt) * F.lit(
        _MAX_SHARDS
    ) + (F.lit(_MAX_SHARDS - 1) - F.col("_s"))
    return (
        e.select(host_col, pack.alias("_pack"))
        .groupBy(host_col)
        .agg(F.max("_pack").alias("_m"))
        .select(
            host_col,
            (F.lit(_MAX_SHARDS - 1) - F.col("_m") % _MAX_SHARDS)
            .cast("int")
            .alias(out_col),
        )
    )


def rendezvous_rebalance_plan(
    hosts: DataFrame,
    n_from: int,
    n_to: int,
    host_col: str = "host",
    salt: str = "hrw",
) -> DataFrame:
    """Side-by-side assignment at two fleet sizes: ``host, shard_a
    (n_from shards), shard_b (n_to shards), moved`` — the operational
    artifact for a fleet resize (which hosts to drain, where they go).

    For n_to = n_from + 1 HRW guarantees every moved host lands on the
    new shard (shard_b == n_from); the test suite asserts it.
    """
    a = rendezvous_assign(hosts, n_from, host_col, "shard_a", salt)
    b = rendezvous_assign(hosts, n_to, host_col, "shard_b", salt)
    return a.join(b, host_col).select(
        host_col,
        "shard_a",
        "shard_b",
        (F.col("shard_a") != F.col("shard_b")).cast("int").alias("moved"),
    )
