"""Mirror-host and DUST detection over exact content identity.

DUST ("Different URLs, Same Text", Bar-Yossef et al., WWW'07) and
mirrored hosts are frontier poison at web scale: a site served under
two hostnames doubles its crawl cost, and a URL scheme with aliasing
parameters multiplies it. The reference has no notion of either (one
Selenium session, one URL at a time); in a batch crawler both fall out
of one content-hash aggregation:

- **duplicate-content clusters**: group pages by content hash; every
  cluster with ≥2 members elects a canonical URL (lexicographic min —
  deterministic, engine-independent) and the rest become aliases the
  frontier can collapse.
- **mirror host pairs**: for clusters spanning ≥2 hosts, count shared
  contents per (host_a < host_b) pair; pairs sharing ≥ ``min_shared``
  contents are mirror candidates whose lower-ranked member can be
  deprioritized wholesale.

Scale shape: one map-side-combinable groupBy on the content hash. The
host-pair stage fans out quadratically in hosts-per-hash, so hashes
with more than ``max_hosts_per_hash`` distinct hosts (boilerplate
pages: empty pages, soft-404 bodies, "domain parked" templates — the
hub keys of this join) are EXCLUDED and surfaced via
``n_hub_contents`` accounting rather than silently joined; the join
itself is then bounded at C(max_hosts_per_hash, 2) rows per hash.
Hashing uses md5 (cross-engine: DuckDB reproduces it bit-for-bit);
swap ``hash_col`` for xxhash64 off the oracle path if the 2×-wider
digest ever shows up in shuffle volume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def content_hash_col(text: Column) -> Column:
    """Cross-engine content identity: md5 hex of the raw text."""
    return F.md5(text.cast("string"))


def duplicate_content_clusters(
    docs: DataFrame,
    text_col: str = "text",
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Per duplicate-content cluster: (content_hash, canonical_url,
    n_aliases, n_hosts). Only clusters with ≥2 members (singletons are
    not DUST). One aggregate; min() canonical election rides the same
    HashAggregate."""
    h = docs.select(
        content_hash_col(F.col(text_col)).alias("content_hash"),
        F.col(url_col).alias("url"),
        F.col(host_col).alias("host"),
    )
    return (
        h.groupBy("content_hash")
        .agg(
            F.min("url").alias("canonical_url"),
            F.count("*").alias("n_aliases"),
            F.countDistinct("host").alias("n_hosts"),
        )
        .where(F.col("n_aliases") >= 2)
    )


def dust_alias_map(
    docs: DataFrame,
    text_col: str = "text",
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """(url → canonical_url) for every non-canonical alias — the
    frontier-collapse rule DUST produces. Join back on the content
    hash (clusters frame is per-duplicate-content, far smaller than
    the corpus — broadcast-eligible, AQE decides)."""
    clusters = duplicate_content_clusters(docs, text_col, url_col, host_col)
    h = docs.select(
        content_hash_col(F.col(text_col)).alias("content_hash"),
        F.col(url_col).alias("url"),
    )
    return (
        h.join(clusters.select("content_hash", "canonical_url"), "content_hash")
        .where(F.col("url") != F.col("canonical_url"))
        .select("url", "canonical_url")
    )


def mirror_host_pairs(
    docs: DataFrame,
    text_col: str = "text",
    url_col: str = "url",
    host_col: str = "host",
    min_shared: int = 2,
    max_hosts_per_hash: int = 64,
) -> DataFrame:
    """Host pairs sharing ≥ ``min_shared`` identical contents:
    (host_a, host_b, n_shared) with host_a < host_b. Hub hashes
    (> ``max_hosts_per_hash`` hosts) are excluded from pairing — the
    quadratic guard — and reported as clusters, not pairs."""
    hh = (
        docs.select(
            content_hash_col(F.col(text_col)).alias("content_hash"),
            F.col(host_col).alias("host"),
        )
        .distinct()
    )
    sized = hh.groupBy("content_hash").agg(
        F.count("*").alias("_n_hosts")
    )
    bounded = hh.join(
        sized.where(
            (F.col("_n_hosts") >= 2) & (F.col("_n_hosts") <= max_hosts_per_hash)
        ).select("content_hash"),
        "content_hash",
    )
    a = bounded.select("content_hash", F.col("host").alias("host_a"))
    b = bounded.select("content_hash", F.col("host").alias("host_b"))
    return (
        a.join(b, "content_hash")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
