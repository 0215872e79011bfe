"""Registrable-domain (eTLD+1) extraction via longest public-suffix
match.

Crawl policy units are usually the *registrable domain*, not the host:
politeness budgets, frontier fairness, and dedup scopes all want
``foo.co.uk`` and ``bar.github.io`` treated as the policy key while
``a.b.foo.co.uk`` rolls up to it. The reference has no notion of this
(it crawls one site per spider run); at frontier scale it's a required
rollup.

Algorithm (the standard publicsuffix.org matching rules, minus
wildcard/exception rules which the embedded sample doesn't need):

1. split the host into labels;
2. generate the last-k-label candidate suffixes (k = 1..3);
3. join against the suffix dim (BROADCAST — the full PSL is ~9k rows);
4. longest match wins; no match falls back to the last label (the PSL
   ``*`` default rule);
5. registrable domain = matched suffix + one more label; a host that IS
   a public suffix has no registrable domain (NULL).

Scale shape: distinct-host projection → 3-way explode → broadcast join
→ HashAggregate(max k) — no window, no skew (hosts are unique keys),
pure JVM exprs end to end.

``_PSL_SAMPLE`` is a frozen, deterministic subset of the public suffix
list (publicsuffix.org — public knowledge) sufficient for tests; real
deployments pass the full list as ``suffixes``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (suffix, n_labels) — ICANN + private-registry samples, frozen for
# deterministic tests. Longest-label-count match wins.
_PSL_SAMPLE: list[str] = [
    "com", "net", "org", "io", "ai", "dev", "app", "test", "edu", "gov",
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "co.in", "com.br", "com.cn",
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "s3.amazonaws.com",
]


def suffix_dim(spark, suffixes: list[str] | None = None) -> DataFrame:
    """The public-suffix dimension: (suffix, suffix_labels)."""
    rows = [(s, s.count(".") + 1) for s in (suffixes or _PSL_SAMPLE)]
    return spark.createDataFrame(rows, "suffix string, suffix_labels int")


def registrable_domains(
    hosts: DataFrame, suffixes: DataFrame, host_col: str = "host"
) -> DataFrame:
    """Map each distinct host to (host, suffix, registrable_domain).

    ``suffix`` is the longest matching public suffix (or the last label
    under the default rule); ``registrable_domain`` is suffix + one
    label, NULL when the host is itself a public suffix.
    """
    max_k = 3
    base = (
        hosts.select(F.col(host_col).alias("host"))
        .distinct()
        .select("host", F.split("host", r"\.").alias("_labels"))
        .select("host", "_labels", F.size("_labels").alias("_n"))
    )
    cands = base.select(
        "host",
        "_labels",
        "_n",
        F.explode(F.sequence(F.lit(1), F.least(F.lit(max_k), F.col("_n")))).alias("_k"),
    ).select(
        "host",
        "_labels",
        "_n",
        "_k",
        F.array_join(F.slice("_labels", F.col("_n") - F.col("_k") + 1, F.col("_k")), ".").alias(
            "_cand"
        ),
    )
    matched = (
        cands.join(F.broadcast(suffixes), cands._cand == suffixes.suffix, "left")
        .groupBy("host")
        .agg(
            F.max(F.when(F.col("suffix").isNotNull(), F.col("_k"))).alias("_match_k"),
            F.first("_labels").alias("_labels"),
            F.first("_n").alias("_n"),
        )
        # default rule: unknown TLD behaves as a 1-label public suffix
        .select(
            "host",
            "_labels",
            "_n",
            F.coalesce("_match_k", F.lit(1)).alias("_k"),
        )
    )
    return matched.select(
        "host",
        F.array_join(F.slice("_labels", F.col("_n") - F.col("_k") + 1, F.col("_k")), ".").alias(
            "suffix"
        ),
        F.when(
            F.col("_n") > F.col("_k"),
            F.array_join(F.slice("_labels", F.col("_n") - F.col("_k"), F.col("_k") + 1), "."),
        ).alias("registrable_domain"),
    )


def with_registrable_domain(
    df: DataFrame, suffixes: DataFrame, host_col: str = "host"
) -> DataFrame:
    """Append suffix + registrable_domain to every row of ``df`` (the
    mapping computes once over distinct hosts, then equi-joins back)."""
    mapping = registrable_domains(df.select(host_col), suffixes, host_col=host_col)
    return df.join(
        mapping.withColumnRenamed("host", host_col), host_col, "left"
    )
