"""Crawl-trap detection: flag URL *patterns* that would swallow the
frontier at scale (calendar pages, session-id explosions, faceted
search, path cycles).

The reference has no trap defense at all — its frontier is a Python
list and a 10^5-page calendar trap simply runs forever
(`/root/reference/docrawl/docrawl_core.py` parse loop). At a 10^10-URL
frontier, traps are the difference between crawling the web and
crawling one misconfigured host, so this is a first-class scheduler
input, not an afterthought.

Method (all JVM-side, one groupBy per stage, no UDFs):

1. **URL signature**: collapse every path segment's digit runs to '#'
   and every long hex-ish token to '@', drop query *values* keeping
   sorted query *keys* — e.g.
   ``https://h/cal/2024/05/31?d=x&sid=abc`` →
   ``/cal/#/#/#?d&sid``. URLs minted by the same template share a
   signature regardless of parameter values.
2. **Per-(host, signature) stats**: n_urls, distinct parents, max
   depth. A signature whose n_urls exceeds ``max_urls_per_sig`` AND
   whose share of its host's candidates exceeds ``max_host_share`` is
   a trap candidate.
3. **Path-cycle guard** (the classic ``/a/b/a/b/a/b`` symlink trap):
   any URL whose path repeats one segment ≥ ``cycle_min_repeats``
   times is flagged row-level, independent of volume.

``flag_traps`` returns the per-signature verdict table;
``trap_gate`` anti-joins the candidate stream against trapped
signatures (broadcast — the verdict table is per-template, tiny
relative to the frontier) and drops cycle rows inline.

Scale shape: signature extraction is stringops in whole-stage codegen;
the stats aggregate is map-side combinable on (host, sig); the gate is
a broadcast anti-join — no extra shuffle of the frontier itself beyond
the one aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# path segment normalization: digit runs -> '#', >=8-char hex tokens ->
# '@' (session ids, uuids, content hashes)
_HEXISH = "^[0-9a-fA-F]{8,}$"


def url_signature_col(url: Column) -> Column:
    """Template signature of a URL (see module docstring). Pure
    string/array exprs — stays in codegen."""
    no_scheme = F.regexp_replace(url, r"^[a-z][a-z0-9+.-]*://[^/?#]*", "")
    path = F.regexp_extract(no_scheme, r"^([^?#]*)", 1)
    query = F.regexp_extract(no_scheme, r"\?([^#]*)", 1)
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    norm = F.transform(
        segs,
        lambda s: F.when(s.rlike(_HEXISH), F.lit("@")).otherwise(
            F.regexp_replace(s, r"[0-9]+", "#")
        ),
    )
    sig_path = F.concat(F.lit("/"), F.array_join(norm, "/"))
    keys = F.array_sort(
        F.filter(
            F.transform(F.split(query, "&"), lambda p: F.split(p, "=")[0]),
            lambda k: k != "",
        )
    )
    return F.when(F.size(keys) > 0, F.concat(sig_path, F.lit("?"), F.array_join(keys, "&"))).otherwise(sig_path)


def path_cycle_col(url: Column, min_repeats: int = 3) -> Column:
    """True when one path segment occurs ≥ min_repeats times — the
    recursive-symlink / cycle trap, flagged per row with no volume
    evidence needed. Bounded per-row array work (paths are short)."""
    no_scheme = F.regexp_replace(url, r"^[a-z][a-z0-9+.-]*://[^/?#]*", "")
    path = F.regexp_extract(no_scheme, r"^([^?#]*)", 1)
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    # max multiplicity of any segment = size - size(distinct) >= k-1 is
    # necessary but not sufficient; check exact max count via transform
    counts = F.transform(
        F.array_distinct(segs),
        lambda d: F.size(F.filter(segs, lambda s: s == d)),
    )
    return F.coalesce(
        F.array_max(counts) >= F.lit(min_repeats), F.lit(False)
    )


def signature_stats(
    candidates: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Per-(host, signature) volume stats over a candidate stream:
    (host, sig, n_urls, n_parents, max_depth, host_urls, host_share).
    One map-side-combinable aggregate + a host-level rollup joined
    back (the host dim is small — broadcast)."""
    with_sig = candidates.select(
        F.col(host_col).alias("host"),
        url_signature_col(F.col(url_col)).alias("sig"),
        F.col(url_col).alias("url"),
        "discovered_by",
        "depth",
    )
    per_sig = with_sig.groupBy("host", "sig").agg(
        F.count("*").alias("n_urls"),
        F.count_distinct("discovered_by").alias("n_parents"),
        F.max("depth").alias("max_depth"),
    )
    per_host = per_sig.groupBy("host").agg(F.sum("n_urls").alias("host_urls"))
    return per_sig.join(F.broadcast(per_host), "host").withColumn(
        "host_share", F.col("n_urls") / F.col("host_urls")
    )


def flag_traps(
    candidates: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    max_urls_per_sig: int = 100,
    max_host_share: float = 0.5,
) -> DataFrame:
    """Trap verdicts: signatures that are BOTH high-volume and dominate
    their host's frontier share. Returns (host, sig, n_urls, n_parents,
    max_depth, host_urls, host_share, is_trap)."""
    stats = signature_stats(candidates, url_col, host_col)
    return stats.withColumn(
        "is_trap",
        (F.col("n_urls") > F.lit(max_urls_per_sig))
        & (F.col("host_share") > F.lit(max_host_share)),
    )


def trap_gate(
    candidates: DataFrame,
    traps: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    cycle_min_repeats: int = 3,
) -> DataFrame:
    """Drop candidates whose (host, signature) is a flagged trap or
    whose path cycles. The trap table is template-level (tiny) —
    broadcast anti-join; the cycle check is row-local."""
    sig = url_signature_col(F.col(url_col)).alias("sig")
    trapped = traps.where(F.col("is_trap")).select(
        F.col("host").alias("_t_host"), F.col("sig").alias("_t_sig")
    )
    keyed = candidates.withColumn("_sig", url_signature_col(F.col(url_col)))
    gated = keyed.join(
        F.broadcast(trapped),
        (keyed[host_col] == F.col("_t_host")) & (F.col("_sig") == F.col("_t_sig")),
        "left_anti",
    )
    return gated.where(
        ~path_cycle_col(F.col(url_col), cycle_min_repeats)
    ).drop("_sig")


def soft404_flags(
    pages: DataFrame,
    host_col: str = "host",
    status_col: str = "status",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Soft-404 detection: a host's REAL 404 responses define its
    error-template signature set (md5 of the whitespace-normalized
    body); any 200 response whose body hashes into that set is a "soft
    404" — an error page served with a success status, which would
    otherwise pollute the corpus and the recrawl change-rate stats
    (reference drops these pages on status alone,
    docrawl_core.py:1094-1105 — status can't catch them).

    Returns every 200-status page with a ``soft_404`` flag. Scale
    shape: the template side is (host × distinct-error-template) —
    a few rows per host regardless of corpus size — so it broadcasts;
    the probe is one broadcast-hash lookup per fetched page, no
    shuffle of the page table."""
    from docrawl_spark.datapipe.dedup import normalized_text_col

    p = pages.withColumn("_sig", F.md5(normalized_text_col(F.col(text_col))))
    templates = (
        p.where(F.col(status_col) == 404)
        .select(F.col(host_col), F.col("_sig"))
        .distinct()
        .withColumn("_t", F.lit(True))
    )
    return (
        p.where(F.col(status_col) == 200)
        .join(F.broadcast(templates), [host_col, "_sig"], "left")
        .select(
            F.col(id_col),
            F.col(host_col),
            F.coalesce(F.col("_t"), F.lit(False)).alias("soft_404"),
        )
    )
