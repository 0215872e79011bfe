"""Deterministic synthetic web fixtures (FIXTURES.md §1-§4).

Two generators:

- ``generate_web`` — pure-Python, seeded, small-scale (pytest): builds a
  reproducible web graph of span documents with hot hosts (skew), all
  relative-url forms (exercising the non-RFC ``build_abs_url``
  semantics), javascript:/mailto: refs (link-filter), robots-blocked
  paths, a "raw" variant with empty-text and duplicate spans for the
  extraction-kernel rules, and table/bullet payloads for the O6 kernel.

- ``generate_frontier_spark`` — Spark-side deterministic generation for
  the bench: millions of synthetic frontier URLs from a ``spark.range``
  with hash-derived pseudo-randomness (no Python in the loop), so bench
  inputs scale without driver-side materialization.

Span payload encodings (the span model carries what the reference reads
off the DOM; fixtures pre-apply DOM-only rules per FIXTURES.md):

- kind='table': ``text`` = JSON ``{"th": [..]|null, "rows": [[..]..]}``
  (reference reads <th>/<td> trees, docrawl_core.py:479-541).
- kind='bullet': ``text`` = JSON list of per-<li> fragment lists
  (reference reads .//text() per li, docrawl_core.py:431-450).
"""

from __future__ import annotations

import hashlib
import json
import random
from dataclasses import dataclass, field

# Fixed section order mirrors the reference's scan order
# (docrawl_core.py:657-712): input→tables→bullets→texts→headlines→
# links→images→buttons→context→cookies.
SECTION_ORDER = (
    "input",
    "table",
    "bullet",
    "text",
    "headline",
    "link",
    "image",
    "button",
    "context",
    "cookies",
)


@dataclass
class WebFixture:
    documents: dict[str, list[dict]]       # clean: url -> ordered spans
    documents_raw: dict[str, list[dict]]   # with empties + duplicates injected
    hosts: list[dict]                      # host dim rows
    seeds: list[dict]                      # {url, seed_order}
    params: dict = field(default_factory=dict)


def _span(kind: str, text: str = "", media_ref: str = "", offset: int = 0) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def _page_paths(rng: random.Random, n: int, with_private: bool) -> list[str]:
    paths = []
    for i in range(n):
        r = rng.random()
        if with_private and r < 0.15:
            paths.append(f"/private/p{i}")
        elif r < 0.45:
            paths.append(f"/a{rng.randrange(3)}/b{rng.randrange(2)}/p{i}")
        else:
            paths.append(f"/p{i}")
    return paths


def _relative_form(rng: random.Random, target_path: str, from_path: str) -> str:
    """Pick a media_ref form for a same-host link such that the
    REFERENCE ``build_abs_url`` semantics (base's last segment is a
    directory) resolve it back to ``target_path``."""
    form = rng.randrange(4)
    if form == 0:  # domain-relative
        return target_path
    tgt = target_path.lstrip("/").split("/")
    base = [s for s in from_path.split("/")[1:] if s != ""]
    if form == 1:  # path-relative with ../ : pop ALL base segments, then walk down
        return "/".join([".."] * len(base) + tgt)
    if form == 2:  # path-relative with noise segments (./ and x/..)
        return "/".join([".."] * len(base) + ["./"[:1]] + ["zz", ".."] + tgt)
    return target_path  # default domain-relative


def generate_web(
    n_hosts: int = 6,
    pages_cold: int = 6,
    pages_hot: int = 18,
    seed: int = 42,
    n_seeds: int = 5,
) -> WebFixture:
    rng = random.Random(seed)
    host_names = [f"site{k}.test" for k in range(n_hosts)]
    # site0 uses plain http so the 'http' seed quirk round-trips to a
    # real document key; the rest are https.
    scheme = {h: ("http" if k == 0 else "https") for k, h in enumerate(host_names)}
    # hosts 0 and 1 are deliberately hot (skew): ~50% of all pages.
    pages_of: dict[str, list[str]] = {}
    for k, h in enumerate(host_names):
        n = pages_hot if k < 2 else pages_cold
        pages_of[h] = _page_paths(rng, n, with_private=(k == 1))
    all_urls = [
        f"{scheme[h]}://{h}{p}" for h in host_names for p in pages_of[h]
    ]

    hosts = []
    for k, h in enumerate(host_names):
        hosts.append(
            {
                "host": h,
                "crawl_delay": 1.0 if k < 2 else 0.5,
                "budget": 4 if k < 2 else 3,
                # host1 blocks /private (FIXTURES.md §3); others allow all.
                "robots_blob": "/private" if k == 1 else "",
            }
        )

    documents: dict[str, list[dict]] = {}
    documents_raw: dict[str, list[dict]] = {}
    for h in host_names:
        for p in pages_of[h]:
            url = f"{scheme[h]}://{h}{p}"
            clean: list[dict] = []
            raw: list[dict] = []

            clean_keys: set[tuple] = set()

            def add(kind: str, text: str = "", media_ref: str = "") -> None:
                # the clean variant is the kernel's output: keep-first on
                # (kind, text, media_ref) — generators may re-emit e.g.
                # two identical javascript: links
                key = (kind, text, media_ref)
                if key not in clean_keys:
                    clean_keys.add(key)
                    clean.append(_span(kind, text, media_ref, len(clean)))
                raw.append(_span(kind, text, media_ref, len(raw)))

            def add_raw_only(kind: str, text: str = "", media_ref: str = "") -> None:
                raw.append(_span(kind, text, media_ref, len(raw)))

            # -- input
            if rng.random() < 0.3:
                add("input", f"q-{h}-{p}")
            # -- table (with/without th, ragged, all-empty rows)
            if rng.random() < 0.5:
                variant = rng.randrange(4)
                if variant == 0:  # th titles (with \n\t removal + cleaner work)
                    payload = {
                        "th": [["col", "A\n"], ["\tcol", "B"]],
                        "rows": [[["1 "], [" x\\q"]], [["2"], ["y", "z"]]],
                    }
                elif variant == 1:  # no th: first non-empty row promoted
                    payload = {
                        "th": None,
                        "rows": [[["hA"], ["hB"]], [["3"], ["z"]], [["4"], ["w"]]],
                    }
                elif variant == 2:  # ragged longer than titles: fallback
                    payload = {
                        "th": [["only1"]],
                        "rows": [[["a"], ["b"], ["c"]], [["d"], ["e"], ["f"]]],
                    }
                else:  # empty row in the middle → all-NaN → dropna
                    payload = {
                        "th": [["cA"], ["cB"]],
                        "rows": [[["h1"], ["h2"]], [], [["5"], ["v"]]],
                    }
                add("table", json.dumps(payload))
            # raw-only degenerate tables (<2 <tr>): the scan-time guard
            # (docrawl_core.py:604-605) must drop these before offsets
            # re-rank. Decision is hash-derived, NOT an rng draw — the
            # rng sequence (and thus the golden files) must not shift.
            _dg = int(hashlib.md5(f"{url}|tr-guard".encode()).hexdigest(), 16) % 4
            if _dg == 0:  # single data row, no th → 1 <tr>
                add_raw_only(
                    "table", json.dumps({"th": None, "rows": [[["solo"], ["row"]]]})
                )
            elif _dg == 1:  # header-only table → 1 <tr>
                add_raw_only(
                    "table", json.dumps({"th": [["only"], ["head"]], "rows": []})
                )
            # -- bullet (fragments incl. \xa0 and empties)
            if rng.random() < 0.5:
                add(
                    "bullet",
                    json.dumps(
                        [["item ", "one\xa0a"], ["", "  "], [f"{p} item2\\x"]]
                    ),
                )
            # -- texts (+ raw-only empties)
            add("text", f"Body text of {url} with  padding \\ and stuff.")
            if rng.random() < 0.6:
                add("text", f"second paragraph on {p}")
            add_raw_only("text", "   ")  # empty-after-strip → kernel drops
            # -- headline
            add("headline", f"Headline {h} {p}")
            add_raw_only("headline", "")
            # -- links
            n_links = rng.randrange(2, 6)
            for _ in range(n_links):
                r = rng.random()
                if r < 0.08:
                    add("link", "js nav", "javascript:void(0)")
                elif r < 0.14:
                    add("link", "mail us", f"mailto:info@{h}")
                elif r < 0.42:  # cross-host absolute
                    tgt = rng.choice(all_urls)
                    add("link", f"to {tgt}", tgt)
                elif r < 0.50:  # dangling (404) target
                    add("link", "dead", f"/missing/m{rng.randrange(9)}")
                else:  # same-host relative form
                    tgt_path = rng.choice(pages_of[h])
                    add("link", f"rel {tgt_path}", _relative_form(rng, tgt_path, p))
            # -- images (?query exercises extension parsing, docrawl_core.py:809,829)
            if rng.random() < 0.6:
                suffix = "?w=300&fmt=webp" if rng.random() < 0.5 else ""
                add("image", "alt text", f"/static/img{rng.randrange(5)}.png{suffix}")
            # -- button
            if rng.random() < 0.3:
                add("button", "Next", f"/p{rng.randrange(pages_cold)}")
            # -- context / cookies (rare)
            if rng.random() < 0.1:
                add("context", "ctx blob")
            if rng.random() < 0.1:
                add("cookies", "Accept cookies")

            # raw-only duplicates of a couple of earlier spans (xpath-equivalent
            # re-discovery; reference dedups at docrawl_core.py:597-618)
            for s in clean[:2]:
                if rng.random() < 0.5:
                    add_raw_only(s["kind"], s["text"], s["media_ref"])

            documents[url] = clean
            documents_raw[url] = raw

    # seeds: first one exercises the 'http' substring quirk (site0 is http://)
    seeds = [{"url": f"{host_names[0]}/p0", "seed_order": 0}]
    candidates = [u for u in all_urls if not u.endswith("/p0")]
    rng.shuffle(candidates)
    for i, u in enumerate(candidates[: n_seeds - 1], start=1):
        seeds.append({"url": u, "seed_order": i})

    return WebFixture(
        documents=documents,
        documents_raw=documents_raw,
        hosts=hosts,
        seeds=seeds,
        params={"n_hosts": n_hosts, "seed": seed},
    )


def fixture_to_dfs(spark, fx: WebFixture, raw: bool = True):
    """WebFixture → (documents_df, hosts_df, seeds_df) Spark frames."""
    from pyspark.sql import functions as F

    from docrawl_spark.sources.schemas import DOCUMENTS_SCHEMA, SEEDS_SCHEMA

    docs = fx.documents_raw if raw else fx.documents
    doc_rows = [
        (url, [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans])
        for url, spans in docs.items()
    ]
    documents_df = spark.createDataFrame(doc_rows, DOCUMENTS_SCHEMA)
    hosts_df = spark.createDataFrame(
        [
            (h["host"], h["crawl_delay"], h["budget"], h["robots_blob"])
            for h in fx.hosts
        ],
        "host string, crawl_delay double, budget int, robots_blob string",
    ).withColumn("host_hash", F.xxhash64("host"))
    seeds_df = spark.createDataFrame(
        [(s["url"], s["seed_order"]) for s in fx.seeds], SEEDS_SCHEMA
    )
    return documents_df, hosts_df, seeds_df


# --------------------------------------------------------------------------
# Spark-side frontier/documents generation for the bench (no Python loop).
# --------------------------------------------------------------------------


def generate_frontier_spark(spark, n_urls: int, n_hosts: int, zipf_hot_frac: float = 0.5):
    """Deterministic synthetic frontier of ``n_urls`` candidate URLs over
    ``n_hosts`` hosts where ~``zipf_hot_frac`` of urls land on 1% of
    hosts (hot-host skew), generated entirely JVM-side from
    ``spark.range`` + xxhash64 — scales to 10^9+ rows without touching
    the driver."""
    from pyspark.sql import functions as F

    n_hot = max(1, n_hosts // 100)
    base = spark.range(n_urls)  # id
    h = F.xxhash64(F.col("id").cast("string"))
    # deterministic "random" in [0,1): abs(hash)/2^63
    u01 = (F.abs(h) / F.lit(float(2**63))).alias("u")
    df = base.select("id", u01)
    host_idx = F.when(
        F.col("u") < zipf_hot_frac,
        F.pmod(F.xxhash64(F.col("id").cast("string"), F.lit("hot")), F.lit(n_hot)),
    ).otherwise(
        n_hot
        + F.pmod(
            F.xxhash64(F.col("id").cast("string"), F.lit("cold")),
            F.lit(max(1, n_hosts - n_hot)),
        )
    )
    df = df.withColumn("host", F.concat(F.lit("site"), host_idx, F.lit(".test")))
    df = df.withColumn(
        "url",
        F.concat(
            F.lit("https://"), F.col("host"), F.lit("/p"), F.col("id").cast("string")
        ),
    )
    return df.select(
        F.xxhash64("url").alias("url_hash"),
        "url",
        "host",
        F.xxhash64("host").alias("host_hash"),
        F.lit(0).alias("depth"),
        F.col("id").alias("parent_rank"),
        F.lit(0).alias("offset"),
        F.lit(0).alias("wave"),
        F.lit("pending").alias("state"),
        F.lit(None).cast("string").alias("discovered_by"),
    )
