"""Robots META directives + rel=canonical — the in-page half of the
Robots Exclusion Protocol.

robots.txt (operators/politeness) gates FETCHING; pages then carry
their own crawler directives the reference never reads but every real
crawl must honor:

- ``<meta name="robots" content="noindex, nofollow">`` — noindex:
  don't keep/index the document; nofollow: don't expand its outlinks
  into the frontier; ``none`` ≡ both (Google/Bing REP extension —
  robots.txt itself is RFC 9309, meta directives are the de-facto
  HTML companion);
- ``<link rel="canonical" href="…">`` — the page's self-declared
  canonical URL: the strongest URL-level dedup signal (stronger than
  DUST/mirror inference, because the site asserts it).

Parsing is two-stage regex — extract whole tags, then test/extract
attributes within the tag — deliberately lookahead-free so the same
patterns run identically on Java regex (Spark) and RE2 (DuckDB
oracle / pyarrow). Attribute ORDER inside the tag therefore doesn't
matter.

Scale shape: robots_meta_directives is posexplode(meta tags) →
filter(name=robots) → explode(content tokens) → one HashAggregate
back to the doc grain (the house shape for per-element compute —
CLAUDE.md: HOF lambdas run interpreted, explode→HashAggregate doesn't)
+ a left join onto the doc universe for tag-free docs.
rel_canonical_col is a pure per-row column expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_META_TAG_RE = r"(?i)<meta[^>]*>"
_NAME_ROBOTS_RE = r"""(?i)name\s*=\s*["']?robots["']?"""
_CONTENT_RE = r"""(?i)content\s*=\s*["']([^"']*)["']"""
_CANON_TAG_RE = r"""(?i)<link[^>]*rel\s*=\s*["']?canonical["']?[^>]*>"""
_HREF_RE = r"""(?i)href\s*=\s*["']([^"']*)["']"""


def rel_canonical_col(html: Column) -> Column:
    """href of the FIRST ``<link rel="canonical">`` tag (attr order
    inside the tag irrelevant — href is extracted from the matched tag,
    not the same pattern). No tag / no href / blank → NULL."""
    tag = F.regexp_extract(F.coalesce(html, F.lit("")), _CANON_TAG_RE, 0)
    href = F.trim(F.regexp_extract(tag, _HREF_RE, 1))
    return F.when(href == "", F.lit(None).cast("string")).otherwise(href)


def robots_meta_directives(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document robots META directives, unioned across every
    ``<meta name="robots">`` tag on the page (multiple tags compose —
    the restrictive union, per Google's REP documentation). Returns
    (id_col, noindex, nofollow, noarchive, has_robots_meta); ``none``
    in any content sets both noindex and nofollow. Docs without a
    robots meta tag get all-false flags."""
    toks = (
        df.select(
            F.col(id_col),
            F.explode(
                F.regexp_extract_all(
                    F.coalesce(F.col(html_col), F.lit("")),
                    F.lit(_META_TAG_RE),
                    0,
                )
            ).alias("_tag"),
        )
        .where(F.regexp_like(F.col("_tag"), F.lit(_NAME_ROBOTS_RE)))
        .select(
            F.col(id_col),
            F.explode(
                F.split(F.regexp_extract(F.col("_tag"), _CONTENT_RE, 1), ",")
            ).alias("_d"),
        )
        .select(F.col(id_col), F.lower(F.trim(F.col("_d"))).alias("d"))
    )
    flags = toks.groupBy(id_col).agg(
        F.max(F.col("d").isin("noindex", "none")).alias("noindex"),
        F.max(F.col("d").isin("nofollow", "none")).alias("nofollow"),
        F.max(F.col("d") == "noarchive").alias("noarchive"),
        F.lit(True).alias("has_robots_meta"),
    )
    return (
        df.select(id_col)
        .join(flags, id_col, "left")
        .select(
            id_col,
            *[
                F.coalesce(F.col(c), F.lit(False)).alias(c)
                for c in ("noindex", "nofollow", "noarchive", "has_robots_meta")
            ],
        )
    )


def drop_nofollow_edges(
    links: DataFrame,
    directives: DataFrame,
    src_col: str = "src_doc",
    id_col: str = "doc_id",
) -> DataFrame:
    """Frontier-expansion gate: drop every outlink whose SOURCE document
    carries nofollow. The directive frame reduces to the (small)
    nofollow id set before the join, so at scale this is an anti-join
    of the link table against a broadcastable filtered dim — never a
    full links×directives join."""
    nofollow_ids = directives.where(F.col("nofollow")).select(
        F.col(id_col).alias(src_col)
    )
    return links.join(nofollow_ids, src_col, "left_anti")


_LINK_TAG_RE = r"(?i)<link[^>]*>"
_REL_ALTERNATE_RE = r"""(?i)rel\s*=\s*["']?alternate["']?"""
_HREFLANG_RE = r"""(?i)hreflang\s*=\s*["']?([a-zA-Z0-9-]+)["']?"""


def hreflang_alternates(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """``<link rel="alternate" hreflang="…" href="…">`` extraction —
    the multilingual companion of :func:`rel_canonical_col`: a page
    declares its language variants, and a corpus builder uses the
    cluster to (a) pick one variant per language and (b) avoid
    counting translations as near-dups. One row per declared variant:
    (id_col, hreflang lowercase, href), tag order preserved via
    ``alt_order``. Same two-stage lookahead-free tag→attribute
    regexes; ``x-default`` comes through as the literal token.

    Scale shape: extract-all → posexplode → filter + per-tag attribute
    extraction — pure scan pipeline, no shuffle.
    """
    tags = df.select(
        F.col(id_col),
        F.posexplode(
            F.regexp_extract_all(
                F.coalesce(F.col(html_col), F.lit("")), F.lit(_LINK_TAG_RE), 0
            )
        ).alias("alt_order", "_tag"),
    )
    lang = F.lower(F.regexp_extract("_tag", _HREFLANG_RE, 1))
    href = F.trim(F.regexp_extract("_tag", _HREF_RE, 1))
    return (
        tags.where(F.regexp_like(F.col("_tag"), F.lit(_REL_ALTERNATE_RE)))
        .select(
            id_col,
            "alt_order",
            lang.alias("hreflang"),
            href.alias("href"),
        )
        .where((F.col("hreflang") != "") & (F.col("href") != ""))
    )


_OG_PROP_RE = r"""(?i)property\s*=\s*["'](og:[a-z0-9_:.]+)["']"""
_SCRIPT_EL_RE = r"(?i)<script[^>]*>[^<]*</script"
_SCRIPT_ATTRS_RE = r"(?i)<script([^>]*)>"
_SCRIPT_BODY_RE = r">([^<]*)<"
_LDJSON_TYPE_RE = r"""(?i)type\s*=\s*["']application/ld\+json["']"""
_AT_TYPE_RE = r'"@type"\s*:\s*"([^"]+)"'


def og_properties(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """OpenGraph ``<meta property="og:…" content="…">`` extraction —
    the page's self-declared card metadata (title/type/image/url…), a
    high-precision document-metadata source a corpus builder prefers
    over content heuristics when present. One row per og meta tag:
    ``(id_col, og_order, property lowercase, content)``; repeated
    properties (og:image arrays) are preserved in tag order; tags with
    blank content are dropped.

    Same two-stage lookahead-free tag→attribute regexes as the robots
    META family (attr order inside the tag irrelevant; Java regex ≡
    RE2). Scale shape: extract-all → posexplode → filter — pure scan
    pipeline, no shuffle.
    """
    tags = df.select(
        F.col(id_col),
        F.posexplode(
            F.regexp_extract_all(
                F.coalesce(F.col(html_col), F.lit("")), F.lit(_META_TAG_RE), 0
            )
        ).alias("og_order", "_tag"),
    )
    prop = F.lower(F.regexp_extract("_tag", _OG_PROP_RE, 1))
    content = F.trim(F.regexp_extract("_tag", _CONTENT_RE, 1))
    return (
        tags.select(
            id_col,
            "og_order",
            prop.alias("property"),
            content.alias("content"),
        )
        .where((F.col("property") != "") & (F.col("content") != ""))
    )


def jsonld_blocks(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """``<script type="application/ld+json">`` block extraction — the
    schema.org structured-data channel. One row per ld+json script:
    ``(id_col, script_order, jsonld_type, body_chars)`` where
    ``jsonld_type`` is the first ``"@type": "…"`` string in the block
    (NULL when absent) and ``script_order`` is the block's position
    among ALL scripts on the page.

    Deliberate bound: block bodies are matched up to the first ``<``
    (the lookahead-free contract) — valid JSON-LD per the HTML spec
    must escape ``<`` inside script data anyway, so conforming blocks
    are captured whole.
    """
    tags = df.select(
        F.col(id_col),
        F.posexplode(
            F.regexp_extract_all(
                F.coalesce(F.col(html_col), F.lit("")),
                F.lit(_SCRIPT_EL_RE),
                0,
            )
        ).alias("script_order", "_el"),
    )
    attrs = F.regexp_extract("_el", _SCRIPT_ATTRS_RE, 1)
    body = F.trim(F.regexp_extract("_el", _SCRIPT_BODY_RE, 1))
    typ = F.regexp_extract(body, _AT_TYPE_RE, 1)
    return (
        tags.where(F.regexp_like(attrs, F.lit(_LDJSON_TYPE_RE)))
        .select(
            id_col,
            "script_order",
            F.when(typ == "", F.lit(None).cast("string"))
            .otherwise(typ)
            .alias("jsonld_type"),
            F.length(body).cast("long").alias("body_chars"),
        )
    )


def hreflang_reciprocity(
    alternates: DataFrame,
    url_col: str = "url",
    href_col: str = "href",
    lang_col: str = "hreflang",
) -> DataFrame:
    """Reciprocity audit over hreflang declarations: a declaration
    A→B only *binds* if B declares some alternate back at A (the
    return-tag rule — Google ignores non-reciprocal hreflang, so a
    variant cluster built from unaudited declarations inflates the
    translation groups that near-dup accounting relies on).

    One row per declaration: ``(url, href, hreflang, reciprocal)``
    with ``reciprocal`` 1 iff the reverse edge exists (any language
    label; self-declarations are dropped).

    Scale shape: the declaration table self-joins once on the
    REVERSED (href, url) key — edge-grain equi-join, the url-level
    twin of datapipe/graph.host_reciprocity; no window, no fan-out.
    """
    e = alternates.select(
        F.col(url_col).alias("url"),
        F.col(href_col).alias("href"),
        F.col(lang_col).alias("hreflang"),
    ).where(F.col(url_col) != F.col(href_col))
    back = e.select(
        F.col("url").alias("_b_url"), F.col("href").alias("_b_href")
    ).distinct()
    j = e.join(
        back,
        (e["href"] == back["_b_url"]) & (e["url"] == back["_b_href"]),
        "left",
    )
    return j.select(
        "url",
        "href",
        "hreflang",
        F.col("_b_url").isNotNull().cast("int").alias("reciprocal"),
    )
