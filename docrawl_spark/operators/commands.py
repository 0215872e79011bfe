"""Batch analogues of the remaining reference client commands —
completing the SURVEY.md §2.1 operator inventory (O4, O5, O7, O8, O12,
O13, O14, O24). Each docstring cites the reference behavior it
re-expresses; operators that are browser-interaction-only (O9-O11,
O15, O16, O18) are intentionally dropped per SURVEY.md §2.1 and listed
in PARITY.md.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from docrawl_spark.functions.canon import host_of_col, url_hash_col, with_abs_url
from docrawl_spark.operators.extract import extract_kind

# ---------------------------------------------------------------------------
# O5 extract_multiple_xpaths (docrawl_core.py:920-947)
# ---------------------------------------------------------------------------


def extract_multiple_kinds(docs: DataFrame, kinds: list[str]) -> DataFrame:
    """O5: run the O4 extraction for a LIST of kinds; the reference
    builds a row-per-xpath matrix (pd.DataFrame(result)) — here the
    long form (doc_id, kind_idx, kind, line_no, line), with the
    reference's per-xpath ['None'] empty marker preserved."""
    parts = []
    for i, kind in enumerate(kinds):
        parts.append(
            extract_kind(docs, kind).select(
                "doc_id",
                F.lit(i).alias("kind_idx"),
                F.lit(kind).alias("kind"),
                "line_no",
                "line",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def extract_multiple_kinds_matrix(
    docs: DataFrame, kinds: list[str], max_cols: int = 8
) -> DataFrame:
    """O5 matrix form — the reference builds ``pd.DataFrame(result)``
    with one ROW per xpath and positional line columns, NaN-padded
    (docrawl_core.py:920-947, then → xlsx at :942). Here: the long form
    re-ranks surviving lines per (doc, kind) to 0..n-1 (empties were
    dropped by O4, so positions close up exactly like list indices),
    then pivots with an EXPLICIT column domain (no extra distinct pass
    over the data to discover pivot values at scale). Lines beyond
    ``max_cols`` are dropped — the caller picks the matrix width, as
    the reference's xlsx writer effectively does."""
    from pyspark.sql import Window

    long = extract_multiple_kinds(docs, kinds)
    w = Window.partitionBy("doc_id", "kind_idx").orderBy("line_no")
    ranked = long.withColumn("col", F.row_number().over(w) - 1)
    piv = (
        ranked.where(F.col("col") < max_cols)
        .groupBy("doc_id", "kind_idx", "kind")
        .pivot("col", list(range(max_cols)))
        .agg(F.first("line"))
    )
    return piv.select(
        "doc_id",
        "kind_idx",
        "kind",
        *[F.col(str(i)).alias(f"line_{i}") for i in range(max_cols)],
    )


# ---------------------------------------------------------------------------
# O7 extract_page_source (docrawl_core.py:365-375)
# ---------------------------------------------------------------------------


def raw_pages(fetched: DataFrame) -> DataFrame:
    """O7: dump the raw page per url. The span model's "page source" is
    the spans payload itself; serialized to one JSON string per doc so
    the sink is a plain (doc_id, raw) table."""
    return fetched.select(
        F.col("url").alias("doc_id"),
        F.to_json(F.col("spans")).alias("raw"),
    )


# ---------------------------------------------------------------------------
# O8 get_current_url (docrawl_core.py:736-745)
# ---------------------------------------------------------------------------


def current_urls(fetch_log: DataFrame) -> DataFrame:
    """O8: the "current url" per crawl position — the fetch_log keyed
    by visit_rank (the sequential client's one-at-a-time cursor)."""
    return fetch_log.select("visit_rank", "wave", "url").orderBy("visit_rank")


# ---------------------------------------------------------------------------
# O12/O13/O14 click_xpath / click_name / click_class
# (docrawl_core.py:838-860, 285-293)
# ---------------------------------------------------------------------------


def follow_clicks(
    fetched: DataFrame,
    kinds: tuple[str, ...] = ("button", "link"),
    text_equals: str | None = None,
) -> DataFrame:
    """Clicking ≈ following the media_ref of button/link spans
    (SURVEY.md O12). ``text_equals`` restricts to spans whose text
    matches exactly — the O13 click-by-link-text semantics (the
    reference's own `_click_name` has a latent By.LINK_TEXT bug,
    docrawl_core.py:860; we implement the documented intent).

    Output: frontier-edge rows (url, host, host_hash, url_hash,
    discovered_by, offset) ready for the dedup → politeness stages."""
    def pred(s: Column) -> Column:
        p = s["kind"].isin(*kinds) & (F.coalesce(s["media_ref"], F.lit("")) != "")
        if text_equals is not None:
            p = p & (s["text"] == text_equals)
        return p

    clicks = F.filter(F.col("spans"), pred)
    exploded = fetched.select(
        F.col("url").alias("discovered_by"),
        F.explode(clicks).alias("s"),
    ).select(
        "discovered_by",
        F.col("s.offset").alias("offset"),
        F.col("s.media_ref").alias("media_ref"),
    )
    canon = with_abs_url(exploded, "media_ref", "discovered_by")
    good = canon.where(F.col("canon_error").isNull())
    return good.select(
        "url",
        host_of_col("url").alias("host"),
        url_hash_col(host_of_col("url")).alias("host_hash"),
        url_hash_col("url").alias("url_hash"),
        "discovered_by",
        "offset",
    )


# ---------------------------------------------------------------------------
# O24 classify_element_by_xpath (elements.py:35-48)
# ---------------------------------------------------------------------------

# PREDEFINED_TAGS tag → kind vocabulary (elements.py:52-84), flattened
# to a last-segment-tag lookup exactly like classify_element_by_xpath.
_TAG_TO_KIND = {
    "table": "table",
    "ul": "bullet",
    "ol": "bullet",
    "p": "text",
    "strong": "text",
    "em": "text",
    "div": "text",
    "span": "text",
    "h1": "headline",
    "h2": "headline",
    "h3": "headline",
    "h4": "headline",
    "h5": "headline",
    "h6": "headline",
    "img": "image",
    "button": "button",
    "a": "link",
    "input": "input",
    "textarea": "input",
}


def classify_xpath_col(xpath: Column) -> Column:
    """O24: map an XPath's last segment tag to an ElementType via the
    PREDEFINED_TAGS vocabulary; unknown → 'element' (the generic kind,
    elements.py:46-48). Bracket predicates ([...]) are stripped from
    the segment like the reference's tag comparison."""
    last = F.element_at(F.split(xpath, "/"), -1)
    tag = F.lower(F.regexp_extract(last, r"^([A-Za-z0-9]+)", 1))
    mapping = F.create_map(
        *[F.lit(x) for kv in _TAG_TO_KIND.items() for x in kv]
    )
    return F.coalesce(mapping[tag], F.lit("element"))
