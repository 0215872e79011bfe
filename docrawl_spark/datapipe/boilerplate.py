"""Block-level main-content extraction (JusText-style).

The host-scoped template strip (datapipe/dedup.strip_host_templates)
removes chrome that REPEATS across a site; this module classifies
boilerplate WITHIN a single page by block shape — the JusText/Boilerpipe
insight (Pomikálek 2011; Kohlschütter WSDM'10): navigation/footer
blocks are short and link-dense, body prose is long and stopword-dense.
Single-pass variant of JusText's classifier (no context-smoothing
passes), integer-exact so a DuckDB oracle matches bit-for-bit:

- segment the page on block-level tag boundaries (order preserved);
- per block: visible text (tags stripped, whitespace collapsed),
  link_ppm = anchor-text chars ·10^6 div text chars (clamped),
  stop_ppm = stopword tokens ·10^6 div tokens;
- label: ``bad`` (link-dense) / ``short`` (too few words) / ``good``
  (stopword-dense prose) / ``near_good``.

All patterns are RE2-compatible (no lookarounds, no lazy quantifiers —
anchors captured with ``[^<]*``) so Spark's Java regex and the DuckDB
oracle agree. DuckDB's regexp_replace needs the explicit ``'g'`` flag
where Spark replaces globally by default — mirrored in the oracle.

Scale shape: split → posexplode → pure per-block column exprs → (for
main-text re-assembly) one groupBy(doc) with sort_array, exactly the
strip_host_templates pattern. The one HOF (stopword token filter) runs
over a single block's tokens — bounded, not a corpus-shaped hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BLOCK_SPLIT_RE = (
    r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|section|article"
    r"|header|footer|nav|aside|blockquote|br)\b[^>]*>"
)
_ANCHOR_TEXT_RE = r"(?i)<a\b[^>]*>([^<]*)</a>"
_TAG_RE = r"<[^>]*>"

# Function words for the prose signal — deliberately small and pinned
# (JusText ships per-language lists; the classifier only needs enough
# mass to separate prose from nav labels).
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "at", "is",
    "are", "was", "were", "be", "that", "this", "it", "for", "with",
    "as", "by", "from", "but", "not",
]


def classify_blocks(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    max_link_ppm: int = 500_000,
    min_words: int = 5,
    good_stop_ppm: int = 300_000,
) -> DataFrame:
    """One row per non-empty block: (id_col, block_order, text, n_words,
    link_ppm, stop_ppm, label). block_order is the block's position in
    the ORIGINAL page (pre-drop), so re-assembly preserves layout."""
    stops = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    raw = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(html_col), F.lit("")), _BLOCK_SPLIT_RE)
        ).alias("block_order", "_raw"),
    )
    anchor_chars = F.length(
        F.array_join(F.regexp_extract_all(F.col("_raw"), F.lit(_ANCHOR_TEXT_RE), 1), "")
    ).cast("long")
    text = F.trim(
        F.regexp_replace(F.regexp_replace(F.col("_raw"), _TAG_RE, " "), r"\s+", " ")
    )
    staged = raw.select(
        id_col,
        "block_order",
        text.alias("text"),
        anchor_chars.alias("_a_chars"),
    ).where(F.col("text") != "")
    toks = F.split(F.col("text"), " ")
    n_words = F.size(toks).cast("long")
    stop_hits = F.size(
        F.filter(toks, lambda t: F.array_contains(stops, F.lower(t)))
    ).cast("long")
    feats = staged.select(
        id_col,
        "block_order",
        "text",
        n_words.alias("n_words"),
        F.col("_a_chars"),
        stop_hits.alias("_stop_hits"),
    ).select(
        id_col,
        "block_order",
        "text",
        "n_words",
        F.least(
            F.expr("_a_chars * 1000000L div greatest(length(text), 1L)"),
            F.lit(1_000_000).cast("long"),
        ).alias("link_ppm"),
        F.expr("_stop_hits * 1000000L div greatest(n_words, 1L)").alias(
            "stop_ppm"
        ),
    )
    label = (
        F.when(F.col("link_ppm") > max_link_ppm, F.lit("bad"))
        .when(F.col("n_words") < min_words, F.lit("short"))
        .when(F.col("stop_ppm") >= good_stop_ppm, F.lit("good"))
        .otherwise(F.lit("near_good"))
    )
    return feats.select(
        id_col, "block_order", "text", "n_words", "link_ppm", "stop_ppm",
        label.alias("label"),
    )


def extract_main_text(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    keep_labels: tuple[str, ...] = ("good", "near_good"),
    **classify_kwargs,
) -> DataFrame:
    """Re-assemble each page's main text from its kept blocks in
    original block order: (id_col, main_text, n_blocks, n_kept). Pages
    whose blocks are ALL boilerplate still appear (empty main_text) —
    the corpus filter downstream decides their fate."""
    blocks = classify_blocks(df, html_col=html_col, id_col=id_col, **classify_kwargs)
    kept = F.col("label").isin(*keep_labels)
    return blocks.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_blocks"),
        F.sum(kept.cast("long")).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(kept, F.struct(F.col("block_order"), F.col("text")))
                    )
                ),
                lambda s: s.getField("text"),
            ),
            " ",
        ).alias("main_text"),
    ).select(id_col, "main_text", "n_blocks", "n_kept")
