"""Document-structure operators over interleaved span documents.

The reference's scan emits page elements in discovery order with
headlines interleaved among text/image spans
(`/root/reference/docrawl/docrawl_core.py:657-712`: the fixed
type-section order, headlines from h1..h6 per `elements.py:55`).
Downstream training-data tooling wants that flat stream re-grouped
into *sections*: every span governed by the nearest preceding
headline, so section-level filtering ("drop boilerplate sections"),
section-aware packing, and outline extraction become relational.

Scale shape: one window per document (`partitionBy(doc_id)
orderBy(offset)`) — partition size is bounded by page size, never by
corpus size, so the running `last(headline, ignoreNulls)` carry is
embarrassingly parallel; the per-section rollup is a plain
HashAggregate on (doc_id, sec_offset).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: sec_offset for spans before the first headline (the preamble).
PREAMBLE_OFFSET = -1


def section_spans(docs: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Assign every span to its governing section.

    Input: ``(doc_id, spans: array<struct<kind,text,media_ref,offset>>)``
    per BASELINE.json input_hint. Output: one row per span —
    ``(doc_id, offset, kind, text, media_ref, sec_offset, sec_title)``
    where ``sec_offset``/``sec_title`` are the offset/text of the
    nearest headline span at or before this span's offset (a headline
    heads its own section). Spans before any headline get
    ``sec_offset = -1`` and an empty title (the preamble section).
    """
    flat = docs.select("doc_id", F.explode(spans_col).alias("s")).select(
        "doc_id",
        F.col("s.offset").alias("offset"),
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    head = F.when(
        F.col("kind") == "headline",
        F.struct(F.col("offset").alias("o"), F.col("text").alias("t")),
    )
    return flat.withColumn("_h", F.last(head, ignorenulls=True).over(w)).select(
        "doc_id",
        "offset",
        "kind",
        "text",
        "media_ref",
        F.coalesce(F.col("_h.o"), F.lit(PREAMBLE_OFFSET)).alias("sec_offset"),
        F.coalesce(F.col("_h.t"), F.lit("")).alias("sec_title"),
    )


def section_stats(docs: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Per-section rollup of the interleaved stream: one row per
    ``(doc_id, sec_offset)`` with the section title and its span mix —
    ``n_spans`` (all spans incl. the headline itself), ``n_text``,
    ``n_images``, and ``n_chars`` (total text length over text spans).
    The span mix is what section-level quality filters key on (an
    image-only section is a gallery; a 1-token text section under a
    headline is chrome).
    """
    assigned = section_spans(docs, spans_col)
    return assigned.groupBy("doc_id", "sec_offset").agg(
        F.max("sec_title").alias("sec_title"),
        F.count(F.lit(1)).alias("n_spans"),
        F.sum((F.col("kind") == "text").cast("long")).alias("n_text"),
        F.sum((F.col("kind") == "image").cast("long")).alias("n_images"),
        F.sum(
            F.when(F.col("kind") == "text", F.length(F.coalesce("text", F.lit(""))))
            .otherwise(F.lit(0))
            .cast("long")
        ).alias("n_chars"),
    )


def filter_sections(
    docs: DataFrame,
    min_text_spans: int = 1,
    min_chars: int = 1,
    spans_col: str = "spans",
) -> DataFrame:
    """Section-level corpus filtering: drop every section whose text
    mass is below the floor (``n_text < min_text_spans`` or text chars
    ``< min_chars`` — image-only galleries, bare chrome headlines) and
    reassemble the surviving document text. This is the consumer
    :func:`section_stats` exists for — page-level filters throw away
    whole documents over one boilerplate block; section filtering
    keeps the substance.

    Returns one row per input doc:
    ``(doc_id, n_sections_kept, n_sections_dropped, text_kept)`` with
    ``text_kept`` = the space-join of surviving text+headline span
    texts in offset order (empty string when everything dropped — the
    doc row never disappears).

    Scale shape: the section window (page-bounded partitions), two
    HashAggregates, and one semi-join of spans against the surviving
    (doc, section) keys; reassembly sorts the per-doc bounded span
    array, never a corpus-level sort."""
    assigned = section_spans(docs, spans_col)
    stats = assigned.groupBy("doc_id", "sec_offset").agg(
        F.sum((F.col("kind") == "text").cast("long")).alias("n_text"),
        F.sum(
            F.when(F.col("kind") == "text", F.length(F.coalesce("text", F.lit(""))))
            .otherwise(F.lit(0))
            .cast("long")
        ).alias("n_chars"),
    )
    verdicts = stats.select(
        "doc_id",
        "sec_offset",
        (
            (F.col("n_text") >= min_text_spans)
            & (F.col("n_chars") >= min_chars)
        ).alias("_keep"),
    )
    totals = verdicts.groupBy("doc_id").agg(
        F.sum(F.col("_keep").cast("long")).alias("n_sections_kept"),
        F.sum((~F.col("_keep")).cast("long")).alias("n_sections_dropped"),
    )
    kept_spans = assigned.join(
        verdicts.where("_keep").select("doc_id", "sec_offset"),
        ["doc_id", "sec_offset"],
        "left_semi",
    )
    texts = (
        kept_spans.where(
            (F.col("kind") != "image") & F.col("text").isNotNull()
        )
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("offset", "text"))
                    ),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("text_kept")
        )
    )
    return (
        docs.select("doc_id")
        .join(totals, "doc_id", "left")
        .join(texts, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_sections_kept", F.lit(0)).cast("long").alias(
                "n_sections_kept"
            ),
            F.coalesce("n_sections_dropped", F.lit(0)).cast("long").alias(
                "n_sections_dropped"
            ),
            F.coalesce("text_kept", F.lit("")).alias("text_kept"),
        )
    )
