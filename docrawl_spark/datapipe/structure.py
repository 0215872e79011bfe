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
