"""Extraction-kernel cleaning over span documents — reference
``_scan_web_page``'s skip/dedup rules (SURVEY.md §2.2) as SHUFFLE-FREE
per-row array transforms.

Design note (scale): the reference cleans one page at a time; here a
document's spans are one array cell, so the whole kernel is
``F.filter``/``F.transform`` lambdas — embarrassingly parallel,
whole-stage-codegen'd, zero shuffle at any data size. The in-array
dedup is O(n²) per document, which is the right trade: n is page-sized
(tens of spans) while documents are billions.

Rules (must stay in lockstep with plans/simulator.clean_spans):
1. drop kind∈(text,headline) spans with trim(text)=''
   (docrawl_core.py:631-639);
1b. drop kind='table' spans with fewer than 2 <tr> rows — the
   reference's scan-time table guard (docrawl_core.py:604-605). In the
   span encoding a <th> row counts as one <tr> and each entry of
   ``rows`` is one <tr>, so n_tr = (th non-empty ? 1 : 0) + len(rows);
   unparseable payloads are KEPT (the guard only fires on a counted
   deficit, never on parse failure);
2. drop duplicate (kind,text,media_ref) spans keeping the FIRST by
   offset (XPath dedup, docrawl_core.py:597-618);
3. reassign offsets 0..n-1 preserving order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EMPTYABLE_KINDS = ("text", "headline")

# minimal view of the table payload: row COUNTS only (the full cell
# schema lives in operators/extract.py; the guard needs sizes, and
# from_json tolerates the narrower schema)
_TABLE_COUNT_SCHEMA = T.StructType(
    [
        T.StructField("th", T.ArrayType(T.ArrayType(T.StringType()))),
        T.StructField("rows", T.ArrayType(T.ArrayType(T.ArrayType(T.StringType())))),
    ]
)


def _not_empty(s: Column) -> Column:
    return ~(
        s["kind"].isin(*EMPTYABLE_KINDS)
        & (F.trim(F.coalesce(s["text"], F.lit(""))) == "")
    )


def _table_has_two_tr(s: Column) -> Column:
    """Rule 1b — True for every non-table span; for tables, True iff
    the parsed payload counts ≥2 <tr> (or doesn't parse). from_json in
    PERMISSIVE mode yields an all-null struct for malformed input, so
    "unparseable" = both fields null (a counted payload always carries
    at least one of th/rows)."""
    parsed = F.from_json(s["text"], _TABLE_COUNT_SCHEMA)
    unparseable = parsed["th"].isNull() & parsed["rows"].isNull()
    th_tr = F.when(F.coalesce(F.size(parsed["th"]), F.lit(0)) > 0, F.lit(1)).otherwise(
        F.lit(0)
    )
    n_tr = th_tr + F.coalesce(F.size(parsed["rows"]), F.lit(0))
    return F.coalesce(
        (s["kind"] != "table") | unparseable | (n_tr >= 2), F.lit(True)
    )


def clean_spans_col(spans: Column) -> Column:
    """spans array → cleaned spans array (rules 1-3)."""
    # rules 1 + 1b — skip filters first (a skipped span must not consume
    # a dedup key, mirroring the simulator's rule order)
    kept = F.filter(spans, lambda s: _not_empty(s) & _table_has_two_tr(s))
    # stable order by original offset (arrays normally arrive ordered;
    # sorting makes the operator total regardless of upstream)
    ordered = F.array_sort(
        F.transform(
            kept,
            lambda s: F.struct(
                s["offset"].alias("offset"),
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
            ),
        )
    )
    # rule 2 — keep-first dedup: a span survives iff no earlier span has
    # the same (kind, text, media_ref). slice(arr, 1, i) = strictly-
    # earlier prefix (lambda index i is 0-based).
    deduped = F.filter(
        ordered,
        lambda s, i: ~F.exists(
            F.slice(ordered, 1, i),
            lambda p: (p["kind"] == s["kind"])
            & p["text"].eqNullSafe(s["text"])
            & p["media_ref"].eqNullSafe(s["media_ref"]),
        ),
    )
    # rule 3 — re-rank offsets to 0..n-1
    return F.transform(
        deduped,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )


def scan_documents(docs: DataFrame, spans_col: str = "spans") -> DataFrame:
    """documents(doc_id, spans_raw) → documents(doc_id, spans_clean)."""
    return docs.withColumn(spans_col, clean_spans_col(F.col(spans_col)))


def spans_of_kind(docs: DataFrame, kind: str) -> DataFrame:
    """Explode one span kind into rows: (doc_id, offset, text, media_ref).

    The kind filter runs INSIDE the array before the explode so the
    generator emits only matching spans (no post-explode filter over
    billions of non-matching rows)."""
    matching = F.filter(F.col("spans"), lambda s: s["kind"] == kind)
    return docs.select(
        "doc_id", F.explode(matching).alias("span")
    ).select(
        "doc_id",
        F.col("span.offset").alias("offset"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
    )
