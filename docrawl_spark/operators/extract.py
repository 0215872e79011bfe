"""Extraction kernel: the reference's per-type element→data semantics
(SURVEY.md §2.2, O4-O6) as declarative span transforms.

Span payload encodings (fixtures pre-parse the DOM; see
sources/fixtures.py):

- kind='table' text = JSON ``{"th": [[frag,..],..] | null,
  "rows": [[[frag,..],..],..]}`` — th/cells as raw text-fragment lists,
  exactly what the reference reads via ``.//text()``
  (docrawl_core.py:479-541).
- kind='bullet' text = JSON ``[[frag,..],..]`` — one fragment list per
  ``<li>`` (docrawl_core.py:431-450).

Reference rules reproduced bit-for-bit:

- ``string_cleaner`` = python ``str.strip()`` (unicode whitespace!)
  then remove backslashes (docrawl_core.py:422-429);
- bullet item = ' '-join of cleaned non-empty fragments, NBSP→space,
  trailing '\\n' (docrawl_core.py:431-450);
- table titles from <th> = ''-join of fragments with '\\n'/'\\t'
  REMOVED (not stripped) (docrawl_core.py:487-488); no <th> → first
  row is titles (docrawl_core.py:528-529); titles applied only when
  every data row has exactly len(titles) cells, else positional
  columns (the pd.DataFrame try/except, docrawl_core.py:531-535);
  first row always dropped (``df.iloc[1:]``, docrawl_core.py:537);
  rows whose every cell is null dropped (``dropna(how='all')``,
  docrawl_core.py:539) — with ragged rows null-padded to the widest
  row, as the positional pd.DataFrame constructor does;
- cell = '\\n'-join of cleaned fragments, empties KEPT
  (filter commented out in the reference, docrawl_core.py:512-524);
- O4 ``extract_xpath``: strip lines, drop empties, literal ['None']
  when nothing matched (docrawl_core.py:907-918); links are
  absolutized against the current url (docrawl_core.py:898).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from docrawl_spark.functions.canon import with_abs_url

# ---------------------------------------------------------------------------
# string_cleaner — python str.strip() strips UNICODE whitespace (incl.
# NBSP), so the regex needs (?U); then backslashes are removed.
# ---------------------------------------------------------------------------


def string_cleaner_col(c: Column) -> Column:
    stripped = F.regexp_replace(c, r"(?U)^\s+|(?U)\s+$", "")
    return F.regexp_replace(stripped, r"\\", "")


# ---------------------------------------------------------------------------
# Bullets (O3 bullet section / process_bullet)
# ---------------------------------------------------------------------------

_BULLET_SCHEMA = T.ArrayType(T.ArrayType(T.StringType()))


def bullet_items_col(text: Column) -> Column:
    """JSON li-fragment payload → array of rendered li lines."""
    lis = F.from_json(text, _BULLET_SCHEMA)
    return F.transform(
        lis,
        lambda li: F.concat(
            F.regexp_replace(
                F.array_join(
                    F.filter(
                        F.transform(li, string_cleaner_col), lambda x: x != ""
                    ),
                    " ",
                ),
                "\u00a0",
                " ",
            ),
            F.lit("\n"),
        ),
    )


def extract_bullets(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, offset, items: array<string>) per bullet span."""
    bullets = F.filter(F.col("spans"), lambda s: s["kind"] == "bullet")
    return docs.select("doc_id", F.explode(bullets).alias("s")).select(
        "doc_id",
        F.col("s.offset").alias("offset"),
        bullet_items_col(F.col("s.text")).alias("items"),
    )


# ---------------------------------------------------------------------------
# Tables (O3 table section + O6 extract_table_xpath) → long form
# ---------------------------------------------------------------------------

_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("th", T.ArrayType(T.ArrayType(T.StringType()))),
        T.StructField("rows", T.ArrayType(T.ArrayType(T.ArrayType(T.StringType())))),
    ]
)


def _clean_cell(frags: Column, strip_cell: bool) -> Column:
    joined = F.array_join(F.transform(frags, string_cleaner_col), "\n")
    if strip_cell:
        joined = F.regexp_replace(joined, r"(?U)^\s+|(?U)\s+$", "")
    return joined


def extract_tables(
    docs: DataFrame,
    first_row_header: bool = True,
    drop_first_row: bool = True,
    strip_cells: bool = False,
) -> DataFrame:
    """documents → long-form cells (EXTRACTED_TABLES_SCHEMA).

    Defaults mirror the scan path (docrawl_core.py:479-541):
    first-row-as-header fallback ON, unconditional first-row drop ON,
    cell stripping OFF. The O6 ``extract_table_xpath`` path
    (docrawl_core.py:949-1009) is ``drop_first_row=False,
    strip_cells=True`` with ``first_row_header`` caller-chosen.
    """
    tables = F.filter(F.col("spans"), lambda s: s["kind"] == "table")
    t = docs.select(
        "doc_id", F.posexplode(tables).alias("table_id", "s")
    ).select(
        "doc_id",
        "table_id",
        F.from_json(F.col("s.text"), _TABLE_SCHEMA).alias("p"),
    )
    # titles from <th>: ''-join fragments, remove \n and \t
    th_titles = F.transform(
        F.col("p.th"),
        lambda frags: F.regexp_replace(F.array_join(frags, ""), "[\\n\\t]", ""),
    )
    cells = F.transform(
        F.col("p.rows"), lambda r: F.transform(r, lambda c: _clean_cell(c, strip_cells))
    )
    t = t.select("doc_id", "table_id", th_titles.alias("th_titles"), cells.alias("cells"))

    has_th = F.col("th_titles").isNotNull() & (F.size("th_titles") > 0)
    # scan path: `if not titles: titles = row` runs per row, so the
    # FIRST NON-EMPTY row becomes titles (docrawl_core.py:528-529)
    first_nonempty = F.try_element_at(
        F.filter(F.col("cells"), lambda r: F.size(r) > 0), F.lit(1)
    )
    if first_row_header:
        titles = F.when(has_th, F.col("th_titles")).otherwise(first_nonempty)
    else:
        titles = F.when(has_th, F.col("th_titles"))
    if drop_first_row:
        # scan path: the pd.DataFrame is built from ALL rows, then
        # iloc[1:] — so width/titles validation sees all rows
        frame_rows = F.col("cells")
        data = F.slice(
            F.col("cells"), 2, F.greatest(F.size("cells") - 1, F.lit(0))
        )
    else:
        # O6: the first row is consumed as header only when it WAS the
        # header; the frame is built from what remains
        data = F.when(
            ~has_th & F.lit(first_row_header),
            F.slice(F.col("cells"), 2, F.greatest(F.size("cells") - 1, F.lit(0))),
        ).otherwise(F.col("cells"))
        frame_rows = data
    t = t.select(
        "doc_id",
        "table_id",
        titles.alias("titles"),
        data.alias("data"),
        frame_rows.alias("frame_rows"),
    )

    # pd.DataFrame(result, columns=titles) succeeds iff result is empty
    # or max(len(row)) == len(titles) (shorter rows are NaN-padded);
    # otherwise the reference falls back to positional columns.
    max_row = F.coalesce(
        F.array_max(F.transform(F.col("frame_rows"), lambda r: F.size(r))), F.lit(0)
    )
    titles_ok = (
        F.col("titles").isNotNull()
        & (F.size("titles") > 0)
        & ((F.size("frame_rows") == 0) | (max_row == F.size("titles")))
    )
    # either way rows are padded with nulls to the table width
    width = F.when(titles_ok, F.size("titles")).otherwise(max_row)
    padded = F.transform(
        F.col("data"),
        lambda r: F.transform(
            F.sequence(F.lit(1), width),
            lambda i: F.when(i <= F.size(r), F.element_at(r, i)),
        ),
    )
    t = t.select(
        "doc_id",
        "table_id",
        F.when(titles_ok, F.col("titles")).alias("titles"),
        padded.alias("data"),
    )
    # dropna(how='all'): keep rows with at least one non-null cell;
    # row_id mirrors the pandas index after iloc[1:] (1-based positions)
    rows = t.select(
        "doc_id",
        "table_id",
        "titles",
        F.posexplode_outer("data").alias("row_pos", "row"),
    ).where(
        F.col("row").isNotNull() & F.exists(F.col("row"), lambda c: c.isNotNull())
    )
    out = rows.select(
        "doc_id",
        "table_id",
        (F.col("row_pos") + 1).alias("row_id"),
        "titles",
        F.posexplode("row").alias("col_id", "cell"),
    )
    # the long form carries only materialized cells — padding nulls
    # (pandas NaN artifacts) are structural, not data
    return out.select(
        "doc_id",
        "table_id",
        F.col("row_id").cast("int"),
        F.col("col_id").cast("int"),
        F.try_element_at(F.col("titles"), F.col("col_id") + 1).alias("title"),
        "cell",
    ).where(F.col("cell").isNotNull())


def tables_to_json(extracted: DataFrame) -> DataFrame:
    """Long-form cells → one reference-shaped ``df.to_json()`` string per
    (doc_id, table_id): ``{"col": {"row_id": cell, ...}, ...}`` with
    columns in positional order (pandas orient='columns')."""
    # rows sorted by NUMERIC row_id (pandas index order; string sort
    # would put "10" before "2")
    row_entries = F.transform(
        F.sort_array(F.collect_list(F.struct(F.col("row_id"), F.col("cell")))),
        lambda e: F.struct(
            e["row_id"].cast("string").alias("k"), e["cell"].alias("v")
        ),
    )
    col_maps = (
        extracted.groupBy("doc_id", "table_id", "col_id", "title")
        .agg(F.map_from_entries(row_entries).alias("col_map"))
    )
    # columns in positional order; structs holding maps can't feed
    # sort_array, so sort with a comparator on col_id alone
    ordered = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("col_id"),
                F.coalesce(F.col("title"), F.col("col_id").cast("string")).alias(
                    "name"
                ),
                F.col("col_map").alias("m"),
            )
        ),
        lambda a, b: F.when(a["col_id"] < b["col_id"], F.lit(-1))
        .when(a["col_id"] > b["col_id"], F.lit(1))
        .otherwise(F.lit(0)),
    )
    as_map = F.map_from_entries(
        F.transform(ordered, lambda e: F.struct(e["name"], e["m"]))
    )
    return (
        col_maps.groupBy("doc_id", "table_id")
        .agg(F.to_json(as_map).alias("table_json"))
        .select("doc_id", "table_id", "table_json")
    )


# ---------------------------------------------------------------------------
# O4/O5: extract by kind (the batch analogue of extract_xpath)
# ---------------------------------------------------------------------------


def extract_kind(docs: DataFrame, kind: str) -> DataFrame:
    """O4 semantics over spans: per doc, the matching spans' values in
    offset order — links yield their ABSOLUTIZED media_ref, other kinds
    their text (xpath-rewrite rule, docrawl_core.py:878-885); lines are
    stripped, empties dropped, and a doc with zero surviving lines
    yields the literal 'None' (docrawl_core.py:907-918).

    Output: (doc_id, line_no, line)."""
    matching = F.filter(F.col("spans"), lambda s: s["kind"] == kind)
    if kind == "link":
        exploded = docs.select(
            "doc_id", F.posexplode(matching).alias("pos", "s")
        ).select("doc_id", "pos", F.col("s.media_ref").alias("raw"))
        exploded = with_abs_url(exploded, "raw", "doc_id").where(
            F.col("canon_error").isNull()
        )
        values = exploded.select("doc_id", "pos", F.col("url").alias("value"))
    else:
        values = docs.select(
            "doc_id", F.posexplode(matching).alias("pos", "s")
        ).select("doc_id", "pos", F.col("s.text").alias("value"))
    lines = values.select(
        "doc_id",
        "pos",
        F.regexp_replace(F.coalesce("value", F.lit("")), r"(?U)^\s+|(?U)\s+$", "").alias(
            "line"
        ),
    ).where(F.col("line") != "")
    # docs with zero surviving lines → the literal 'None'
    all_docs = docs.select("doc_id").distinct()
    empty = all_docs.join(lines.select("doc_id").distinct(), "doc_id", "left_anti")
    none_rows = empty.select(
        "doc_id", F.lit(0).alias("pos"), F.lit("None").alias("line")
    )
    out = lines.unionByName(none_rows)
    return out.select("doc_id", F.col("pos").alias("line_no"), "line")
