"""File-artifact sinks for the extraction commands — the reference's
.txt / .xlsx outputs.

The reference writes one file per page per command:

- O4 ``_extract_xpath`` (docrawl_core.py:905-918): each stripped
  non-empty line + a newline into ``filename`` (default mode ``w+``;
  empty extraction writes the literal ``None`` line).
- O5 ``_extract_multiple_xpaths`` (docrawl_core.py:920-947): txt =
  per-xpath blocks (lines newline-joined) joined with newlines, NO
  trailing newline; plus ``pd.DataFrame(result).to_excel`` — one ROW
  per xpath, positional columns (:942).
- O6 ``_extract_table_xpath`` (docrawl_core.py:949-1009): the
  header-ruled, ``dropna(how='all')``-ed pandas frame ``.to_excel``
  (:1007).

Batch layout: ``<out_dir>/<safe(doc_id)>/extracted_data.txt`` (+
``.xlsx``) — one directory per document, file names matching the
reference's defaults, so a per-page docrawl script's filesystem
contract maps 1:1 onto the batch run.

Scale shape: RENDERING is distributed (sort_array/collect_list
HashAggregate over the long-form extraction tables — one shuffle on
doc_id, bounded by a doc's own line count); only the terminal per-file
emit iterates driver-side (``toLocalIterator``, one partition in
memory at a time), exactly like any edge sink. A cluster-scale export
of the same rendered frames goes through ``df.write`` instead — the
per-file layout here exists for reference script parity, not bulk IO.
"""

from __future__ import annotations

import hashlib
import os
import re
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "render_kind_txt",
    "render_multi_txt",
    "table_frames",
    "write_artifacts",
]


def render_kind_txt(lines: DataFrame) -> DataFrame:
    """O4 file content per doc: ``extract_kind`` output (doc_id,
    line_no, line) → (doc_id, txt) where txt is each line + a newline
    in line_no order — byte-identical to the reference's write loop
    (docrawl_core.py:910-918; empties were already dropped and the
    ``'None'`` marker added upstream, mirroring :907-908)."""
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("line_no"), F.col("line")))
    )
    body = F.array_join(
        F.transform(ordered, lambda e: F.concat(e["line"], F.lit("\n"))), ""
    )
    return lines.groupBy("doc_id").agg(body.alias("txt"))


def render_multi_txt(long: DataFrame) -> DataFrame:
    """O5 file content per doc: ``extract_multiple_kinds`` output
    (doc_id, kind_idx, kind, line_no, line) → (doc_id, txt) where each
    kind's lines newline-join and the per-kind blocks newline-join in
    kind_idx order, no trailing newline — the reference's nested join
    (docrawl_core.py:944-947)."""
    block = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("line_no"), F.col("line")))),
            lambda e: e["line"],
        ),
        "\n",
    )
    blocks = long.groupBy("doc_id", "kind_idx").agg(block.alias("block"))
    doc = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("kind_idx"), F.col("block")))),
            lambda e: e["block"],
        ),
        "\n",
    )
    return blocks.groupBy("doc_id").agg(doc.alias("txt"))


def table_frames(extracted: DataFrame) -> Iterator[tuple]:
    """O6: long-form ``extract_tables`` cells → one pandas frame per
    (doc_id, table_id), header-named columns when titles survived the
    width rule, positional otherwise; rows in row_id order (the
    ``dropna(how='all')`` already ran upstream). Yields
    (doc_id, table_id, pd.DataFrame) driver-side — the ``.to_excel``
    edge emit (docrawl_core.py:1002-1007)."""
    import pandas as pd

    packed = (
        extracted.groupBy("doc_id", "table_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("row_id"), F.col("col_id"), F.col("title"), F.col("cell")
                    )
                )
            ).alias("cells")
        )
        .orderBy("doc_id", "table_id")
    )
    for row in packed.toLocalIterator():
        by_row: dict[int, dict[int, str]] = {}
        titles: dict[int, str] = {}
        for c in row["cells"]:
            by_row.setdefault(c["row_id"], {})[c["col_id"]] = c["cell"]
            if c["title"] is not None:
                titles[c["col_id"]] = c["title"]
        n_cols = 1 + max((cid for r in by_row.values() for cid in r), default=-1)
        cols = list(range(n_cols))
        data = [[by_row[rid].get(cid) for cid in cols] for rid in sorted(by_row)]
        df = pd.DataFrame(data, index=sorted(by_row))
        if titles:
            df.columns = [titles.get(cid, cid) for cid in cols]
        yield row["doc_id"], row["table_id"], df


def safe_doc_dir(doc_id: str) -> str:
    """Deterministic filesystem-safe directory name for a doc_id (a
    URL): sanitized prefix + md5-8 suffix (collision-proofing — two
    URLs differing only in stripped chars must not share a dir)."""
    stem = re.sub(r"[^A-Za-z0-9._-]+", "_", doc_id)[:120]
    return f"{stem}-{hashlib.md5(doc_id.encode('utf-8')).hexdigest()[:8]}"


def _write_txt(path: str, txt: str, mode: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, mode, encoding="utf-8") as f:
        f.write(txt)


def write_artifacts(
    out_dir: str,
    kind_lines: DataFrame | None = None,
    multi_long: DataFrame | None = None,
    tables: DataFrame | None = None,
    filename: str = "extracted_data.txt",
    write_in_file_mode: str = "w",
) -> dict[str, int]:
    """Emit the reference's file artifacts from batch extraction output.

    - ``kind_lines``: ``extract_kind`` output → O4 txt per doc.
    - ``multi_long``: ``extract_multiple_kinds`` output → O5 txt per
      doc, plus ``<short>.xlsx`` (row per kind, positional line
      columns — the reference's ``pd.DataFrame(result).to_excel``
      shape, docrawl_core.py:941-942).
    - ``tables``: ``extract_tables`` long cells → O6
      ``extracted_table_<id>.xlsx`` per table (docrawl_core.py:1007).

    The .xlsx legs use the stdlib writer (``sources/xlsx.py`` —
    deterministic bytes, no openpyxl dependency), laying cells out
    exactly as ``DataFrame.to_excel`` defaults do (header row +
    index column).

    ``write_in_file_mode`` mirrors the reference's O4 ``w+``/``a+``
    knob (docrawl_core.py:903-905). Returns counts per artifact type.
    """
    from docrawl_spark.sources.xlsx import write_xlsx

    counts = {"o4_txt": 0, "o5_txt": 0, "o5_xlsx": 0, "o6_xlsx": 0}
    short = filename.split(".txt")[0]

    if kind_lines is not None:
        for r in render_kind_txt(kind_lines).toLocalIterator():
            _write_txt(
                os.path.join(out_dir, safe_doc_dir(r["doc_id"]), filename),
                r["txt"],
                write_in_file_mode,
            )
            counts["o4_txt"] += 1

    if multi_long is not None:
        for r in render_multi_txt(multi_long).toLocalIterator():
            _write_txt(
                os.path.join(out_dir, safe_doc_dir(r["doc_id"]), filename),
                r["txt"],
                "w",
            )
            counts["o5_txt"] += 1
        rows_pk = (
            multi_long.groupBy("doc_id", "kind_idx")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("line_no"), F.col("line")))
                    ),
                    lambda e: e["line"],
                ).alias("lines")
            )
            .groupBy("doc_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("kind_idx"), F.col("lines")))
                ).alias("kinds")
            )
        )
        for r in rows_pk.toLocalIterator():
            result = [list(e["lines"]) for e in r["kinds"]]
            d = os.path.join(out_dir, safe_doc_dir(r["doc_id"]))
            os.makedirs(d, exist_ok=True)
            write_xlsx(os.path.join(d, short + ".xlsx"), result)
            counts["o5_xlsx"] += 1

    if tables is not None:
        for doc_id, table_id, df in table_frames(tables):
            d = os.path.join(out_dir, safe_doc_dir(doc_id))
            os.makedirs(d, exist_ok=True)
            write_xlsx(
                os.path.join(d, f"extracted_table_{table_id}.xlsx"),
                df.values.tolist(),
                index=list(df.index),
                columns=list(df.columns),
            )
            counts["o6_xlsx"] += 1

    return counts
