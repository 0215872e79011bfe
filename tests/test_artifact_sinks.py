"""O4/O5/O6 file-artifact sinks (docrawl_core.py:910-918, 942, 1007):
byte-identical txt rendering vs a straight Python transliteration of
the reference's write loops, xlsx gated on openpyxl."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from docrawl_spark.operators.artifacts import (
    render_kind_txt,
    render_multi_txt,
    safe_doc_dir,
    table_frames,
    write_artifacts,
)
from docrawl_spark.operators.commands import extract_multiple_kinds
from docrawl_spark.operators.extract import extract_kind, extract_tables
from docrawl_spark.sources.schemas import DOCUMENTS_SCHEMA

DOC_A = "https://fixture.test/a"
DOC_B = "https://fixture.test/b?q=1"

SPANS = {
    # text lines with internal spaces, leading/trailing whitespace,
    # an empty span (dropped), plus links to absolutize
    DOC_A: [
        ("text", "  hello world  ", "", 0),
        ("text", "", "", 1),
        ("text", "two  spaced  words", "", 2),
        ("link", "", "/rel/path", 3),
        ("headline", "H1", "", 4),
    ],
    # doc whose text spans ALL strip to empty -> the 'None' marker
    DOC_B: [
        ("text", "   ", "", 0),
        ("link", "", "https://other.test/x", 1),
    ],
}


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(d, s) for d, s in SPANS.items()]
    return spark.createDataFrame(rows, DOCUMENTS_SCHEMA)


# -- reference mirrors (docrawl_core.py:905-947) ----------------------------


def ref_lines(vals: list[str]) -> list[str]:
    data = [v.strip() for v in vals]
    data = [v for v in data if v]
    return data or ["None"]


def ref_o4_txt(vals: list[str]) -> str:
    # :910-918 — each truthy stripped row + newline
    return "".join(line + "\n" for line in ref_lines(vals))


def ref_o5_txt(per_kind: list[list[str]]) -> str:
    # :944-947 — blocks newline-joined, no trailing newline
    return "\n".join("\n".join(ref_lines(v)) for v in per_kind)


def _text_vals(doc: str) -> list[str]:
    return [t for k, t, _, _ in SPANS[doc] if k == "text"]


def _headline_vals(doc: str) -> list[str]:
    return [t for k, t, _, _ in SPANS[doc] if k == "headline"]


# -- O4 ---------------------------------------------------------------------


def test_render_kind_txt_matches_reference(spark, docs):
    got = {
        r["doc_id"]: r["txt"]
        for r in render_kind_txt(extract_kind(docs, "text")).collect()
    }
    assert got == {
        DOC_A: ref_o4_txt(_text_vals(DOC_A)),
        DOC_B: ref_o4_txt(_text_vals(DOC_B)),  # "None\n"
    }
    assert got[DOC_B] == "None\n"


def test_o4_txt_files_byte_identical(spark, docs, tmp_path):
    out = str(tmp_path / "artifacts")
    counts = write_artifacts(out, kind_lines=extract_kind(docs, "text"))
    assert counts["o4_txt"] == 2
    for doc in (DOC_A, DOC_B):
        p = os.path.join(out, safe_doc_dir(doc), "extracted_data.txt")
        with open(p, "rb") as f:
            assert f.read() == ref_o4_txt(_text_vals(doc)).encode("utf-8")


def test_o4_append_mode(spark, docs, tmp_path):
    # the reference's write_in_file_mode knob (docrawl_core.py:903-905)
    out = str(tmp_path / "artifacts")
    lines = extract_kind(docs, "headline").where(F.col("doc_id") == DOC_A)
    write_artifacts(out, kind_lines=lines)
    write_artifacts(out, kind_lines=lines, write_in_file_mode="a")
    p = os.path.join(out, safe_doc_dir(DOC_A), "extracted_data.txt")
    with open(p) as f:
        assert f.read() == ref_o4_txt(_headline_vals(DOC_A)) * 2


# -- O5 ---------------------------------------------------------------------


def test_render_multi_txt_matches_reference(spark, docs):
    kinds = ["text", "link", "headline"]
    long = extract_multiple_kinds(docs, kinds)
    got = {r["doc_id"]: r["txt"] for r in render_multi_txt(long).collect()}
    # links absolutize against the doc url before rendering
    exp_a = ref_o5_txt(
        [
            _text_vals(DOC_A),
            ["https://fixture.test/rel/path"],
            _headline_vals(DOC_A),
        ]
    )
    exp_b = ref_o5_txt([[], ["https://other.test/x"], []])
    assert got == {DOC_A: exp_a, DOC_B: exp_b}
    assert not got[DOC_A].endswith("\n")  # :947 writes the bare join
    assert "None" in got[DOC_B]


def test_o5_txt_files_byte_identical(spark, docs, tmp_path):
    out = str(tmp_path / "artifacts")
    long = extract_multiple_kinds(docs, ["text", "headline"])
    counts = write_artifacts(out, multi_long=long)
    assert counts["o5_txt"] == 2
    p = os.path.join(out, safe_doc_dir(DOC_A), "extracted_data.txt")
    with open(p, "rb") as f:
        assert f.read() == ref_o5_txt(
            [_text_vals(DOC_A), _headline_vals(DOC_A)]
        ).encode("utf-8")


def test_o5_xlsx_row_per_kind(spark, docs, tmp_path):
    from docrawl_spark.sources.xlsx import read_xlsx

    out = str(tmp_path / "artifacts")
    long = extract_multiple_kinds(docs, ["text", "headline"])
    counts = write_artifacts(out, multi_long=long)
    assert counts["o5_xlsx"] == 2
    p = os.path.join(out, safe_doc_dir(DOC_A), "extracted_data.xlsx")
    grid = read_xlsx(p)
    # reference: pd.DataFrame(result) — row per xpath, positional cols;
    # grid row 0 = header (blank corner + 0..n-1), row 1 = first kind
    want = ref_lines(_text_vals(DOC_A))
    assert grid[1][0] == 0  # index label
    assert [v for v in grid[1][1:] if v is not None] == want
    # openpyxl cross-check where available (absent in this container)
    try:
        import pandas as pd

        df = pd.read_excel(p, index_col=0)
        assert list(df.iloc[0].dropna()) == want
    except ImportError:
        pass


# -- O6 ---------------------------------------------------------------------

TABLE_PAYLOAD = {
    "th": [["Name"], ["Qty"]],
    "rows": [[["alpha"], ["1"]], [["beta "], ["2"]], [[""], [""]]],
}


def test_table_frames_header_rule(spark):
    rows = [
        (DOC_A, [("table", json.dumps(TABLE_PAYLOAD), "", 0)]),
    ]
    docs = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    cells = extract_tables(docs, drop_first_row=False, strip_cells=True)
    frames = list(table_frames(cells))
    assert len(frames) == 1
    doc_id, table_id, df = frames[0]
    assert (doc_id, table_id) == (DOC_A, 0)
    assert list(df.columns) == ["Name", "Qty"]
    # the all-empty-strings row is NOT all-NaN, so dropna keeps it —
    # but extract_tables' long form drops null cells only; '' survives
    assert df["Name"].tolist()[:2] == ["alpha", "beta"]


def test_o6_xlsx_roundtrip(spark, tmp_path):
    from docrawl_spark.sources.xlsx import read_xlsx

    rows = [(DOC_A, [("table", json.dumps(TABLE_PAYLOAD), "", 0)])]
    docs = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    cells = extract_tables(docs, drop_first_row=False, strip_cells=True)
    out = str(tmp_path / "artifacts")
    counts = write_artifacts(out, tables=cells)
    assert counts["o6_xlsx"] == 1
    p = os.path.join(out, safe_doc_dir(DOC_A), "extracted_table_0.xlsx")
    grid = read_xlsx(p)
    assert grid[0][1:] == ["Name", "Qty"]       # header row
    assert grid[1][1:3] == ["alpha", "1"]       # first data row
    try:
        import pandas as pd

        df = pd.read_excel(p, index_col=0)
        assert list(df.columns) == ["Name", "Qty"]
    except ImportError:
        pass


def test_xlsx_writer_deterministic_and_typed(tmp_path):
    """Same grid → identical bytes (fixed zip metadata); values
    round-trip with types (str/int/float/bool/None); XML-hostile
    characters survive escaping."""
    from docrawl_spark.sources.xlsx import read_xlsx, sheet_rows, xlsx_bytes

    records = [
        ["a<b>&\"'", 3, 2.5, True],
        [None, -1, 0.0, False],
        ["  spaced  ", None, None, None],
    ]
    grid = sheet_rows(records, index=["r1", "r2", "r3"], columns=list("wxyz"))
    b1, b2 = xlsx_bytes(grid), xlsx_bytes(grid)
    assert b1 == b2
    back = read_xlsx(b1)
    assert back[0] == [None, "w", "x", "y", "z"]
    assert back[1] == ["r1", "a<b>&\"'", 3, 2.5, True]
    assert back[2] == ["r2", None, -1, 0.0, False]
    assert back[3] == ["r3", "  spaced  ", None, None, None]


# -- layout -----------------------------------------------------------------


def test_safe_doc_dir_deterministic_and_collision_free():
    a = safe_doc_dir("https://fixture.test/a")
    assert a == safe_doc_dir("https://fixture.test/a")
    # same sanitized stem, different URLs -> different dirs
    assert safe_doc_dir("https://fixture.test/a?x=1") != safe_doc_dir(
        "https://fixture.test/a#x=1"
    )
    assert "/" not in a and "?" not in a
