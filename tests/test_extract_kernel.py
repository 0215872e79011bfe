"""Extraction-kernel parity (SURVEY.md §5.2 item 4): each kernel rule
checked against a literal pandas mirror of the reference code
(docrawl_core.py:422-541, 878-918)."""

from __future__ import annotations

import json

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from docrawl_spark.functions.canon import build_abs_url
from docrawl_spark.operators.extract import (
    extract_bullets,
    extract_kind,
    extract_tables,
    string_cleaner_col,
    tables_to_json,
)
from docrawl_spark.sources.schemas import DOCUMENTS_SCHEMA

# ---------------------------------------------------------------------------
# Reference mirrors (straight transliterations, used only as oracles)
# ---------------------------------------------------------------------------


def ref_string_cleaner(s: str) -> str:
    return "".join(s.strip()).replace("\\", "")


def ref_process_bullet(lis: list[list[str]]) -> list[str]:
    result = []
    for li in lis:
        data = [ref_string_cleaner(x) for x in li]
        data = list(filter(None, data))
        result.append(" ".join(data).replace("\xa0", " ") + "\n")
    return result


def ref_table_df(payload: dict) -> pd.DataFrame:
    """The scan-path table extraction (docrawl_core.py:479-541)."""
    titles = []
    for th in payload["th"] or []:
        titles.append("".join(th).replace("\n", "").replace("\t", ""))
    result = []
    for tr in payload["rows"]:
        row = ["\n".join(ref_string_cleaner(x) for x in td) for td in tr]
        result.append(row)
        if not titles:
            titles = row
    try:
        df = pd.DataFrame(result, columns=titles)
    except Exception:
        df = pd.DataFrame(result)
    df = df.iloc[1:, :]
    df.dropna(axis=0, how="all", inplace=True)
    return df


def _docs(spark, spans_payloads: list[tuple[str, str]]):
    """[(kind, text)] → single-doc documents DataFrame."""
    rows = [
        (
            "https://fixture.test/p",
            [(k, t, "", i) for i, (k, t) in enumerate(spans_payloads)],
        )
    ]
    return spark.createDataFrame(rows, DOCUMENTS_SCHEMA)


# ---------------------------------------------------------------------------
# string_cleaner
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    s=st.text(
        alphabet=" \t\n\xa0\\abcXYZ0交9é.-", min_size=0, max_size=30
    )
)
def test_string_cleaner_matches_python(s, spark):
    got = (
        spark.createDataFrame([(s,)], "v string")
        .select(string_cleaner_col(F.col("v")).alias("c"))
        .first()["c"]
    )
    assert got == ref_string_cleaner(s), repr(s)


# ---------------------------------------------------------------------------
# bullets
# ---------------------------------------------------------------------------

BULLET_CASES = [
    [["item ", "one\xa0a"], ["", "  "], ["x\\y"]],
    [],
    [["\xa0"], ["a"]],
    [["  lead", "trail  ", "\\"]],
]


@pytest.mark.parametrize("lis", BULLET_CASES)
def test_bullets_match_reference(spark, lis):
    docs = _docs(spark, [("bullet", json.dumps(lis))])
    got = extract_bullets(docs).first()["items"]
    assert list(got) == ref_process_bullet(lis)


# ---------------------------------------------------------------------------
# tables
# ---------------------------------------------------------------------------

TABLE_CASES = [
    # th present
    {"th": [["col", "A\n"], ["\tcol", "B"]],
     "rows": [[["1 "], [" x\\q"]], [["2"], ["y", "z"]]]},
    # no th → first row promoted
    {"th": None, "rows": [[["hA"], ["hB"]], [["3"], ["z"]], [["4"], ["w"]]]},
    # ragged longer than titles → positional fallback + NaN padding
    {"th": [["only1"]], "rows": [[["a"], ["b"], ["c"]], [["d"], ["e"]]]},
    # empty row in the middle → all-NaN → dropna
    {"th": [["cA"], ["cB"]], "rows": [[["h1"], ["h2"]], [], [["5"], ["v"]]]},
    # shorter rows than titles → NaN-padded, titles kept
    {"th": [["a"], ["b"], ["c"]], "rows": [[["x"], ["y"], ["z"]], [["1"]]]},
    # no th, first row empty → SECOND row becomes titles
    {"th": None, "rows": [[], [["t1"], ["t2"]], [["9"], ["8"]]]},
    # empty table
    {"th": None, "rows": []},
]


@pytest.mark.parametrize("payload", TABLE_CASES)
def test_tables_match_reference(spark, payload):
    docs = _docs(spark, [("table", json.dumps(payload))])
    long_rows = extract_tables(docs).collect()
    ref = ref_table_df(payload)
    # rebuild a {col_pos: {row_id: cell}} view from both sides
    got: dict[int, dict[int, object]] = {}
    titles_got: dict[int, object] = {}
    for r in long_rows:
        got.setdefault(r["col_id"], {})[r["row_id"]] = r["cell"]
        titles_got[r["col_id"]] = r["title"]
    exp: dict[int, dict[int, object]] = {}
    titles_exp: dict[int, object] = {}
    for pos, col in enumerate(ref.columns):
        titles_exp[pos] = col if isinstance(col, str) else None
        for idx, v in ref[col].items():
            if pd.isna(v):
                continue
            exp.setdefault(pos, {})[int(idx)] = v
    # pandas keeps all-NaN COLUMNS; the long form only emits non-null
    # cells, so compare non-null cell maps + titles for emitted cols
    exp = {k: v for k, v in exp.items() if v}
    assert got == exp, (got, exp)
    for pos in got:
        assert titles_got[pos] == titles_exp[pos], (pos, titles_got, titles_exp)


def ref_table_df_o6(payload: dict, first_row_header: bool) -> pd.DataFrame:
    """The O6 extract_table_xpath path (docrawl_core.py:949-1009):
    header row is CONSUMED (not in result), cells stripped, no iloc."""
    headers = []
    for th in payload["th"] or []:
        headers.append("".join(th).replace("\n", "").replace("\t", ""))
    result = []
    for tr in payload["rows"]:
        row = ["\n".join(ref_string_cleaner(x) for x in td).strip() for td in tr]
        if first_row_header and not headers:
            headers = row
        else:
            result.append(row)
    if headers:
        try:
            df = pd.DataFrame(result, columns=headers)
        except Exception:
            df = pd.DataFrame(result)
    else:
        df = pd.DataFrame(result)
    df.dropna(axis=0, how="all", inplace=True)
    return df


@pytest.mark.parametrize("first_row_header", [True, False])
@pytest.mark.parametrize("payload", [TABLE_CASES[0], TABLE_CASES[1], TABLE_CASES[4]])
def test_tables_o6_path(spark, payload, first_row_header):
    from docrawl_spark.operators.extract import extract_tables as et

    docs = _docs(spark, [("table", json.dumps(payload))])
    long_rows = et(
        docs, first_row_header=first_row_header,
        drop_first_row=False, strip_cells=True,
    ).collect()
    ref = ref_table_df_o6(payload, first_row_header)
    got: dict[tuple, object] = {}
    for r in long_rows:
        got[(r["col_id"], r["row_id"])] = r["cell"]
    exp: dict[tuple, object] = {}
    for pos, col in enumerate(ref.columns):
        for row_pos, v in enumerate(ref[col]):
            if pd.isna(v):
                continue
            exp[(pos, row_pos + 1)] = v  # O6 row_id = 1-based position
    assert got == exp, (got, exp)


def test_tables_to_json_matches_reference(spark):
    payload = TABLE_CASES[1]  # promote-first-row case, clean shape
    docs = _docs(spark, [("table", json.dumps(payload))])
    got = tables_to_json(extract_tables(docs)).first()["table_json"]
    exp = ref_table_df(payload).to_json()
    assert json.loads(got) == json.loads(exp)


# ---------------------------------------------------------------------------
# extract_kind (O4)
# ---------------------------------------------------------------------------


def test_extract_kind_text_and_none(spark):
    docs = _docs(
        spark,
        [("text", "  hello  "), ("text", "   "), ("headline", "H"), ("text", "world")],
    )
    got = [
        (r["line_no"], r["line"])
        for r in extract_kind(docs, "text").orderBy("line_no").collect()
    ]
    assert got == [(0, "hello"), (2, "world")]
    # a doc with no bullet spans yields the literal 'None'
    got_none = extract_kind(docs, "bullet").collect()
    assert [(r["line_no"], r["line"]) for r in got_none] == [(0, "None")]


def test_extract_kind_links_absolutized(spark):
    docs = _docs(spark, [("link", ""), ("text", "x")])
    # patch media_ref by rebuilding rows directly
    rows = [("https://e.com/a/b", [("link", "t", "../z", 0), ("link", "t2", "/q", 1)])]
    df = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    got = [r["line"] for r in extract_kind(df, "link").orderBy("line_no").collect()]
    assert got == [
        build_abs_url("../z", "https://e.com/a/b"),
        build_abs_url("/q", "https://e.com/a/b"),
    ]


def test_table_scan_guard_drops_sub_two_tr(spark):
    """Reference scan-time guard (docrawl_core.py:604-605): tables with
    fewer than 2 <tr> never become spans — a <th> row counts as one
    <tr>, each rows entry is one <tr>; unparseable payloads are kept;
    surviving spans re-rank offsets with no gap."""
    import json

    from docrawl_spark.operators.scan import scan_documents
    from docrawl_spark.plans.simulator import clean_spans
    from docrawl_spark.sources.schemas import DOCUMENTS_SCHEMA

    spans = [
        ("table", json.dumps({"th": None, "rows": [[["only"]]]}), "", 0),       # 1 tr -> drop
        ("table", json.dumps({"th": [["h"]], "rows": []}), "", 1),              # 1 tr -> drop
        ("table", json.dumps({"th": [["h"]], "rows": [[["a"]]]}), "", 2),       # 2 tr -> keep
        ("table", json.dumps({"th": None, "rows": [[["a"]], [["b"]]]}), "", 3), # 2 tr -> keep
        ("table", json.dumps({"th": [["h"]], "rows": None}), "", 4),            # 1 tr -> drop
        ("table", "not json", "", 5),                                           # unparseable -> keep
        ("text", "body", "", 6),                                                # non-table untouched
    ]
    docs = spark.createDataFrame([("https://t.test/p", spans)], DOCUMENTS_SCHEMA)
    got = scan_documents(docs).collect()[0]["spans"]
    got_tuples = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in got]
    sim = clean_spans(
        [dict(kind=k, text=t, media_ref=m, offset=o) for k, t, m, o in spans]
    )
    sim_tuples = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in sim]
    assert got_tuples == sim_tuples
    kept_texts = [t[1] for t in got_tuples if t[0] == "table"]
    assert kept_texts == [spans[2][1], spans[3][1], "not json"]
    assert [t[3] for t in got_tuples] == list(range(len(got_tuples)))


def test_og_properties_and_jsonld_blocks(spark):
    """Structured data: quoting/attr-order variants, repeated og:image
    preserved in tag order, charset/robots metas and plain scripts
    ignored, typeless JSON-LD -> NULL type, script_order counts ALL
    scripts."""
    from docrawl_spark.operators.meta_directives import (
        jsonld_blocks,
        og_properties,
    )

    html = (
        '<head><meta charset="utf-8">'
        "<meta content='First' property='og:title'>"
        '<meta property="og:image" content="https://h/a.png">'
        '<meta property="og:image" content="https://h/b.png">'
        '<meta name="robots" content="noindex">'
        '<meta property="og:empty" content="">'
        '<script src="/app.js"></script>'
        '<script type="application/ld+json">'
        '{"@context":"x","@type":"Article"}</script>'
        "<script type='application/ld+json'>{\"name\":\"untyped\"}</script>"
        "<script>var x = 1;</script></head>"
    )
    df = spark.createDataFrame([(1, html), (2, None)], "doc_id long, html string")

    og = [
        (r["og_order"], r["property"], r["content"])
        for r in og_properties(df).orderBy("doc_id", "og_order").collect()
    ]
    assert og == [
        (1, "og:title", "First"),
        (2, "og:image", "https://h/a.png"),
        (3, "og:image", "https://h/b.png"),
    ]

    ld = [
        (r["script_order"], r["jsonld_type"], r["body_chars"])
        for r in jsonld_blocks(df).orderBy("doc_id", "script_order").collect()
    ]
    assert ld == [
        (1, "Article", len('{"@context":"x","@type":"Article"}')),
        (2, None, len('{"name":"untyped"}')),
    ]
