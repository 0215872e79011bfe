"""Unit tests for document-structure operators (datapipe.structure)."""

from __future__ import annotations


def _doc(spark, spans):
    return spark.createDataFrame(
        [("d1", spans)],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )


def test_section_spans_assignment_and_preamble(spark):
    """Spans before the first headline form the preamble (-1, '');
    a headline heads its own section; assignment switches at each
    subsequent headline."""
    from docrawl_spark.datapipe.structure import section_spans

    docs = _doc(
        spark,
        [
            ("text", "intro", None, 0),
            ("image", None, "img://a.jpg", 1),
            ("headline", "One", None, 2),
            ("text", "alpha", None, 3),
            ("headline", "Two", None, 5),
            ("text", "beta", None, 7),
        ],
    )
    got = {
        r["offset"]: (r["sec_offset"], r["sec_title"])
        for r in section_spans(docs).collect()
    }
    assert got == {
        0: (-1, ""),
        1: (-1, ""),
        2: (2, "One"),
        3: (2, "One"),
        5: (5, "Two"),
        7: (5, "Two"),
    }


def test_section_stats_span_mix(spark):
    from docrawl_spark.datapipe.structure import section_stats

    docs = _doc(
        spark,
        [
            ("text", "ab", None, 0),
            ("headline", "H", None, 1),
            ("text", "cde", None, 2),
            ("image", None, "img://x.jpg", 3),
            ("text", None, None, 4),  # null text counts 0 chars
        ],
    )
    got = {
        r["sec_offset"]: (
            r["sec_title"],
            r["n_spans"],
            r["n_text"],
            r["n_images"],
            r["n_chars"],
        )
        for r in section_stats(docs).collect()
    }
    assert got == {
        -1: ("", 1, 1, 0, 2),
        1: ("H", 4, 2, 1, 3),
    }


def test_section_stats_headline_free_doc_is_all_preamble(spark):
    from docrawl_spark.datapipe.structure import section_stats

    docs = _doc(spark, [("text", "xy", None, 0), ("text", "z", None, 1)])
    rows = section_stats(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["sec_offset"], r["n_spans"], r["n_chars"]) == (-1, 2, 3)
