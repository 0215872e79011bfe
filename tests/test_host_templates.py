"""Host-scoped template mining/stripping (datapipe.dedup
.host_template_lines / strip_host_templates): per-site chrome removal,
the within-host complement of the corpus-wide line dedup."""

from pyspark.sql import functions as F

from docrawl_spark.datapipe.dedup import host_template_lines, strip_host_templates


def _fixture(spark):
    # host a.test: 5 docs, all share "FOOTER A"; 3 of 5 share "NAV A"
    # (600000 ppm); each doc has a unique content line.
    # host b.test: 2 docs (< min_docs) sharing "FOOTER B" — never mined.
    rows = []
    for i in range(5):
        rows.append(
            (f"a{i}", "a.test", f"content a {i}\n" + ("NAV A\n" if i < 3 else "") + "FOOTER A")
        )
    for i in range(2):
        rows.append((f"b{i}", "b.test", f"content b {i}\nFOOTER B"))
    return spark.createDataFrame(rows, "doc_id string, host string, text string")


def test_template_mining_thresholds(spark):
    df = _fixture(spark)
    got = {
        (r.host, r.line): (r.docs_with_line, r.host_docs, r.share_ppm)
        for r in host_template_lines(df, min_docs=5, min_share_ppm=500_000).collect()
    }
    # FOOTER A: 5/5 docs = 1_000_000 ppm; NAV A: 3/5 = 600_000 ppm.
    assert got == {
        ("a.test", "FOOTER A"): (5, 5, 1_000_000),
        ("a.test", "NAV A"): (3, 5, 600_000),
    }
    # Raising the share floor above 600000 drops NAV A.
    lines = host_template_lines(df, min_docs=5, min_share_ppm=700_000)
    assert [r.line for r in lines.collect()] == ["FOOTER A"]


def test_small_hosts_and_content_survive(spark):
    df = _fixture(spark)
    out = {
        r.doc_id: r
        for r in strip_host_templates(df, min_docs=5, min_share_ppm=500_000).collect()
    }
    # a0 had 3 lines (content, NAV A, FOOTER A) -> both templates dropped.
    assert out["a0"].text_clean == "content a 0"
    assert out["a0"].n_lines == 3 and out["a0"].n_dropped == 2
    # a4 had no NAV line: only the footer goes.
    assert out["a4"].text_clean == "content a 4"
    assert out["a4"].n_dropped == 1
    # b.test is below min_docs: its footer is NOT a template.
    assert out["b0"].text_clean == "content b 0\nFOOTER B"
    assert out["b0"].n_dropped == 0


def test_empty_lines_never_templates(spark):
    # Blank lines appear in every doc of the host but must survive the
    # strip (they're structure, not chrome) and never be mined.
    rows = [(f"c{i}", "c.test", f"x {i}\n\nFOOT") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id string, host string, text string")
    mined = host_template_lines(df, min_docs=5, min_share_ppm=500_000)
    assert [r.line for r in mined.collect()] == ["FOOT"]
    out = {r.doc_id: r for r in strip_host_templates(df, min_docs=5).collect()}
    assert out["c0"].text_clean == "x 0\n"
    assert out["c0"].n_lines == 3 and out["c0"].n_dropped == 1


def test_whitespace_trim_collapses_variants(spark):
    # "FOOT", "  FOOT", "FOOT  " are one template after trim.
    rows = [
        ("d0", "d.test", "u 0\nFOOT"),
        ("d1", "d.test", "u 1\n  FOOT"),
        ("d2", "d.test", "u 2\nFOOT  "),
        ("d3", "d.test", "u 3\nFOOT"),
        ("d4", "d.test", "u 4\nFOOT"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, host string, text string")
    mined = host_template_lines(df, min_docs=5, min_share_ppm=900_000).collect()
    assert [(r.line, r.docs_with_line) for r in mined] == [("FOOT", 5)]
