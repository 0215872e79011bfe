"""Canonicalization parity with the reference.

Every assertion of docrawl/tests/test_utils.py:6-29 runs through all
three layers: the exact scalar, the vectorized batch, and the Spark
pandas UDF. Errors map to null url + error string in the vector paths
(vector UDFs can't raise per-row).
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from docrawl_spark.functions.canon import (
    build_abs_url,
    canonicalize_batch,
    host_of_col,
    normalize_seed_url_col,
    path_of_col,
    with_abs_url,
)

# (scraped, base, expected) — verbatim from the reference test file.
REFERENCE_CASES = [
    ("/test", "https://example.com", "https://example.com/test"),
    ("/aaa/bbb/ccc/ddd", "https://example.com", "https://example.com/aaa/bbb/ccc/ddd"),
    ("/ddd/www", "https://example.com/aaa/bbb/ccc", "https://example.com/ddd/www"),
    ("/www/ddd", "https://example.com/aaa/", "https://example.com/www/ddd"),
    ("https://aaaa.com/test", "https://bbb.com", "https://aaaa.com/test"),
    ("test", "https://example.com", "https://example.com/test"),
    ("https://example.com/test", None, "https://example.com/test"),
    ("aaa/../bbb/ccc/./ddd", "https://example.com", "https://example.com/bbb/ccc/ddd"),
    # Non-RFC deviation: base's last segment treated as a directory.
    ("../ddd/www", "https://example.com/aaa/bbb/ccc", "https://example.com/aaa/bbb/ddd/www"),
    ("../www/../ddd", "https://example.com/aaa/bbb/ccc", "https://example.com/aaa/bbb/ddd"),
    ("https://example.com/test", "https://whatever.org", "https://example.com/test"),
    ("https://example.com/aaa/bbb/ccc/ddd", None, "https://example.com/aaa/bbb/ccc/ddd"),
]

ERROR_CASES = [
    ("/test/api/d1", None),
    ("test/qwaf/werq", None),
    ("../../..", "https://example.com/aaa/bbb"),
]


def test_scalar_reference_cases():
    for scraped, base, expected in REFERENCE_CASES:
        assert build_abs_url(scraped, base) == expected, (scraped, base)
    for scraped, base in ERROR_CASES:
        with pytest.raises(ValueError):
            build_abs_url(scraped, base)


def test_batch_reference_cases():
    scraped = pd.Series([c[0] for c in REFERENCE_CASES] + [c[0] for c in ERROR_CASES])
    base = pd.Series([c[1] for c in REFERENCE_CASES] + [c[1] for c in ERROR_CASES])
    out = canonicalize_batch(scraped, base)
    for i, (_, _, expected) in enumerate(REFERENCE_CASES):
        assert out["url"][i] == expected
        assert out["error"][i] is None
    for j in range(len(ERROR_CASES)):
        i = len(REFERENCE_CASES) + j
        assert out["url"][i] is None
        assert out["error"][i] is not None


def test_batch_edge_cases():
    # protocol-relative, query/fragment dropping, params, null input
    out = canonicalize_batch(
        pd.Series(["//h.com/p", "/a/b?q=1#f", "/a;p", None, ""]),
        pd.Series(["https://e.com/x", "https://e.com", "https://e.com", "https://e.com", "https://e.com/base"]),
    )
    assert out["url"][0] == build_abs_url("//h.com/p", "https://e.com/x")
    assert out["url"][1] == "https://e.com/a/b"  # query+fragment dropped
    assert out["url"][2] == build_abs_url("/a;p", "https://e.com")
    assert out["url"][3] is None and out["error"][3] == "null url"
    assert out["url"][4] == build_abs_url("", "https://e.com/base")


def test_batch_root_slash_base_cases():
    """Base path '/' vs '' — the reference's segment model gives them
    DIFFERENT results (path '/' has one empty segment: 'x' joins to
    '//x', and one '..' pop succeeds). Regression for two confirmed
    batch divergences found in review."""
    cases = [
        ("../about", "http://host.test/"),   # root '..': pops the empty seg
        ("x", "http://h/"),                  # root join → 'http://h//x'
        ("x", "http://h"),                   # no path → 'http://h/x'
        ("a/b", "https://e.com/"),
        ("../../x", "http://h/"),            # underflow (1 seg, 2 pops)
        ("../x/y", "http://h"),              # underflow (0 segs)
    ]
    out = canonicalize_batch(
        pd.Series([c[0] for c in cases]), pd.Series([c[1] for c in cases])
    )
    for i, (sc, ba) in enumerate(cases):
        try:
            exp_u, exp_err = build_abs_url(sc, ba), False
        except ValueError:
            exp_u, exp_err = None, True
        assert out["url"][i] == exp_u, (sc, ba, out["url"][i], exp_u)
        assert (out["error"][i] is not None) == exp_err, (sc, ba)


@settings(max_examples=300, deadline=None)
@given(
    scraped=st.one_of(
        st.sampled_from(
            ["/a/b", "a/b", "../x", "./y", "https://z.org/q?a=1", "//cdn.z.org/i.png",
             "", ".", "..", "a/../b", "/p?q#f", "x;y", "HTTPS://UP.com/A"]
        ),
        st.text(alphabet="abc/.?#:&=%", max_size=24),
    ),
    base=st.one_of(
        st.none(),
        st.sampled_from(
            ["https://example.com", "https://example.com/", "https://example.com/aaa/bbb",
             "http://h.io/p/", "ftp://f.net/d/e", "example.com/noscheme"]
        ),
    ),
)
def test_batch_matches_scalar(scraped, base):
    """Property: the vectorized batch == the exact scalar, always."""
    try:
        expected_url, expected_err = build_abs_url(scraped, base), None
    except ValueError:
        expected_url, expected_err = None, "err"
    except Exception:
        expected_url, expected_err = None, "err"
    out = canonicalize_batch(pd.Series([scraped]), pd.Series([base]))
    assert out["url"][0] == expected_url
    assert (out["error"][0] is None) == (expected_err is None)


@settings(max_examples=200, deadline=None)
@given(
    scraped=st.text(alphabet="abc/.?#:&=%-", max_size=24),
    base=st.sampled_from(
        ["https://example.com", "https://example.com/aaa/bbb", "http://h.io/p/"]
    ),
)
def test_canonicalization_idempotent(scraped, base):
    """Property (SURVEY.md §5.2): canon(canon(u)) == canon(u) — the
    canonical form is a fixed point (absolute urls pass through)."""
    try:
        once = build_abs_url(scraped, base)
    except Exception:
        return  # error rows are quarantined, nothing to iterate
    assert build_abs_url(once, base) == once


def test_spark_udf_and_column_helpers(spark):
    rows = [(s, b) for s, b, _ in REFERENCE_CASES] + ERROR_CASES
    df = spark.createDataFrame(rows, "scraped string, base string")
    got = (
        with_abs_url(df, "scraped", "base")
        .select("scraped", "base", "url", "canon_error")
        .collect()
    )
    by_key = {(r["scraped"], r["base"]): r for r in got}
    for s, b, expected in REFERENCE_CASES:
        r = by_key[(s, b)]
        assert r["url"] == expected and r["canon_error"] is None
    for s, b in ERROR_CASES:
        r = by_key[(s, b)]
        assert r["url"] is None and r["canon_error"] is not None

    helpers = (
        spark.createDataFrame(
            [("HTTPS://Ex.COM:8080/a/b?q=1", ), ("https://h.io", ), ("example.com/x", )],
            "u string",
        )
        .select(
            host_of_col("u").alias("host"),
            path_of_col("u").alias("path"),
            normalize_seed_url_col("u").alias("seed"),
        )
        .collect()
    )
    assert helpers[0]["host"] == "ex.com:8080"
    assert helpers[0]["path"] == "/a/b"
    assert helpers[1]["host"] == "h.io" and helpers[1]["path"] == ""
    # 'http' substring quirk (docrawl_client.py:200-201): prepend only
    # when 'http' appears nowhere; note 'nohttp.com' would NOT get it.
    assert helpers[2]["seed"] == "http://example.com/x"


def test_seed_quirk_case_sensitivity(spark):
    # 'http' must appear as an exact substring; 'HTTP' does not count
    # (reference check is case-sensitive, docrawl_client.py:200-201).
    df = spark.createDataFrame(
        [("HTTP://x.com",), ("https://x.com",), ("x.com/http-page",)], "u string"
    )
    got = [r[0] for r in df.select(normalize_seed_url_col("u")).collect()]
    assert got == ["http://HTTP://x.com", "https://x.com", "x.com/http-page"]


REFS_BATTERY = [
    "https://x.test/a", "http://a/b#", "http://a/b?", "http://a/b?#f",
    "HTTP://a/b", "ftp://h/p", "//proto.rel/x", "/abs/path", "/p?q=1#f",
    "/", "a", "a/b", "a/b/c", "../up", "../../up/two", "./here",
    "a/./b", "a/../b", "x;y", "/x;y", "a?q", "a#f", "a b", " a",
    "", None, "mailto:info@x", "javascript:void(0)", "a//b", "a/",
    "x" * 300, "../" * 9 + "deep",
]
BASES_BATTERY = [
    "https://h.test/d1/d2/leaf", "https://h.test/", "https://h.test",
    "http://h.test/one", "HTTPS://H.test/Mixed/Case", "https://h.test/p?q=1",
    "https://h.test/p;param", "not a url", "", None, "https://h.test//dbl/p",
]


def test_hybrid_equals_udf_strategy(spark):
    """The JVM fast paths (with_abs_url strategy='hybrid') must produce
    exactly the all-UDF result for every (ref, base) shape: absolute
    (incl. empty-component '?'/'#' cases), domain-relative,
    protocol-relative, plain relative, '../'-walks incl. underflow,
    dot segments, ';' params, query/fragment refs, null/missing base,
    empty and null refs, whitespace, odd bases."""
    from docrawl_spark.functions.canon import with_abs_url

    rows = [(r, b) for r in REFS_BATTERY for b in BASES_BATTERY]
    df = spark.createDataFrame(rows, "ref string, base string")
    a = with_abs_url(df, "ref", "base", strategy="hybrid").select(
        "ref", "base", "url", "canon_error"
    )
    e = with_abs_url(df, "ref", "base", strategy="udf").select(
        "ref", "base", "url", "canon_error"
    )
    got = {(r["ref"], r["base"]): (r["url"], r["canon_error"]) for r in a.collect()}
    exp = {(r["ref"], r["base"]): (r["url"], r["canon_error"]) for r in e.collect()}
    assert set(got) == set(exp) and len(got) == len(rows)
    diffs = {k: (got[k], exp[k]) for k in exp if got[k] != exp[k]}
    assert not diffs, f"{len(diffs)} hybrid/udf mismatches, e.g. {list(diffs.items())[:5]}"


def test_canonicalize_arrow_matches_batch_battery():
    """The Arrow-native batch (canonicalize_arrow) == the pandas batch
    on the full refs×bases battery, called DIRECTLY (no Spark) so every
    mask interaction inside one heterogeneous batch is exercised."""
    import pyarrow as pa

    from docrawl_spark.functions.canon import canonicalize_arrow

    rows = [(r, b) for r in REFS_BATTERY for b in BASES_BATTERY]
    s = pd.Series([r for r, _ in rows], dtype=object)
    b = pd.Series([x for _, x in rows], dtype=object)
    expected = canonicalize_batch(s, b)
    got = canonicalize_arrow(
        pa.array(s, type=pa.string()), pa.array(b, type=pa.string())
    )
    urls = got.field("url").to_pylist()
    errs = got.field("error").to_pylist()
    for i, (r, base) in enumerate(rows):
        exp_u = expected["url"][i]
        exp_e = expected["error"][i]
        assert urls[i] == (None if exp_u is None else exp_u), (r, base, urls[i], exp_u)
        assert errs[i] == (None if exp_e is None else exp_e), (r, base, errs[i], exp_e)


@settings(max_examples=300, deadline=None)
@given(
    scraped=st.one_of(
        st.sampled_from(
            ["/a/b", "a/b", "../x", "./y", "https://z.org/q?a=1", "//cdn.z.org/i.png",
             "", ".", "..", "a/../b", "/p?q#f", "x;y", "HTTPS://UP.com/A"]
        ),
        st.text(alphabet="abc/.?#:&=%", max_size=24),
    ),
    base=st.one_of(
        st.none(),
        st.sampled_from(
            ["https://example.com", "https://example.com/", "https://example.com/aaa/bbb",
             "http://h.io/p/", "ftp://f.net/d/e", "example.com/noscheme"]
        ),
    ),
)
def test_arrow_matches_scalar(scraped, base):
    """Property: the Arrow-native batch == the exact scalar, always."""
    import pyarrow as pa

    from docrawl_spark.functions.canon import canonicalize_arrow

    try:
        expected_url, expected_err = build_abs_url(scraped, base), None
    except Exception:
        expected_url, expected_err = None, "err"
    out = canonicalize_arrow(
        pa.array([scraped], type=pa.string()), pa.array([base], type=pa.string())
    )
    assert out.field("url").to_pylist()[0] == expected_url
    assert (out.field("error").to_pylist()[0] is None) == (expected_err is None)


def test_arrow_strategy_equals_udf(spark):
    """with_abs_url(strategy='arrow') (the default) == strategy='udf'
    through Spark, over the full battery."""
    from docrawl_spark.functions.canon import with_abs_url

    rows = [(r, b) for r in REFS_BATTERY for b in BASES_BATTERY]
    df = spark.createDataFrame(rows, "ref string, base string")
    a = with_abs_url(df, "ref", "base", strategy="arrow").select(
        "ref", "base", "url", "canon_error"
    )
    e = with_abs_url(df, "ref", "base", strategy="udf").select(
        "ref", "base", "url", "canon_error"
    )
    got = {(r["ref"], r["base"]): (r["url"], r["canon_error"]) for r in a.collect()}
    exp = {(r["ref"], r["base"]): (r["url"], r["canon_error"]) for r in e.collect()}
    assert set(got) == set(exp) and len(got) == len(rows)
    diffs = {k: (got[k], exp[k]) for k in exp if got[k] != exp[k]}
    assert not diffs, f"{len(diffs)} arrow/udf mismatches, e.g. {list(diffs.items())[:5]}"


def test_percent_normalize_rfc3986(spark):
    """§6.2.2: unreserved escapes decode, reserved escapes uppercase,
    malformed/truncated escapes pass through, multiple escapes in one
    URL all resolve."""
    from docrawl_spark.functions.canon import percent_normalize_col

    cases = {
        "http://h/%2e%2E": "http://h/..",          # unreserved decodes
        "http://h/a%2fb": "http://h/a%2Fb",        # reserved uppercases
        "http://h/%7euser": "http://h/~user",
        "http://h/%zz": "http://h/%zz",            # malformed untouched
        "http://h/x%": "http://h/x%",              # trailing bare %
        "http://h/%4": "http://h/%4",              # truncated escape
        "http://h/plain": "http://h/plain",
        "http://h/%41%2f%2d": "http://h/A%2F-",    # mixed in one URL
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {
        r["url"]: r["n"]
        for r in df.select(
            "url", percent_normalize_col("url").alias("n")
        ).collect()
    }
    assert got == cases


def test_percent_normalize_matches_python_spec_and_is_idempotent(spark):
    """500 seeded random URLs (hex escapes, malformed escapes, bare %,
    unicode) must match an independent pure-Python implementation of
    RFC 3986 §6.2.2, and normalizing twice must equal normalizing
    once."""
    import random
    import string

    from docrawl_spark.functions.canon import percent_normalize_col

    def py_norm(u: str) -> str:
        parts = u.split("%")
        out = [parts[0]]
        unreserved = set(string.ascii_letters + string.digits + "-._~")
        for p in parts[1:]:
            if len(p) >= 2 and all(c in string.hexdigits for c in p[:2]):
                ch = chr(int(p[:2], 16))
                if ch in unreserved:
                    out.append(ch + p[2:])
                else:
                    out.append("%" + p[:2].upper() + p[2:])
            else:
                out.append("%" + p)
        return "".join(out)

    rng = random.Random(7)
    alphabet = string.ascii_letters + string.digits + "/.%~:?=&-_ä%%"
    urls = []
    for i in range(500):
        n = rng.randint(1, 40)
        urls.append("http://h/" + "".join(rng.choice(alphabet) for _ in range(n)))
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select("url", percent_normalize_col("url").alias("n1"))
    both = once.select(
        "url", "n1", percent_normalize_col(F.col("n1")).alias("n2")
    ).collect()
    for r in both:
        assert r["n1"] == py_norm(r["url"]), r["url"]
        assert r["n2"] == r["n1"], f"not idempotent: {r['url']}"


def test_surt_col_forms(spark):
    """SURT: www fold, label reversal, bare-path '/', fragment drop,
    query kept, multi-label hosts."""
    from docrawl_spark.functions.canon import surt_col

    cases = [
        ("https://www.a.example.com/p?q=1", "com,example,a)/p?q=1"),
        ("https://example.com", "com,example)/"),
        ("http://EXAMPLE.co.uk/x#frag", "uk,co,example)/x"),
        ("https://www.example.com/", "com,example)/"),
        # www only folds as a LEADING label
        ("https://a.www.example.com/p", "com,example,www,a)/p"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["surt"] for r in df.select(surt_col("url").alias("surt")).collect()]
    assert got == [e for _, e in cases]


def test_link_header_relations_parsing(spark):
    """RFC 8288: multi-relation split, quoted/unquoted rel, case fold,
    extra params ignored, missing/blank header -> no rows."""
    from docrawl_spark.operators.fetch import link_header_relations

    rows = [
        ("u1", {"link": '<https://h/2>; rel="next", <https://h/0>; rel="prev"'}),
        ("u2", {"link": '<https://h/c>; REL=Canonical; type="text/html"'}),
        ("u3", {"server": "x"}),
        ("u4", {"link": ""}),
    ]
    df = spark.createDataFrame(rows, "url string, headers map<string,string>")
    got = sorted(
        (r["url"], r["link_order"], r["target"], r["rel"])
        for r in link_header_relations(df).collect()
    )
    assert got == [
        ("u1", 0, "https://h/2", "next"),
        ("u1", 1, "https://h/0", "prev"),
        ("u2", 0, "https://h/c", "canonical"),
    ]
