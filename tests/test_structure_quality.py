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


def test_linear_classifier_hand_weights(spark):
    """Known weights: score sums per token OCCURRENCE, repeated tokens
    count twice; keep is the mean-weight test in integers."""
    import hashlib

    from docrawl_spark.datapipe.classifier import linear_quality_scores

    docs = spark.createDataFrame(
        [("d1", "good good bad"), ("d2", "bad"), ("d3", "   ")],
        "doc_id string, text string",
    )

    def bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 8

    bg, bb = bucket("good"), bucket("bad")
    assert bg != bb  # hand fixture relies on distinct buckets
    weights = spark.createDataFrame(
        [(bg, 100), (bb, -40)]
        + [(i, 0) for i in range(8) if i not in (bg, bb)],
        "bucket long, weight_fp long",
    )
    got = {
        r["doc_id"]: (r["n_feats"], r["score_fp"], r["keep"])
        for r in linear_quality_scores(
            docs, weights, n_buckets=8, threshold_fp=50
        ).collect()
    }
    assert got["d1"] == (3, 160, True)   # 160 >= 50*3
    assert got["d2"] == (1, -40, False)
    assert got["d3"] == (0, 0, False)    # featureless fails positive threshold


def test_linear_classifier_empty_doc_nonpositive_threshold(spark):
    from docrawl_spark.datapipe.classifier import (
        linear_quality_scores,
        synthetic_weights,
    )

    docs = spark.createDataFrame([("d", "")], "doc_id string, text string")
    w = synthetic_weights(spark, 8, seed=1)
    row = linear_quality_scores(docs, w, 8, threshold_fp=0).collect()[0]
    assert (row["n_feats"], row["score_fp"], row["keep"]) == (0, 0, True)


def test_synthetic_weights_deterministic_and_bounded(spark):
    from docrawl_spark.datapipe.classifier import synthetic_weights, WEIGHT_SCALE

    a = {r["bucket"]: r["weight_fp"] for r in synthetic_weights(spark, 64, 5).collect()}
    b = {r["bucket"]: r["weight_fp"] for r in synthetic_weights(spark, 64, 5).collect()}
    assert a == b and len(a) == 64
    assert all(-WEIGHT_SCALE <= v <= WEIGHT_SCALE for v in a.values())
    c = {r["bucket"]: r["weight_fp"] for r in synthetic_weights(spark, 64, 6).collect()}
    assert c != a


def test_readability_hand_doc(spark):
    """'the cat sat. it ran away!' — 6 words, 2 sentences, syllables:
    the(1) cat(1) sat(1) it(1) ran(1) away(2) = 7.
    grade_centi = 39*6 div 2 + 1180*7 div 6 - 1559 = 117 + 1376 - 1559
    = -66 (simple text scores below grade 1 — negative is in-spec)."""
    from docrawl_spark.datapipe.text import readability_scores

    docs = spark.createDataFrame(
        [("d1", "the cat sat. it ran away!"), ("d2", "   "), ("d3", "zzz pfft")],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_words"], r["n_sentences"], r["n_syllables"], r["grade_centi"]
        )
        for r in readability_scores(docs).collect()
    }
    assert got["d1"] == (6, 2, 7, 39 * 6 // 2 + 1180 * 7 // 6 - 1559)
    # wordless doc: explicit zeros, sentence floor still 1
    assert got["d2"] == (0, 1, 0, 0)
    # vowel-free words floor at 1 syllable each
    assert got["d3"] == (2, 1, 2, 39 * 2 // 1 + 1180 * 2 // 2 - 1559)


def test_strand_pairs_hand_urls(spark):
    """Same site+path across /en/ and /fr/ pairs up via the min-URL
    representative; a marker-free URL is dropped; different hosts never
    pair (template includes the host)."""
    from docrawl_spark.datapipe.bitext import strand_url_pairs

    urls = spark.createDataFrame(
        [
            ("https://a.test/en/p/1",),
            ("https://a.test/en/p/1?v=2",),  # dup variant, min-url loses
            ("https://a.test/fr/p/1",),
            ("https://b.test/fr/p/1",),      # other host: no partner
            ("https://a.test/p/2",),         # no marker: dropped
        ],
        "url string",
    )
    rows = strand_url_pairs(urls, ["en", "fr"]).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["lang_a"], r["url_a"], r["lang_b"], r["url_b"]) == (
        "en", "https://a.test/en/p/1", "fr", "https://a.test/fr/p/1"
    )
    assert r["template"] == "https://a.test/{L}/p/1"


def test_strand_rejects_regex_meta_in_codes(spark):
    import pytest

    from docrawl_spark.datapipe.bitext import strand_url_pairs

    urls = spark.createDataFrame([("https://a.test/en/p",)], "url string")
    with pytest.raises(ValueError):
        strand_url_pairs(urls, ["en", "f.r"])


def test_benford_deviation_hand_counts(spark):
    """9 numbers, one per digit (uniform): every digit observed at
    111111 ppm; tvd = sum |111111 - benford_d|. Leading zeros strip
    ('007' counts as 7), all-zero runs are skipped, numberless groups
    are omitted."""
    from docrawl_spark.datapipe.text import BENFORD_PPM, benford_deviation

    docs = spark.createDataFrame(
        [
            ("u", "1 2 3 4 5 6 7 8 9"),
            ("z", "a 007 000 b"),
            ("none", "no digits here"),
        ],
        "source string, text string",
    )
    got = {
        r["source"]: (r["n_numbers"], r["tvd_ppm"])
        for r in benford_deviation(docs).collect()
    }
    assert set(got) == {"u", "z"}
    exp_u = sum(abs(1_000_000 // 9 - p) for p in BENFORD_PPM.values())
    assert got["u"] == (9, exp_u)
    # 'z': single number 7 -> digit 7 at 10^6 ppm, others at 0
    exp_z = abs(1_000_000 - BENFORD_PPM[7]) + sum(
        p for d, p in BENFORD_PPM.items() if d != 7
    )
    assert got["z"] == (1, exp_z)


def test_filter_sections_drop_and_reassemble(spark):
    """The image-only section and the thin one drop; survivors
    reassemble in offset order (headline text included); a doc whose
    sections all drop keeps its row with empty text."""
    from docrawl_spark.datapipe.structure import filter_sections

    docs = spark.createDataFrame(
        [
            (
                "d1",
                [
                    ("headline", "Good", None, 0),
                    ("text", "alpha beta", None, 1),
                    ("text", "gamma", None, 2),
                    ("headline", "Gallery", None, 10),
                    ("image", None, "img://a.jpg", 11),
                    ("headline", "Thin", None, 20),
                    ("text", "x", None, 21),
                ],
            ),
            ("d2", [("image", None, "img://b.jpg", 0)]),
        ],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    got = {
        r["doc_id"]: (
            r["n_sections_kept"],
            r["n_sections_dropped"],
            r["text_kept"],
        )
        for r in filter_sections(docs, min_text_spans=2, min_chars=5).collect()
    }
    assert got["d1"] == (1, 2, "Good alpha beta gamma")
    assert got["d2"] == (0, 1, "")


def test_component_size_histogram_buckets(spark):
    """Sizes 1,1,2,5 -> bit-length buckets 1 (two singletons),
    2 (the pair), 3 (the five)."""
    from docrawl_spark.datapipe.graph import component_size_histogram

    labels = spark.createDataFrame(
        [("n1", "a"), ("n2", "b"), ("n3", "c"), ("n4", "c"),
         ("n5", "d"), ("n6", "d"), ("n7", "d"), ("n8", "d"), ("n9", "d")],
        "host string, component string",
    )
    got = {
        r["bucket_bits"]: (r["n_components"], r["n_nodes"])
        for r in component_size_histogram(labels).collect()
    }
    assert got == {1: (2, 2), 2: (1, 2), 3: (1, 5)}
