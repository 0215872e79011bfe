"""Hand-computed cases for the bigram-LM surprisal score
(datapipe/text.lm_bits_score) and positional phrase search
(datapipe/search.phrase_search); cross-engine oracle rows live in
test_oracle_parity."""

from __future__ import annotations

from docrawl_spark.datapipe.search import phrase_search
from docrawl_spark.datapipe.text import lm_bits_score


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lm_bits_hand_computed(spark):
    """Corpus {d1: 'a b a b', d2: 'a b c'} — prefix counts a:3 b:2,
    bigram counts 'a b':3 'b a':1 'b c':1; bitlen(3)=bitlen(2)=2,
    bitlen(1)=1, so d1 = 0+1+0 bits over 3 bigrams, d2 = 0+1 over 2."""
    out = {
        r["doc_id"]: (r["n_bigrams"], r["total_bits"], r["mean_bits_ppm"])
        for r in lm_bits_score(_docs(spark, [(1, "a b a b"), (2, "a b c")])).collect()
    }
    assert out[1] == (3, 1, 333333)
    assert out[2] == (2, 1, 500000)


def test_lm_bits_common_text_scores_lower(spark):
    """Nine copies of one sentence + one unique sentence: the repeated
    text's bigrams are corpus-frequent (low surprisal), the unique
    text's are singletons against frequent prefixes (high surprisal)."""
    rows = [(i, "the quick brown fox jumps") for i in range(9)]
    rows.append((99, "the turbine violet reef hums"))
    got = {r["doc_id"]: r["mean_bits_ppm"] for r in lm_bits_score(_docs(spark, rows)).collect()}
    assert got[99] > got[0]


def test_lm_bits_single_token_docs_dropped(spark):
    """Docs with < 2 tokens have no bigrams and no output row."""
    out = lm_bits_score(_docs(spark, [(1, "solo"), (2, ""), (3, "a b")])).collect()
    assert [r["doc_id"] for r in out] == [3]


def test_phrase_overlapping_occurrences(spark):
    """'x a a a y' vs phrase 'a a': overlapping matches at anchors 1
    and 2 both count."""
    out = phrase_search(_docs(spark, [(1, "x a a a y")]), "a a").collect()
    assert [(r["doc_id"], r["n_occurrences"], r["first_pos"]) for r in out] == [
        (1, 2, 1)
    ]


def test_phrase_duplicate_query_token_no_false_positive(spark):
    """Phrase 'a b a' (repeated token): 'a b c' must NOT match even
    though it witnesses qidx 0 and 1 at anchor 0; genuine occurrences
    count exactly."""
    rows = [(1, "a b a"), (2, "a b c"), (3, "z a b a a b a")]
    out = {
        r["doc_id"]: (r["n_occurrences"], r["first_pos"])
        for r in phrase_search(_docs(spark, rows), "a b a").collect()
    }
    assert out == {1: (1, 0), 3: (2, 1)}


def test_phrase_normalizes_case_and_whitespace(spark):
    out = phrase_search(_docs(spark, [(1, "The  QUICK   fox")]), "quick fox").collect()
    assert [(r["doc_id"], r["n_occurrences"], r["first_pos"]) for r in out] == [
        (1, 1, 1)
    ]


def test_phrase_single_token(spark):
    out = phrase_search(_docs(spark, [(1, "b a b b")]), "b").collect()
    assert [(r["doc_id"], r["n_occurrences"], r["first_pos"]) for r in out] == [
        (1, 3, 0)
    ]
