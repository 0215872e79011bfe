"""Text analysis over the documents table — all pure built-in
expressions (whole-stage codegen; zero Python in the hot path).

- token counting: whitespace tokens + a BPE-ish sub-word estimate;
- language ID: stopword-hit scoring over small per-language marker
  sets (a deterministic n-gram-free heuristic that both Spark and a
  SQL oracle can compute identically);
- quality scoring: length / punctuation / stopword / repetition
  signals combined into one bounded score;
- fingerprinting: whole-doc content hash + winnowing-style rolling
  window minimum over token hashes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker words per language — tiny on purpose (broadcast as literals
# into the expression; at 100 TB nothing is shipped per-row).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "que"],
    "es": ["el", "la", "los", "de", "que", "es", "un", "una"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}


def tokens_col(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), r"\s+")


def token_count_col(text: Column) -> Column:
    """Whitespace token count ('' → 0)."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def subword_estimate_col(text: Column, chars_per_token: float = 4.0) -> Column:
    """BPE-ish token estimate: ceil(chars/4) blended with word count —
    the standard cheap proxy when no tokenizer ships with the job."""
    words = token_count_col(text)
    chars = F.length(F.trim(text))
    return F.greatest(
        words, F.ceil(chars / F.lit(chars_per_token)).cast("int")
    ).cast("int")


def lang_scores_col(text: Column) -> Column:
    """Map lang → marker-hit count among the doc's distinct tokens."""
    toks = F.array_distinct(tokens_col(text))
    entries = [
        F.struct(
            F.lit(lang).alias("lang"),
            F.size(
                F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
            ).cast("long").alias("hits"),
        )
        for lang, words in LANG_MARKERS.items()
    ]
    return F.array(*entries)


def langid_col(text: Column) -> Column:
    """argmax language by marker hits; ties and zero-hit docs → 'und'.
    Deterministic tie-break: higher hits, then lexicographic lang."""
    scores = lang_scores_col(text)
    best = F.aggregate(
        scores,
        F.struct(F.lit("und").alias("lang"), F.lit(0).cast("long").alias("hits")),
        lambda acc, s: F.when(
            (s["hits"] > acc["hits"])
            | ((s["hits"] == acc["hits"]) & (s["hits"] > 0) & (s["lang"] < acc["lang"])),
            s,
        ).otherwise(acc),
    )
    return best["lang"]


def quality_score_col(text: Column) -> Column:
    """Bounded [0, 1000] integer quality score:
    + length in a healthy band (≤350), + low token repetition (≤250),
    + stopword presence (≤250), + low punctuation density (≤150).

    INTEGER arithmetic throughout (floor division on exact ints) so the
    score is bit-identical across engines — float weight sums land on
    round-half boundaries and flake value-hash comparisons."""
    t = F.trim(text)
    n_chars = F.length(t).cast("long")
    toks = tokens_col(t)
    n_tok = token_count_col(t).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    punct = F.length(F.regexp_replace(t, r"[^!-/:-@\[-`{-~]", "")).cast("long")
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in LANG_MARKERS["en"]]),
        )
    ).cast("long")
    len_part = F.floor(F.lit(350) * F.least(n_chars, F.lit(500)) / F.lit(500))
    rep_part = F.when(
        n_tok > 0, F.floor(F.lit(250) * n_distinct / n_tok)
    ).otherwise(F.lit(0))
    stop_part = F.floor(F.lit(250) * F.least(stop_hits, F.lit(4)) / F.lit(4))
    punct_part = F.when(
        n_chars > 0,
        F.floor(
            F.lit(150)
            * F.greatest(n_chars - F.least(punct * 5, n_chars), F.lit(0))
            / n_chars
        ),
    ).otherwise(F.lit(0))
    return (len_part + rep_part + stop_part + punct_part).cast("int")


def doc_fingerprint_col(text: Column) -> Column:
    """Whole-doc content fingerprint over normalized text (exact-dup
    key; xxhash64 — JVM-side)."""
    return F.xxhash64(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))


def winnow_fingerprints_col(
    text: Column, window: int = 4, hash_mode: str = "xxhash64"
) -> Column:
    """Winnowing-style fingerprint set: rolling minimum of token-hash
    windows — robust to local edits, used for partial-overlap detection
    (Schleimer et al., SIGMOD'03). Pure array expressions.

    hash_mode 'md5hex' hashes tokens to 15-hex-char strings instead of
    xxhash64 longs — lexicographic minima match DuckDB byte-for-byte,
    making the fingerprint set oracle-checkable."""
    if hash_mode == "md5hex":
        hashes = F.transform(
            tokens_col(text), lambda t: F.substring(F.md5(t), 1, 15)
        )
    else:
        hashes = F.transform(tokens_col(text), lambda t: F.xxhash64(t))
    n = F.size(hashes)
    # n >= window guard: sequence(1, 0) descends and slice(…, 0, …)
    # raises — short docs must yield an empty fingerprint set instead
    idx = F.when(n >= window, F.sequence(F.lit(1), n - (window - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_min(F.slice(hashes, i, window)))
    )


def char_run_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Character-level quality signals per doc — the C4/Gopher-family
    rules token metrics miss: the longest same-character run (ASCII-art
    / keyboard-mash / progress-bar detector) and the char-class mix in
    exact ppm (letters / digits / whitespace / other — code-vs-prose
    and phone-dump signals).

    Columns: n_chars, max_run, letter_ppm, digit_ppm, space_ppm,
    other_ppm (integer div; empty docs report all zeros).

    Scale shape: max_run is a per-row ARRAY FOLD (`F.aggregate` over
    the char array) — O(doc) state, ZERO shuffle; the explode→window
    alternative would shuffle one row per character (10^14 rows at
    100 TB). The interpreted-HOF cost (CLAUDE.md) is one linear pass
    per row here, not a nested per-element hash — the fold is the
    right trade against a corpus-sized per-char exchange. Class
    counts are JVM regexp_replace lengths (codegen)."""
    t = F.trim(F.col(text_col))
    chars = F.filter(F.split(t, ""), lambda c: c != "")
    fold = F.aggregate(
        chars,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, c: F.struct(
            c.alias("prev"),
            F.when(c == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(c == acc["prev"], acc["run"] + 1).otherwise(
                    F.lit(1).cast("long")
                ),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    base = df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        fold.alias("max_run"),
        F.length(F.regexp_replace(t, r"[^a-zA-Z]", "")).cast("long").alias(
            "_letters"
        ),
        F.length(F.regexp_replace(t, r"[^0-9]", "")).cast("long").alias(
            "_digits"
        ),
        F.length(F.regexp_replace(t, r"[^ \t\n\r]", "")).cast("long").alias(
            "_spaces"
        ),
    )
    ppm = (
        lambda num, name: F.when(
            F.col("n_chars") > 0,
            F.expr(f"1000000 * {num} div n_chars"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias(name)
    )
    return base.select(
        id_col,
        "n_chars",
        "max_run",
        ppm("_letters", "letter_ppm"),
        ppm("_digits", "digit_ppm"),
        ppm("_spaces", "space_ppm"),
        ppm("(n_chars - _letters - _digits - _spaces)", "other_ppm"),
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher/RefinedWeb-style repetition quality signals per doc —
    the standard pre-training corpus filters (Rae et al. 2021 §A1.1;
    Penedo et al. 2023): excessive token repetition marks boilerplate
    and spam.

    Columns: n_tokens, n_distinct, dup_token_frac (1 - distinct/total),
    top_bigram_count, top_bigram_frac (most frequent word 2-gram's
    share of all bigrams). Fractions ROUND(...,6) for cross-engine
    value-hash stability.

    Scale shape: one explode→HashAggregate per doc for the bigram mode
    (map-side combinable; same reshape lesson as MinHash — no nested
    HOF), one groupBy(doc) rollup. Docs with <2 tokens have no bigrams:
    top_bigram_count=0, top_bigram_frac=0.0."""
    toks = tokens_col(F.col(text_col))
    base = df.select(
        F.col(id_col),
        token_count_col(F.col(text_col)).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    ).withColumn(
        "dup_token_frac",
        F.when(
            F.col("n_tokens") > 0,
            F.round(1.0 - F.col("n_distinct") / F.col("n_tokens"), 6),
        ).otherwise(F.lit(0.0)),
    )
    n = F.size(toks)
    idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    bigrams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, 2)))
    bg = df.select(F.col(id_col), F.explode(bigrams).alias("_bg"))
    top = (
        bg.groupBy(id_col, "_bg")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(F.max("_c").alias("top_bigram_count"), F.sum("_c").alias("_total"))
    )
    out = base.join(top, id_col, "left").select(
        id_col,
        "n_tokens",
        "n_distinct",
        "dup_token_frac",
        F.coalesce(F.col("top_bigram_count"), F.lit(0).cast("long")).alias(
            "top_bigram_count"
        ),
        F.when(
            F.coalesce(F.col("_total"), F.lit(0)) > 0,
            F.round(F.col("top_bigram_count") / F.col("_total"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
    )
    return out


def ngram_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """Decontamination: (doc, benchmark-doc) pairs sharing ≥1 word
    n-gram, with the shared-distinct-n-gram count — the standard
    test-set-leakage check before training (n=13 in GPT-3's report;
    parameterized here).

    Scale shape: both sides explode DISTINCT n-grams and meet in an
    equi-join on the n-gram string — work is proportional to matching
    grams, never |corpus| x |benchmark| (the benchmark side is small;
    at cluster scale broadcast it)."""
    from docrawl_spark.datapipe.dedup import word_shingles_col

    c = corpus.select(
        F.col(id_col),
        F.explode(word_shingles_col(F.col(text_col), n)).alias("_g"),
    )
    b = benchmark.select(
        F.col(id_col).alias(bench_id_col),
        F.explode(word_shingles_col(F.col(text_col), n)).alias("_g"),
    )
    return (
        c.join(b, "_g")
        .groupBy(id_col, bench_id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def vocab_top_tokens(
    df: DataFrame, k: int = 100, text_col: str = "text", min_len: int = 1
) -> DataFrame:
    """Corpus vocabulary head: top-k tokens by frequency (ties broken
    lexicographically for determinism) — the vocabulary-building /
    corpus-inspection primitive. explode → HashAggregate → TakeOrdered
    (per-partition top-k + k-row merge, never a global sort)."""
    toks = df.select(F.explode(tokens_col(F.col(text_col))).alias("token")).where(
        F.length("token") >= min_len
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.col("n").desc(), F.col("token").asc()).limit(k)


def vocab_growth_curve(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_size: int = 64,
) -> DataFrame:
    """Heaps-law vocabulary-growth curve over contiguous ingest
    batches (``batch = id div batch_size`` — the crawl-wave proxy on a
    batch-id-ordered corpus): per batch, docs, token instances, NEW
    distinct token types (first ever appearance), and the running
    totals. The read-before-scaling curve for tokenizer sizing and
    crawl-payoff audits — a flattening cum_types says new waves add
    volume, not language.

    Scale shape: token first-appearance is one explode → distinct →
    MIN HashAggregate (map-side combinable; never holds per-batch
    vocabularies); the running sums window over #batches rows only
    (corpus-size / batch_size — thousands, not billions). Integer
    `div` matches DuckDB `//` on non-negative BIGINTs."""
    from pyspark.sql import Window

    batch = F.expr(f"{id_col} div {batch_size}").alias("batch")
    per_batch = df.select(batch, F.col(text_col)).groupBy("batch").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count_col(F.col(text_col)).cast("long")).alias(
            "token_instances"
        ),
    )
    firsts = (
        df.select(batch, F.explode(tokens_col(F.col(text_col))).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.min("batch").alias("batch"))
    )
    new_types = firsts.groupBy("batch").agg(
        F.count(F.lit(1)).alias("new_types")
    )
    joined = per_batch.join(new_types, "batch", "left").select(
        "batch",
        "n_docs",
        "token_instances",
        F.coalesce(F.col("new_types"), F.lit(0)).cast("long").alias(
            "new_types"
        ),
    )
    w = Window.orderBy("batch").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        "batch",
        "n_docs",
        "token_instances",
        "new_types",
        F.sum("new_types").over(w).alias("cum_types"),
        F.sum("token_instances").over(w).alias("cum_instances"),
    )


def oov_rates(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_col: str = "token",
) -> DataFrame:
    """Per-document out-of-vocabulary rate against a fixed token
    vocabulary — the tokenizer-coverage / fertility audit run before
    committing a vocab to a training corpus (high OOV ⇒ the tokenizer
    shatters that doc into bytes). (id, n_tokens, n_oov, oov_ppm),
    integer-exact.

    The vocab is a broadcast dim (even a 256k-entry real vocab
    broadcasts); the probe is one broadcast-hash lookup per token and
    the per-doc aggregate is map-side combinable. Docs with zero
    tokens have no rows (no fake 0/0 rates)."""
    toks = df.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("token")
    ).where(F.length("token") >= 1)
    v = vocab.select(F.col(token_col).alias("token")).distinct().withColumn(
        "_v", F.lit(1)
    )
    j = toks.join(F.broadcast(v), "token", "left")
    agg = j.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("_v").isNull(), 1).otherwise(0)).alias("n_oov"),
    )
    return agg.withColumn(
        "oov_ppm",
        F.expr(
            "n_oov * CAST(1000000 AS BIGINT) div greatest(n_tokens, CAST(1 AS BIGINT))"
        ),
    )


def bpe_pair_stats(
    df: DataFrame, k: int = 20, text_col: str = "text", min_word_len: int = 2
) -> DataFrame:
    """The first BPE-training iteration: adjacent-symbol (character)
    pair frequencies over the word-frequency table, top-``k`` merge
    candidates. This is the counting kernel a distributed BPE trainer
    repeats per merge round; expressed as explode → HashAggregate so
    the corpus pass is map-side combinable and the per-word pair
    explode runs over the (much smaller) DISTINCT-word table, not the
    token stream.

    ``sequence(1, length-1)`` would DESCEND for 1-char words
    (CLAUDE.md) — the ``min_word_len`` filter guards it."""
    toks = df.select(F.explode(tokens_col(F.col(text_col))).alias("word"))
    wf = (
        toks.where(F.length("word") >= max(2, min_word_len))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = wf.select(
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair"),
        "n",
    )
    stats = pairs.groupBy("pair").agg(F.sum("n").alias("pair_count"))
    return stats.orderBy(F.col("pair_count").desc(), F.col("pair").asc()).limit(k)


def script_counts_cols(text: Column) -> list[Column]:
    """Unicode-script character counts — the script-detection signal
    under language ID (a doc claiming lang=en that is 60% Han is
    mislabelled). Pure JVM codegen: count(script) = len(t) -
    len(regexp_replace(t, script_class, '')). Java regex script
    classes (``\\p{IsLatin}``) — the DuckDB oracle mirrors with RE2's
    ``\\p{Latin}`` spelling; counts are exact integers either way."""
    t = F.coalesce(text, F.lit(""))
    n = F.length(t)

    def _cnt(pat: str) -> Column:
        return (n - F.length(F.regexp_replace(t, pat, ""))).cast("long")

    n_latin = _cnt(r"\p{IsLatin}")
    n_han = _cnt(r"\p{IsHan}")
    n_digit = _cnt(r"[0-9]")
    n_space = _cnt(r"\s")
    return [
        n.cast("long").alias("n_chars_total"),
        n_latin.alias("n_latin"),
        n_han.alias("n_han"),
        n_digit.alias("n_digit"),
        n_space.alias("n_space"),
        (n.cast("long") - n_latin - n_han - n_digit - n_space).alias("n_other"),
    ]


def script_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc script mix + dominant script (han > latin > digit
    precedence on ties — deterministic, mirrored in the oracle) +
    integer ppm Han share. Shuffle-free row-local exprs."""
    out = df.select(F.col(id_col), *script_counts_cols(F.col(text_col)))
    dominant = (
        F.when(
            (F.col("n_han") >= F.col("n_latin"))
            & (F.col("n_han") >= F.col("n_digit"))
            & (F.col("n_han") > 0),
            F.lit("han"),
        )
        .when(F.col("n_latin") >= F.col("n_digit"), F.lit("latin"))
        .otherwise(F.lit("digit"))
    )
    han_ppm = F.expr(
        "(n_han * CAST(1000000 AS BIGINT)) div greatest(n_chars_total, CAST(1 AS BIGINT))"
    )
    return out.withColumn("dominant", dominant).withColumn("han_ppm", han_ppm)


def doc_keywords(
    df: DataFrame,
    k: int = 3,
    min_len: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_docs: int | None = None,
) -> DataFrame:
    """Per-document TF-IDF keyword extraction in the float-free
    integer basis: ``idf_bits = bit_length(N div df)`` via
    ``length(bin(x))`` — identical in Spark and DuckDB (CLAUDE.md) —
    and ``score = tf * idf_bits``. Top-``k`` tokens per doc, ties
    broken lexicographically.

    Plan shape: explode → HashAggregate tf → HashAggregate df →
    equi-join on token → per-doc window. The window partitions on
    doc_id (bounded by tokens-per-doc, no skew); the token join's hot
    keys (stopwords hit every doc) are 1-row on the df side, so AQE's
    skew-join split handles them. ``n_docs`` defaults to a count()
    pass — pass it in when the caller already knows corpus size."""
    if n_docs is None:
        n_docs = df.count()
    toks = df.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("token")
    ).where(F.length("token") >= min_len)
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("dfreq"))
    idf_bits = F.length(
        F.bin(F.expr(f"CAST({int(n_docs)} AS BIGINT) div dfreq"))
    ).cast("long")
    scored = tf.join(dfreq, "token").select(
        F.col(id_col),
        "token",
        "tf",
        idf_bits.alias("idf_bits"),
        (F.col("tf") * idf_bits).alias("score"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return scored.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= k
    )


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass per-doc profile with every signal above."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count_col(t).alias("n_tokens"),
        subword_estimate_col(t).alias("n_subword_est"),
        langid_col(t).alias("lang_pred"),
        quality_score_col(t).alias("quality"),
        doc_fingerprint_col(t).alias("fingerprint"),
    )


# --------------------------------------------------------------------------
# Unicode text canonicalization for training corpora — the pre-tokenizer
# cleanup stage (NFC normalize, strip control chars, collapse runs of
# whitespace). Arrow-NATIVE (Spark 4.1 arrow_udf): utf8_normalize and
# the RE2 replaces run in Arrow C++ with zero pandas/Python-object
# materialization (the same boundary win measured for canonicalization,
# BENCH.md round 2).
# --------------------------------------------------------------------------

try:
    from pyspark.sql.functions import arrow_udf as _arrow_udf
except ImportError:  # pragma: no cover - env pins pyspark 4.1.2
    _arrow_udf = None


# Combining-mark blocks (canonical composition targets). pyarrow 16's
# utf8_normalize(form='NFC') decomposes and reorders but does NOT
# canonically COMPOSE (verified: 'e'+U+0301 stays two codepoints), so
# rows still carrying combining marks after the Arrow pass take a
# bounded Python unicodedata.normalize('NFC') residue — same
# subset-take/scatter pattern as canon's scalar walk.
_COMBINING_RE = (
    r"[\x{0300}-\x{036F}\x{1AB0}-\x{1AFF}\x{1DC0}-\x{1DFF}"
    r"\x{20D0}-\x{20FF}\x{FE20}-\x{FE2F}]"
)


def _clean_text_arrow(arr):
    import unicodedata

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    x = pc.utf8_normalize(pc.fill_null(arr, ""), form="NFC")
    comb = pc.fill_null(pc.match_substring_regex(x, _COMBINING_RE), False).to_numpy(
        zero_copy_only=False
    )
    if comb.any():
        idx = np.flatnonzero(comb)
        sub = pc.take(x, pa.array(idx)).to_pylist()
        fixed = np.full(len(x), None, dtype=object)
        for j, i in enumerate(idx):
            fixed[i] = unicodedata.normalize("NFC", sub[j])
        x = pc.if_else(pa.array(comb), pa.array(fixed, type=pa.string()), x)
    x = pc.replace_substring_regex(x, r"[\x00-\x08\x0b-\x1f\x7f]", "")
    x = pc.replace_substring_regex(x, r"\s+", " ")
    x = pc.utf8_trim_whitespace(x)
    return pc.if_else(pc.is_null(arr), pa.scalar(None, pa.string()), x)


if _arrow_udf is not None:
    from pyspark.sql import types as _T

    # explicit StructType/StringType, NOT a DDL string: DDL return types
    # parse at import time and require an active SparkSession (CLAUDE.md)
    @_arrow_udf(_T.StringType())
    def clean_text_udf(text):
        """NFC + control-strip + whitespace-collapse, Arrow-native."""
        return _clean_text_arrow(text)

else:  # pragma: no cover
    clean_text_udf = None


def clean_text(df: DataFrame, text_col: str = "text", out_col: str = "text_clean") -> DataFrame:
    """Append the canonicalized text column (see _clean_text_arrow)."""
    return df.withColumn(out_col, clean_text_udf(F.col(text_col)))


# ---------------------------------------------------------------------------
# PII scrubbing — a training-data pipeline MUST redact obvious
# identifiers before text ships to a tokenizer. Pure JVM regexp
# (whole-stage codegen, shuffle-free, scan-parallel); patterns restricted
# to the Java-regex ∩ RE2 dialect (no lookaround, no backrefs, ASCII
# \d/\b) so the DuckDB oracle applies the IDENTICAL expressions.
# Replacement order is load-bearing and fixed: email → ipv4 → phone
# (an email's host part would otherwise feed the phone digit-run rule).
# ---------------------------------------------------------------------------

PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # international-format phone: leading + then 7-18 digits/sep chars
    # ending in a digit — deliberately conservative (a bare digit run is
    # a year, an id, a price; redacting those destroys training signal)
    ("phone", r"\+\d[\d ().\-]{5,16}\d", "<PHONE>"),
]


def pii_counts_cols(text: Column) -> list[Column]:
    """One ``n_<kind>`` count column per PII pattern, counted on the
    PRE-redaction text (counts must not depend on replacement order)."""
    t = F.coalesce(text, F.lit(""))
    return [
        F.regexp_count(t, F.lit(pat)).alias(f"n_{kind}")
        for kind, pat, _ in PII_PATTERNS
    ]


def pii_scrub_col(text: Column) -> Column:
    """Text with every PII match replaced by its typed placeholder."""
    out = F.coalesce(text, F.lit(""))
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``text_scrubbed`` + per-kind match counts."""
    return df.withColumn("text_scrubbed", pii_scrub_col(F.col(text_col))).select(
        "*", *pii_counts_cols(F.col(text_col))
    )


# ---------------------------------------------------------------------------
# n-gram LM quality scoring (CCNet-style perplexity filter, float-free)
# ---------------------------------------------------------------------------


def lm_bits_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Bigram-LM surprisal score per doc — the CCNet-style "perplexity
    bucket" filter, trained on the corpus itself (deterministic, no
    external model) and kept float-free so a DuckDB oracle matches
    bit-for-bit.

    Model: cost of a bigram (w1, w2) is the integer log2 ratio
    bitlen(count(w1 as prefix)) − bitlen(count(w1 w2)), with
    bitlen(x) = length(bin(x)) — the cross-engine integer log2 (both
    engines strip leading zeros). Lower mean cost = more predictable
    (template-like) text; the top/bottom buckets are the usual
    keep/drop candidates.

    Returns (id, n_bigrams, total_bits, mean_bits_ppm) where
    mean_bits_ppm = total_bits·10^6 div n_bigrams.

    Scale shape: bigram posexplode → two HashAggregates (prefix + bigram
    counts, map-side combinable) → two equi-joins of doc-bigram
    instances against those count dims → one groupBy(doc). No window,
    no UDF, no collect; the count dims shuffle-join by key (vocabulary-
    sized, not corpus-sized).
    """
    toks = tokens_col(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("_ts")).where(F.size("_ts") >= 2)
    bigram_strs = F.expr(
        "transform(sequence(0, size(_ts) - 2),"
        " i -> array_join(slice(_ts, i + 1, 2), ' '))"
    )
    inst = base.select(
        id_col, F.posexplode(bigram_strs).alias("pos", "bigram")
    ).select(
        id_col,
        "bigram",
        F.substring_index("bigram", " ", 1).alias("w1"),
    )
    uc = inst.groupBy("w1").agg(F.count("*").alias("uc"))
    bc = inst.groupBy("bigram").agg(F.count("*").alias("bc"))
    bitlen = lambda c: F.length(F.bin(c))  # noqa: E731
    scored = (
        inst.join(bc, "bigram")
        .join(uc, "w1")
        .select(id_col, (bitlen(F.col("uc")) - bitlen(F.col("bc"))).alias("bits"))
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("bits").cast("long").alias("total_bits"),
        F.expr("(sum(bits) * 1000000L) div count(*)").alias("mean_bits_ppm"),
    )


def host_language_profile(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-host PREDICTED-language profile for crawl steering: run the
    marker-based language id (:func:`langid_col`) over each document,
    then reduce to one row per host — total docs, the dominant
    predicted language (most docs; ties break to the lexicographically
    smallest lang, matching langid's own determinism), its doc count,
    and its exact ppm share (BIGINT ``div``, engine-identical).

    A frontier scheduler uses this to steer: hosts whose dominant
    predicted language is outside the target set (or whose share is
    too mixed) get demoted before fetch budget is spent on them.

    Scale shape: one HashAggregate docs→(host, lang), one to the host
    dim (sum + max), then a host-dim join + min(lang) HashAggregate to
    resolve the argmax without a window or struct-max (struct-min/max
    demotes to SortAggregate — CLAUDE.md). Everything after the first
    aggregate is host-dim sized; AQE broadcasts the join.
    """
    per = (
        df.select(
            F.col(host_col).alias("host"),
            langid_col(F.col(text_col)).alias("lang"),
        )
        .groupBy("host", "lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    tot = per.groupBy("host").agg(
        F.sum("n_docs").alias("host_docs"),
        F.max("n_docs").alias("dominant_docs"),
    )
    return (
        per.join(tot, "host")
        .where(F.col("n_docs") == F.col("dominant_docs"))
        .groupBy("host", "host_docs", "dominant_docs")
        .agg(F.min("lang").alias("dominant_lang"))
        .select(
            "host",
            "host_docs",
            "dominant_lang",
            "dominant_docs",
            F.expr(
                "(dominant_docs * CAST(1000000 AS BIGINT)) div host_docs"
            ).alias("dominant_share_ppm"),
        )
    )


def pmi_collocations(
    df: DataFrame,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus collocation mining by pointwise mutual information in
    integer log2 bits — the lexicon-induction companion of
    :func:`lm_bits_score` (same bigram instances, opposite direction:
    per-PAIR association instead of per-doc surprisal).

    PMI = log2(P(w1,w2) / (P(w1)·P(w2))) = log2(c12·N / (c1·c2)),
    computed FACTORIZED in bit lengths —
    pmi_bits = bitlen(c12) + bitlen(N) − bitlen(c1) − bitlen(c2),
    bitlen = length(bin(x)) — because the direct product c12·N
    overflows BIGINT at web scale (counts ~10^12 → product ~10^24);
    the factorized form is ±1-bit-accurate per factor, deterministic,
    and engine-identical. c1/c2 are directional (w1 as bigram prefix,
    w2 as suffix). Pairs below ``min_count`` joint occurrences drop
    (PMI is noise on rare pairs).

    Returns (w1, w2, c12, c1, c2, pmi_bits). Scale shape: bigram
    posexplode → three vocabulary-dim HashAggregates (pair/prefix/
    suffix counts) → equi-joins on the pair dim + one broadcast
    single-row N. No window, no UDF, no collect.
    """
    toks = tokens_col(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("_ts")).where(F.size("_ts") >= 2)
    bigram_strs = F.expr(
        "transform(sequence(0, size(_ts) - 2),"
        " i -> array_join(slice(_ts, i + 1, 2), ' '))"
    )
    inst = base.select(F.posexplode(bigram_strs).alias("pos", "bigram")).select(
        F.substring_index("bigram", " ", 1).alias("w1"),
        F.substring_index("bigram", " ", -1).alias("w2"),
    )
    c12 = inst.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c12"))
    c1 = inst.groupBy("w1").agg(F.count("*").cast("long").alias("c1"))
    c2 = inst.groupBy("w2").agg(F.count("*").cast("long").alias("c2"))
    n = inst.agg(F.count("*").cast("long").alias("n_total"))
    bitlen = lambda c: F.length(F.bin(c)).cast("long")  # noqa: E731
    return (
        c12.where(F.col("c12") >= int(min_count))
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            "c2",
            (
                bitlen(F.col("c12"))
                + bitlen(F.col("n_total"))
                - bitlen(F.col("c1"))
                - bitlen(F.col("c2"))
            ).alias("pmi_bits"),
        )
    )


_NAMED_ENTITIES = [  # the XML/HTML core set; longest names first
    ("quot;", '"'),
    ("apos;", "'"),
    ("amp;", "&"),
    ("lt;", "<"),
    ("gt;", ">"),
]


def html_unescape_col(text: Column) -> Column:
    """Single-pass HTML entity decoding for extracted text — the core
    named set (&amp; &lt; &gt; &quot; &apos;) plus numeric character
    references up to ASCII 127 (decimal ``&#39;`` and hex ``&#x27;``
    forms; higher code points pass through untouched — Spark's
    ``char()`` is mod-256/byte-level, not Unicode-safe, so decoding
    beyond ASCII would corrupt UTF-8). Single-pass means ``&amp;lt;``
    decodes to the literal ``&lt;`` and STOPS — the split-on-&
    structure makes double-decoding impossible by construction (same
    discipline as functions/canon.percent_normalize_col).
    """
    parts = F.split(F.coalesce(text, F.lit("")), "&", -1)
    tail = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))

    def _fix(p: Column) -> Column:
        dec = F.regexp_extract(p, r"^#([0-9]{1,3});", 1)
        hexe = F.regexp_extract(p, r"^#[xX]([0-9A-Fa-f]{1,2});", 1)
        dec_ok = (dec != "") & (dec.cast("int") <= 127)
        hex_ok = (hexe != "") & (F.conv(hexe, 16, 10).cast("int") <= 127)
        result = F.concat(F.lit("&"), p)  # fallback: not an entity
        result = F.when(
            dec_ok,
            F.concat(F.char(dec.cast("int")), p.substr(F.length(dec) + F.lit(3), F.lit(1_000_000))),
        ).otherwise(result)
        result = F.when(
            hex_ok,
            F.concat(
                F.char(F.conv(hexe, 16, 10).cast("int")),
                p.substr(F.length(hexe) + F.lit(4), F.lit(1_000_000)),
            ),
        ).otherwise(result)
        for name, ch in _NAMED_ENTITIES:
            result = F.when(
                p.startswith(name),
                F.concat(F.lit(ch), F.substring(p, len(name) + 1, 1_000_000)),
            ).otherwise(result)
        return result

    return F.concat(
        F.element_at(parts, 1), F.array_join(F.transform(tail, _fix), "")
    )


def c4_line_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """C4-style line-level cleaning audit (Raffel et al. 2020, §2.2 of
    the T5 paper — the public recipe behind the C4 corpus).

    Per document, over its non-empty trimmed lines:

    - ``n_lines``  — non-empty lines;
    - ``n_kept``   — lines that end in terminal punctuation (``.!?"``)
      AND contain ≥5 words AND do not mention ``javascript``
      (case-insensitive) — exactly C4's retained-line rule;
    - ``kept_ppm`` — exact integer retention share;
    - ``has_lorem`` / ``has_curly`` — document-level kill signals
      (any ``lorem ipsum``, any ``{``);
    - ``keep_doc`` — C4's page rule: ≥3 retained lines and neither
      kill signal.

    100 TB shape: split → posexplode → one map-side-combinable
    HashAggregate per doc (the explode→HashAggregate form CLAUDE.md
    measured 30-40× faster than nested HOFs at sf0.1); no window, no
    UDF — every predicate is codegen'd JVM string ops.
    """
    lines = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), "\n", -1)).alias("_raw"),
    ).select(
        id_col, F.trim(F.col("_raw")).alias("line")
    ).where(F.col("line") != "")
    flags = lines.select(
        id_col,
        "line",
        (
            F.col("line").rlike(r'[.!?"]$')
            & (F.size(F.split(F.col("line"), r" +", -1)) >= 5)
            & ~F.lower(F.col("line")).contains("javascript")
        ).cast("long").alias("_kept"),
        F.lower(F.col("line")).contains("lorem ipsum").cast("long").alias("_lorem"),
        F.col("line").contains("{").cast("long").alias("_curly"),
    )
    return flags.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum("_kept").cast("long").alias("n_kept"),
        F.expr("sum(_kept) * 1000000L div count(*)").alias("kept_ppm"),
        (F.sum("_lorem") > 0).alias("has_lorem"),
        (F.sum("_curly") > 0).alias("has_curly"),
        (
            (F.sum("_kept") >= 3) & (F.sum("_lorem") == 0) & (F.sum("_curly") == 0)
        ).alias("keep_doc"),
    )


def blocklist_filter(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style blocklist page filter: drop-flag any doc containing a
    blocklisted WORD — word-boundary exact, case-insensitive (C4 §2.2's
    "bad words" rule removes the page on any list hit; substring
    matching would be the classic Scunthorpe false positive, so the
    match unit is the alphanumeric token, not the substring).

    Output per doc: ``blocked`` (1/0), ``n_blocked_terms`` (distinct
    list terms present) and ``blocked_terms`` (the sorted hit list,
    space-joined) — the audit columns a filtering report needs.

    Scale shape: the blocklist is a LITERAL array in the expression
    (hundreds of terms — broadcast-by-construction, no dim join);
    tokenize + intersect are per-row bounded JVM array ops inside
    whole-stage codegen. Zero shuffle, zero Python; the filter
    composes with the scan's predicate pushdown.
    """
    toks = F.array_distinct(
        F.filter(
            F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), "[^a-z0-9]+"),
            lambda t: t != "",
        )
    )
    hits = F.array_sort(
        F.array_intersect(toks, F.array(*[F.lit(t.lower()) for t in terms]))
    )
    return df.select(
        id_col,
        (F.size(hits) > 0).cast("int").alias("blocked"),
        F.size(hits).cast("int").alias("n_blocked_terms"),
        F.array_join(hits, " ").alias("blocked_terms"),
    )


def _bpe_apply_fold(l: str, r: str) -> str:
    """The greedy left-to-right non-overlapping merge of (l, r) over a
    U+001F-joined token string, as one SQL fold expression."""
    sep = "char(31)"

    # Spark SQL string literals treat backslash as an escape even
    # outside ANSI string mode — escape it before the quote pass
    # (tokens come from corpus text, so assume nothing)
    def _q(s: str) -> str:
        return s.replace("\\", "\\\\").replace("'", "''")

    ql, qr = _q(l), _q(r)
    return (
        f"aggregate(slice(split(tokstr, {sep}), 2,"
        f" size(split(tokstr, {sep})) - 1),"
        f" split(tokstr, {sep})[0],"
        f" (acc, x) -> CASE WHEN x = '{qr}' AND (acc = '{ql}'"
        f" OR endswith(acc, concat({sep}, '{ql}')))"
        f" THEN concat(acc, x)"
        f" ELSE concat(acc, {sep}, x) END)"
    )


def _bpe_train_local(
    words: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Exact greedy BPE over a driver-held (word, freq) vocab — the
    same semantics as the distributed per-round loop: pair counts
    weighted by word frequency, argmax by (count desc, left asc,
    right asc) in code-point order (≡ Spark/DuckDB UTF-8 binary
    collation — UTF-8 byte order preserves code-point order), merges
    applied greedily left-to-right non-overlapping (a fused token
    never re-merges within its round — 'aaa' + (a,a) → ['aa','a'])."""
    vocab: list[tuple[list[str], int]] = [(list(w), n) for w, n in words]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, int(c)))
        for idx, (syms, n) in enumerate(vocab):
            out = [syms[0]]
            for x in syms[1:]:
                if x == r and out[-1] == l:
                    out[-1] = out[-1] + x
                else:
                    out.append(x)
            vocab[idx] = (out, n)
    return merges


def _bpe_train(
    df: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
    min_word_len: int = 2,
    driver_vocab_limit: int = 2_000_000,
):
    """Shared trainer core: returns (merges list, final re-tokenized
    word-frequency frame, the persisted base handle — caller releases).
    See bpe_train_merges for the full algorithm notes.

    Merge SELECTION runs driver-side on the collected (word, freq)
    vocab whenever it fits under ``driver_vocab_limit`` rows: the
    vocab dim is corpus-DISTINCT words (10^5-10^7 even at 100 TB of
    text), and one collect + an in-memory greedy replaces one Spark
    job per merge round — at a real 32k-merge budget, 2 jobs instead
    of 32k driver round-trips (the r3 'BPE serialization wall'). The
    distributed per-round argmax below is the honest fallback for a
    vocab that genuinely cannot land on a driver. Both paths implement
    the identical greedy rule, so the merge table (and the oracle
    hash) is path-independent."""
    sep = "char(31)"
    toks = df.select(F.explode(tokens_col(F.col(text_col))).alias("word"))
    wf = (
        toks.where(F.length("word") >= max(2, min_word_len))
        .where(F.expr("NOT contains(word, char(31))"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "tokstr",
            F.expr(
                f"array_join(transform(sequence(1, length(word)),"
                f" i -> substring(word, i, 1)), {sep})"
            ),
        )
        .persist()
    )
    wf0 = wf
    n_vocab = wf.count()  # also materializes the cache
    if n_vocab <= driver_vocab_limit:
        rows = wf.select("word", "n").collect()
        merges = _bpe_train_local(
            [(r["word"], int(r["n"])) for r in rows], n_merges
        )
        # the final re-tokenized frame (bpe_encode_stats consumes it)
        # still applies the learned rules as lazy fold transforms —
        # no per-round driver round-trips
        for rank, l, r, _ in merges:
            wf = wf.select("word", "n", F.expr(_bpe_apply_fold(l, r)).alias("tokstr"))
            if rank % 8 == 0:
                wf = wf.localCheckpoint(eager=False)
        return merges, wf, wf0
    merges = []
    for rank in range(1, n_merges + 1):
        best = (
            wf.select(F.expr(f"split(tokstr, {sep})").alias("t"), "n")
            .where(F.size("t") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(t) - 1),"
                        " j -> struct(element_at(t, j) AS l,"
                        " element_at(t, j + 1) AS r))"
                    )
                ).alias("p"),
                "n",
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("n").alias("c"))
            .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, c = best[0]["l"], best[0]["r"], int(best[0]["c"])
        merges.append((rank, l, r, c))
        wf = wf.select("word", "n", F.expr(_bpe_apply_fold(l, r)).alias("tokstr"))
        if rank % 8 == 0:
            wf = wf.localCheckpoint(eager=False)
    return merges, wf, wf0


def bpe_train_merges(
    df: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
    min_word_len: int = 2,
) -> DataFrame:
    """Full greedy BPE merge TRAINING (Sennrich et al. 2016) — the
    capstone over ``bpe_pair_stats`` (which is one counting round):
    learn the first ``n_merges`` merge rules over the corpus and
    return the merge table ``(merge_rank, left_tok, right_tok,
    pair_count)`` — the artifact a tokenizer build ships.

    Distributed shape (how a Spark BPE trainer is structured): the
    corpus is scanned ONCE into the word-frequency dim (map-side
    combinable HashAggregate; at 100 TB the vocab is ~10^7-10^8 rows —
    tiny next to the token stream), then every merge round runs on
    that cached dim only: adjacent-pair explode → HashAggregate →
    TakeOrdered(1) for the argmax (count desc, then (left, right)
    lexicographic — deterministic cross-engine binary collation), and
    the re-tokenize is a per-row ``aggregate`` fold — zero shuffle.
    The driver holds one 1-row result per round (centroid-sized, the
    IVF-training pattern).

    Token state is the word's symbols joined by the U+001F unit
    separator (words containing it are excluded, mirrored in the
    oracle); greedy left-to-right application falls out of the fold:
    merging appends the right symbol with NO separator, so the fused
    token can't re-merge with the next element within the same round
    (verified: 'aaa' + (a,a) → ['aa','a']). Lineage over the vocab dim
    is truncated every 8 rounds (localCheckpoint) so deep merge counts
    don't blow up codegen depth."""
    merges, _, wf0 = _bpe_train(df, n_merges, text_col, min_word_len)
    wf0.unpersist()
    return df.sparkSession.createDataFrame(
        merges,
        "merge_rank int, left_tok string, right_tok string, pair_count long",
    )


def bpe_encode_stats(
    df: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
    min_word_len: int = 2,
) -> DataFrame:
    """Corpus compression under the learned BPE vocabulary: apply the
    ``n_merges`` trained rules (the training fold IS the encoder — the
    final word-frequency state is the encoded corpus) and report one
    row: distinct words, total word instances, corpus symbols before
    (characters) and after (BPE tokens), and the saved share in ppm —
    the number that says whether the merge budget is buying anything
    before a tokenizer build scales out. Instance counts weight by the
    word frequency ``n``; all-integer arithmetic."""
    merges, wf, wf0 = _bpe_train(df, n_merges, text_col, min_word_len)
    out = wf.agg(
        F.count(F.lit(1)).cast("long").alias("n_words_distinct"),
        F.sum("n").cast("long").alias("n_word_instances"),
        F.expr("CAST(sum(n * length(word)) AS BIGINT)").alias("chars_total"),
        F.expr(
            "CAST(sum(n * size(split(tokstr, char(31)))) AS BIGINT)"
        ).alias("tokens_total"),
    ).select(
        "n_words_distinct",
        "n_word_instances",
        "chars_total",
        "tokens_total",
        F.expr(
            "(chars_total - tokens_total) * CAST(1000000 AS BIGINT)"
            " div greatest(chars_total, CAST(1 AS BIGINT))"
        ).alias("saved_ppm"),
    )
    wf0.unpersist()
    return out


def readability_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch-Kincaid grade level in integer fixed-point — the classic
    cheap readability signal for corpus quality stratification (too-low
    grades are menus/listicles, too-high are OCR garbage or legalese).

    Spec (exact, cross-engine):

    - words: whitespace tokens of trimmed text;
    - sentences: ``max(1, count of /[.!?]+/ runs)``;
    - syllables: per word ``max(1, count of /[aeiouy]+/ runs)`` over
      the lowercased token, summed;
    - ``grade_centi = 39·words div sentences
      + 1180·syllables div words − 1559`` — the FK coefficients
      (0.39, 11.8, 15.59) in centi-units with truncating integer
      division (operands non-negative, so Spark ``div`` ≡ DuckDB
      ``//``); can go negative only via the final subtraction,
      identical in both engines.

    Wordless docs emit (0, sentences, 0, 0) with grade 0 — explicit,
    not a division error. Scale shape: explode tokens → one per-doc
    HashAggregate (no higher-order functions in the hot path), joined
    back to the doc-level sentence count; no Python.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.greatest(
            F.lit(1),
            F.size(F.expr(f"regexp_extract_all({text_col}, '[.!?]+', 0)")),
        ).cast("long").alias("n_sentences"),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("_toks"),
    )
    per_word = (
        base.select("doc_id", F.explode("_toks").alias("tok"))
        .where(F.col("tok") != "")
        .select(
            "doc_id",
            F.greatest(
                F.lit(1),
                F.size(F.expr("regexp_extract_all(tok, '[aeiouy]+', 0)")),
            ).cast("long").alias("syl"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("syl").alias("n_syllables"),
        )
    )
    return (
        base.select("doc_id", "n_sentences")
        .join(per_word, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            "n_sentences",
            F.coalesce("n_syllables", F.lit(0)).cast("long").alias("n_syllables"),
            F.when(F.coalesce("n_words", F.lit(0)) == 0, F.lit(0).cast("long"))
            .otherwise(
                F.expr(
                    "39 * n_words div n_sentences"
                    " + 1180 * n_syllables div n_words - 1559"
                ).cast("long")
            )
            .alias("grade_centi"),
        )
    )


#: floor(log10(1 + 1/d) * 1e6) for d = 1..9 — Benford's law in exact
#: ppm literals (floored once here, NOT recomputed with floats at run
#: time, so Spark and the DuckDB oracle share identical constants).
BENFORD_PPM = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
    6: 66946, 7: 57991, 8: 51152, 9: 45757,
}


def benford_deviation(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """First-significant-digit deviation from Benford's law per group —
    a cheap anomaly signal for machine-generated or templated numeric
    content (organically sourced numbers follow Benford closely;
    uniform or fabricated generators don't).

    Spec (exact, cross-engine): numbers are maximal ``[0-9]+`` runs;
    the significant digit is the first digit after stripping leading
    zeros (all-zero runs are skipped). Per group, ``tvd_ppm =
    Σ_d |observed_ppm(d) − BENFORD_PPM[d]|`` with ``observed_ppm(d) =
    cnt_d·10^6 div n_numbers`` (non-negative truncating division —
    Spark ``div`` ≡ DuckDB ``//``); digits a group never uses
    contribute their full Benford mass. Groups with no numbers are
    omitted (their deviation is undefined, not zero).

    Scale shape: regexp extraction + explode → one (group, digit)
    HashAggregate → join against the 9·|groups| digit grid (tiny,
    broadcast) → one per-group HashAggregate. No Python."""
    digits = df.select(
        F.col(group_col).alias("grp"),
        F.explode(
            F.expr(f"regexp_extract_all({text_col}, '[0-9]+', 0)")
        ).alias("num"),
    ).select(
        "grp",
        F.substring(F.regexp_replace("num", "^0+", ""), 1, 1).alias("d"),
    ).where(F.col("d") != "")
    counts = digits.groupBy("grp", "d").agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.groupBy("grp").agg(F.sum("cnt").alias("n_numbers"))
    grid = totals.crossJoin(
        F.broadcast(
            df.sparkSession.createDataFrame(
                [(str(d), p) for d, p in BENFORD_PPM.items()],
                "d string, benford_ppm long",
            )
        )
    )
    return (
        grid.join(counts, ["grp", "d"], "left")
        .select(
            "grp",
            "n_numbers",
            F.abs(
                F.expr("coalesce(cnt, 0) * 1000000 div n_numbers")
                - F.col("benford_ppm")
            ).alias("_dev"),
        )
        .groupBy("grp")
        .agg(
            F.max("n_numbers").cast("long").alias("n_numbers"),
            F.sum("_dev").cast("long").alias("tvd_ppm"),
        )
        .withColumnRenamed("grp", group_col)
    )


def group_vocab_jaccard(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    min_len: int = 1,
) -> DataFrame:
    """Pairwise vocabulary Jaccard between GROUPS (sources, languages,
    shards): |vocab(A) ∩ vocab(B)| / |vocab(A) ∪ vocab(B)| in exact ppm
    — the corpus-mixing audit ("are these two feeds the same site?",
    "does shard 7 speak the same language as shard 8?").

    Shape: distinct (group, token) HashAggregate → inverted-index
    self-join on the token (each token fans out only into the groups
    that contain it — pair fan-out bounded by #groups², never corpus²)
    → pair-count HashAggregate → broadcast size dims. Output is SPARSE:
    pairs with zero shared tokens are absent (Jaccard 0). Meant for a
    DIM-sized group axis (sources, langs); for host-scale pairwise
    similarity use the MinHash-LSH pipeline instead.
    """
    toks = (
        df.select(
            F.col(group_col).alias("g"),
            F.explode(tokens_col(F.col(text_col))).alias("token"),
        )
        .where(F.length("token") >= min_len)
        .distinct()
    )
    sizes = toks.groupBy("g").agg(F.count(F.lit(1)).alias("n_types"))
    a = toks.select(F.col("g").alias("ga"), "token")
    b = toks.select(F.col("g").alias("gb"), "token")
    inter = (
        a.join(b, "token")
        .where(F.col("ga") < F.col("gb"))
        .groupBy("ga", "gb")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("g").alias("ga"), F.col("n_types").alias("n_types_a"))),
            "ga",
        )
        .join(
            F.broadcast(sizes.select(F.col("g").alias("gb"), F.col("n_types").alias("n_types_b"))),
            "gb",
        )
        .select(
            F.col("ga").alias(f"{group_col}_a"),
            F.col("gb").alias(f"{group_col}_b"),
            "n_types_a",
            "n_types_b",
            F.col("n_common").cast("long").alias("n_common"),
            F.expr(
                "n_common * 1000000 div (n_types_a + n_types_b - n_common)"
            ).alias("jaccard_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# PAN (card-number) detection with Luhn validation — the precision
# layer the bare digit-run regex lacks: most 13-19 digit runs in web
# text are ids/timestamps/serials, and only ~10% of random runs pass
# the Luhn mod-10 checksum, so validating before redaction keeps
# training signal the blanket rule would destroy. Pure integer
# arithmetic (digit explode -> HashAggregate), identical in DuckDB.
# ---------------------------------------------------------------------------

# 13-19 digits with optional single space/dash separators; Java ∩ RE2
# dialect (no lookaround) so the oracle regex is the same string.
PAN_CANDIDATE_RE = r"\b(?:\d[ -]?){12,18}\d\b"


def luhn_pan_audit(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per document: how many card-number-shaped digit runs appear,
    and how many survive the Luhn mod-10 checksum (the redaction set).

    Luhn: reverse the digit string, double every even position folding
    >9 back (2d-9), valid iff the sum is 0 mod 10. Computed by
    exploding digit positions into ONE HashAggregate per candidate —
    no Python, no HOF (interpreted, per CLAUDE.md), no window; the
    explode fan-out is bounded at 19 per candidate.
    """
    cands = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.regexp_extract_all(
                F.coalesce(F.col(text_col), F.lit("")),
                F.lit(PAN_CANDIDATE_RE),
                F.lit(0),
            )
        ).alias("_ci", "_cand"),
    ).withColumn("_rev", F.reverse(F.regexp_replace("_cand", "[ -]", "")))
    cands = cands.where(F.length("_rev").between(13, 19))
    # Luhn positions are 1-based from the right (the check digit is
    # position 1, never doubled); substring-by-position rather than an
    # empty-pattern split (engine-divergent trailing-empty behavior)
    digits = cands.select(
        "_id",
        "_ci",
        "_rev",
        F.explode(F.sequence(F.lit(1), F.length("_rev"))).alias("_i"),
    ).select(
        "_id",
        "_ci",
        "_i",
        F.expr("CAST(substring(_rev, _i, 1) AS INT)").alias("_dig"),
    )
    summed = (
        digits.withColumn(
            "_c",
            F.when(
                F.col("_i") % 2 == 0,
                F.when(F.col("_dig") * 2 > 9, F.col("_dig") * 2 - 9).otherwise(
                    F.col("_dig") * 2
                ),
            ).otherwise(F.col("_dig")),
        )
        .groupBy("_id", "_ci")
        .agg(F.sum("_c").alias("_s"))
        .withColumn("_valid", (F.col("_s") % 10 == 0).cast("long"))
    )
    return (
        summed.groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pan_candidates"),
            F.sum("_valid").cast("long").alias("n_pan_valid"),
        )
        .select(F.col("_id").alias(id_col), "n_pan_candidates", "n_pan_valid")
    )
