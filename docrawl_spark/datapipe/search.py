"""Corpus keyword search: integer-exact BM25 over the documents table.

A training-data pipeline mines its corpus by relevance ("pull the docs
about X for the eval set"); the crawl engine itself ranks fetch
candidates by topic match. Both want BM25, and at 100 TB the plan has
to be: explode tokens → filter to the query vocabulary FIRST (the
filter kills ~all rows before any shuffle) → two HashAggregates (tf
per (doc, term); df per term) → broadcast the term-sized idf dim back
→ one final HashAggregate per doc → TakeOrdered top-k. No window over
the corpus, no UDF, nothing driver-side.

Scoring is classic BM25 (k1 = 1.2, b = 0.75) in fixed-point integer
arithmetic so DuckDB reproduces every score bit-for-bit (the repo's
oracle rule — CLAUDE.md "integer scores"):

- avgdl_x1000   = (Σ dl · 1000) div N
- norm_ppt      = 1000 - b_ppt + (b_ppt · dl · 1000) div avgdl_x1000
- tf_ppm        = (tf · (k1_ppt + 1000) · 10^6)
                    div (tf · 10^6 + k1_ppt · norm_ppt)
- idf_units     = length(bin((N · 1000) div df))   # integer log2
- score_units   = Σ_terms tf_ppm · idf_units

The idf is the bit-length integer log2 of 1000·N/df — monotone in
rarity, float-free, identical in both engines (`bin` strips leading
zeros in Spark and DuckDB alike).

No reference counterpart (the reference has no search); this is
LLM-datapipe surface per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from docrawl_spark.datapipe.text import tokens_col

K1_PPT = 1200  # k1 = 1.2
B_PPT = 750    # b = 0.75


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
) -> DataFrame:
    """Top-k docs by integer BM25 against a fixed query-term set.

    Returns (doc_id, score_units, n_hit_terms) ordered by score desc
    with the deterministic id tie-break.
    """
    terms = [t.lower() for t in query_terms]
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(F.col(text_col))).alias("term"),
    )
    # corpus stats: one tiny row (N, avgdl fixed-point) — broadcast
    # back via crossJoin, never collected
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr(
            f"(CAST(sum(size(split(trim(lower({text_col})), '\\\\s+'))) AS BIGINT)"
            f" * 1000) div count(1)"
        ).alias("avgdl_x1000"),
    )
    dl = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col(F.col(text_col))).cast("long").alias("dl"),
    )
    hits = toks.where(F.col("term").isin(terms))
    tf = hits.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    # df per term: term-cardinality-sized (≤ len(query_terms) rows)
    df_dim = (
        hits.select("doc_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    scored = (
        tf.join(F.broadcast(df_dim), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "norm_ppt",
            F.expr(
                f"1000 - {B_PPT} + ({B_PPT} * dl * 1000) div avgdl_x1000"
            ),
        )
        .withColumn(
            "tf_ppm",
            F.expr(
                f"(tf * {K1_PPT + 1000} * 1000000)"
                f" div (tf * 1000000 + {K1_PPT} * norm_ppt)"
            ),
        )
        .withColumn(
            "idf_units",
            F.expr(
                "CAST(length(bin((n_docs * 1000) div df)) AS BIGINT)"
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum(F.expr("tf_ppm * idf_units")).alias("score_units"),
            F.count(F.lit(1)).alias("n_hit_terms"),
        )
        .orderBy(F.col("score_units").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def with_rank(df: DataFrame, order_cols: list, id_col: str = "doc_id") -> DataFrame:
    """1-based rank over a TOP-K frame (k rows — the single-partition
    window is sketch-scale, never data-scale)."""
    from pyspark.sql import Window

    w = Window.orderBy(*order_cols)
    return df.select(id_col, F.row_number().over(w).alias("rank"))


def rrf_fuse(
    ranked_lists: list[DataFrame],
    id_col: str = "doc_id",
    k_const: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of ranked candidate lists (the hybrid
    lexical+vector retrieval shape): rrf_units = Σ 10^6 div
    (k_const + rank), integer-exact so DuckDB reproduces every score.
    Inputs are (id, rank) frames from with_rank; missing membership
    simply contributes nothing. All inputs are top-k sized, so the
    union + HashAggregate is driver-scale."""
    parts = [
        df.select(
            F.col(id_col),
            F.expr(f"CAST(1000000 div ({k_const} + rank) AS BIGINT)").alias(
                "part"
            ),
        )
        for df in ranked_lists
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy(id_col)
        .agg(
            F.sum("part").alias("rrf_units"),
            F.count(F.lit(1)).alias("n_lists"),
        )
        .orderBy(F.col("rrf_units").desc(), F.col(id_col).asc())
        .limit(topk)
    )


def phrase_search(
    df: DataFrame,
    phrase: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-phrase match over positional postings: docs containing the
    query tokens CONSECUTIVELY, with per-doc occurrence counts and the
    first match position. Returns (id, n_occurrences, first_pos).

    Plan shape (the inverted-index access path, 100 TB-ready):
    posexplode tokens → semi-filter to the query vocabulary via a
    broadcast (qidx, token) dim — this kills ~all postings before any
    shuffle — then one HashAggregate over (doc, anchor = pos − qidx):
    an anchor holding all |phrase| distinct qidx values is one exact
    occurrence starting at that anchor. No self-join, no window over
    the corpus, no UDF.

    Duplicate query tokens are supported: a (doc, pos) posting matching
    several qidx values lands in several anchor groups, and the
    count(DISTINCT qidx) = |phrase| test still only fires when every
    slot is witnessed (slot i witnessed ⇒ token at anchor+i equals
    phrase[i], since pos = anchor + qidx identifies the token).
    """
    q_tokens = phrase.strip().lower().split()
    m = len(q_tokens)
    if m == 0:
        raise ValueError("empty phrase")
    spark = df.sparkSession
    qdim = spark.createDataFrame(
        [(i, t) for i, t in enumerate(q_tokens)], "qidx int, token string"
    )
    postings = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias(
            "pos", "token"
        ),
    )
    hits = postings.join(F.broadcast(qdim), "token").select(
        id_col, (F.col("pos") - F.col("qidx")).alias("anchor"), "qidx"
    )
    occ = (
        hits.groupBy(id_col, "anchor")
        .agg(F.countDistinct("qidx").alias("n_slots"))
        .where((F.col("n_slots") == m) & (F.col("anchor") >= 0))
    )
    return occ.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_occurrences"),
        F.min("anchor").cast("long").alias("first_pos"),
    )


def postings_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """Sort-based inverted-index construction stats: per token, the
    document frequency and the EXACT delta-gap varint cost of its
    posting list — the storage planner for the BM25/phrase indexes
    above (is the index shard budget right? which terms dominate?).

    Encoding model: ids are 1-based; the first posting is stored
    absolute, the rest as gaps; a value costs ``ceil(bitlen/7)``
    varint bytes, with bitlen via the cross-engine ``length(bin(x))``
    basis (CLAUDE.md — identical in Spark and DuckDB).

    Output per token (df >= min_df): ``df, first_doc, last_doc,
    sum_gap_bytes, max_gap``.

    Plan: explode → distinct (token, doc) postings → per-token window
    in doc-id order (THE sequential pass every indexer makes; at
    100 TB you shard the doc-id space first so each shard's per-token
    run is bounded, then concatenate shard lists — gap streams
    compose across doc-id-range shards) → one HashAggregate back to
    the vocab grain.
    """
    from pyspark.sql import Window

    p = (
        docs.select(
            F.col(id_col).alias("doc"),
            F.explode(tokens_col(F.col(text_col))).alias("token"),
        )
        .where(F.col("token") != "")
        .distinct()
    )
    w = Window.partitionBy("token").orderBy("doc")
    g = p.withColumn(
        "_gap",
        (F.col("doc") + 1) - F.coalesce(F.lag("doc").over(w) + 1, F.lit(0)),
    ).withColumn("_gb", F.expr("(length(bin(_gap)) + 6) div 7"))
    out = g.groupBy("token").agg(
        F.count("*").cast("long").alias("df"),
        F.min("doc").cast("long").alias("first_doc"),
        F.max("doc").cast("long").alias("last_doc"),
        F.sum("_gb").cast("long").alias("sum_gap_bytes"),
        F.max("_gap").cast("long").alias("max_gap"),
    )
    if min_df > 1:
        out = out.where(F.col("df") >= min_df)
    return out


def term_upper_bounds(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MaxScore/WAND index-time term upper bounds: per corpus term, the
    EXACT maximum BM25 contribution any single posting achieves
    (``ub_units = max over docs of tf_ppm · idf_units``, same integer
    fixed-point algebra as :func:`bm25_topk`), plus df and max tf.

    Query-time top-k pruning (Turtle & Flood MaxScore, Broder WAND)
    skips every posting list whose bound can't lift a candidate into
    the current top-k — the bound must dominate every achievable
    contribution, which the max over ACTUAL postings does by
    construction (tf_ppm is monotone in tf, and the posting set is the
    achievable set).

    Scale shape: explode → (doc,term) tf HashAggregate → join the
    vocab-dim df (term-keyed shuffle, NOT broadcast — the vocab is
    unbounded) + doc-dim dl + the one-row corpus stats (broadcast) →
    one vocab-grain HashAggregate. No window, no UDF.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(F.col(text_col))).alias("term"),
    ).where(F.col("term") != "")
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr(
            f"(CAST(sum(size(split(trim(lower({text_col})), '\\\\s+'))) AS BIGINT)"
            f" * 1000) div count(1)"
        ).alias("avgdl_x1000"),
    )
    dl = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col(F.col(text_col))).cast("long").alias("dl"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_dim = (
        toks.select("doc_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    scored = (
        tf.join(df_dim, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "norm_ppt",
            F.expr(f"1000 - {B_PPT} + ({B_PPT} * dl * 1000) div avgdl_x1000"),
        )
        .withColumn(
            "tf_ppm",
            F.expr(
                f"(tf * {K1_PPT + 1000} * 1000000)"
                f" div (tf * 1000000 + {K1_PPT} * norm_ppt)"
            ),
        )
        .withColumn(
            "idf_units",
            F.expr("CAST(length(bin((n_docs * 1000) div df)) AS BIGINT)"),
        )
    )
    return scored.groupBy("term").agg(
        F.max("df").cast("long").alias("df"),
        F.max("tf").cast("long").alias("max_tf"),
        F.max(F.expr("tf_ppm * idf_units")).cast("long").alias("ub_units"),
    )


def retrieval_ndcg(
    ranked: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Integer-exact NDCG@k for the retrieval stack (BM25 / hybrid /
    ANN): per query, ``dcg_units = Σ (2^rel − 1)·10^6 div
    bitlen(rank+1)`` over the top-k ranked rows, ``idcg_units`` the
    same formula over the query's qrels in ideal (rel desc) order,
    and ``ndcg_ppm = dcg·10^6 div idcg``.

    Deliberate deviation from textbook NDCG, stated: the discount is
    the integer bit length of rank+1 (floor(log2)+1) instead of the
    real log2 — weakly monotone in rank (BANDED: ranks 1-2 share a
    discount, then 3-6, 7-14, …; swaps inside a band don't move the
    score), float-free, identical in Spark and DuckDB (the repo's
    shared bin() basis); gains use shiftleft so graded rels stay
    exact. Unjudged ranked docs gain 0 (trec_eval
    convention); queries with no positive qrel are dropped (NDCG
    undefined).

    Scale shape: ranked⋈qrels on (query, doc) — co-keyed equi-join;
    the ideal ordering is a per-query window bounded by that query's
    qrel count; two query-grain HashAggregates.
    """
    from pyspark.sql import Window

    r = ranked.select(
        F.col(query_col).alias("q"),
        F.col(id_col).alias("d"),
        F.col(rank_col).cast("long").alias("rank"),
    ).where(F.col(rank_col) <= k)
    qr = qrels.select(
        F.col(query_col).alias("q"),
        F.col(id_col).alias("d"),
        F.col(rel_col).cast("int").alias("rel"),
    )
    scored = r.join(qr, ["q", "d"], "left").withColumn(
        "_g", F.coalesce(F.expr("shiftleft(1L, rel) - 1L"), F.lit(0))
    )
    dcg = (
        scored.withColumn("_term", F.expr("_g * 1000000L div CAST(length(bin(rank + 1)) AS BIGINT)"))
        .groupBy("q")
        .agg(F.sum("_term").cast("long").alias("dcg_units"))
    )
    w = Window.partitionBy("q").orderBy(F.col("rel").desc(), F.col("d").asc())
    ideal = (
        qr.withColumn("_irank", F.row_number().over(w))
        .where(F.col("_irank") <= k)
        .withColumn(
            "_term",
            F.expr(
                "(shiftleft(1L, rel) - 1L) * 1000000L"
                " div CAST(length(bin(_irank + 1)) AS BIGINT)"
            ),
        )
        .groupBy("q")
        .agg(F.sum("_term").cast("long").alias("idcg_units"))
        .where(F.col("idcg_units") > 0)
    )
    return (
        dcg.join(ideal, "q")
        .select(
            F.col("q").alias(query_col),
            "dcg_units",
            "idcg_units",
            F.expr("dcg_units * 1000000L div idcg_units").alias("ndcg_ppm"),
        )
    )


def rbo_overlap(
    a: DataFrame,
    b: DataFrame,
    query_col: str = "query",
    item_col: str = "item",
    rank_col: str = "rank",
    k: int = 10,
    p_num: int = 9,
    p_den: int = 10,
) -> DataFrame:
    """Rank-biased overlap (Webber et al. 2010) between two top-k
    rankings per query, truncated at depth k, EXACT integer ppm — the
    ranking-agreement diagnostic next to retrieval_ndcg ("did the
    ranker change actually reorder results?", count-rank vs value-rank
    drift).

    RBO@k = (1-p) * sum_{d=1..k} p^{d-1} * |A_d ∩ B_d| / d with
    persistence p = p_num/p_den. The distributed trick: a common item
    with ranks (ra, rb) contributes to every depth d >= max(ra, rb),
    so its total weight is a PRECOMPUTED suffix sum over the exact
    rational weights (scaled by D = p_den^k * lcm(1..k), pure Python
    ints) — one equi-join on (query, item) + one HashAggregate, no
    per-depth pass, no window. The single final division runs in
    DECIMAL(38,0)/HUGEINT (numerator ~ D * 1e6 ~ 2.5e19 for k=10
    passes BIGINT).

    Inputs: (query, item, rank) frames with rank 1..k unique per
    (query, item) — enforce upstream. Output is SPARSE: queries whose
    top-k sets are disjoint are absent (RBO 0). Extrapolated/residual
    RBO is out of scope (truncated prefix form only — the cross-engine
    exact one)."""
    from math import lcm

    if k < 1:
        raise ValueError("k must be >= 1")
    big_l = lcm(*range(1, k + 1))
    d_scale = p_den**k * big_l
    # the scaled weights ride BIGINT literals and per-query BIGINT
    # sums (bounded by the full mass d_scale); only the final *1e6
    # division is DECIMAL. d_scale passes int64 at k=14 (p_den=10) —
    # fail loudly at build time, not at a mid-query cast
    if d_scale > 2**63 - 1:
        raise ValueError(
            f"k={k}, p_den={p_den} scale {d_scale} overflows the BIGINT "
            "weight path (limit k<=13 at p_den=10); reduce k or p_den"
        )
    w = [
        (p_den - p_num) * p_num ** (d - 1) * p_den ** (k - d) * (big_l // d)
        for d in range(1, k + 1)
    ]
    suffix = [sum(w[m:]) for m in range(k)]  # suffix[m] = weight from depth m+1
    sa = a.where(F.col(rank_col) <= k).select(
        F.col(query_col).alias("q"), F.col(item_col).alias("i"),
        F.col(rank_col).cast("int").alias("_ra"),
    )
    sb = b.where(F.col(rank_col) <= k).select(
        F.col(query_col).alias("q"), F.col(item_col).alias("i"),
        F.col(rank_col).cast("int").alias("_rb"),
    )
    arr = F.array(*[F.lit(s).cast("long") for s in suffix])
    per = sa.join(sb, ["q", "i"]).select(
        "q",
        F.element_at(arr, F.greatest("_ra", "_rb")).alias("_wsum"),
    )
    return (
        per.groupBy("q")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum("_wsum").alias("_num"),
        )
        .select(
            F.col("q").alias(query_col),
            F.col("n_common").cast("long").alias("n_common"),
            F.expr(
                f"CAST(_num AS DECIMAL(38,0)) * 1000000 div {d_scale}"
            ).cast("long").alias("rbo_ppm"),
        )
    )


def retrieval_mrr(
    ranked: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    rel_min: int = 1,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Integer-exact MRR / hit-rate / precision@k — the binary-judged
    companion to retrieval_ndcg (graded): per query, the rank of the
    FIRST relevant result (rel >= ``rel_min``) gives
    ``rr_ppm = 1e6 div first_hit_rank`` (the reciprocal-rank term a
    macro average sums), plus ``n_hits`` in the top-k and textbook
    ``precision_ppm = n_hits * 1e6 div k`` (denominator k even when
    fewer rows were ranked). Queries whose top-k has no relevant doc
    emit first_hit_rank = 0 / rr_ppm = 0 — present with zero credit,
    exactly how trec_eval folds misses into the mean.

    Scale shape: one (query, doc) equi-join, one query-grain
    HashAggregate — the min-rank argmin needs no window."""
    r = ranked.select(
        F.col(query_col).alias("q"),
        F.col(id_col).alias("d"),
        F.col(rank_col).cast("long").alias("rank"),
    ).where(F.col(rank_col) <= k)
    qr = qrels.select(
        F.col(query_col).alias("q"),
        F.col(id_col).alias("d"),
        F.col(rel_col).cast("int").alias("rel"),
    )
    scored = r.join(qr, ["q", "d"], "left").withColumn(
        "_hit", (F.coalesce(F.col("rel"), F.lit(0)) >= rel_min).cast("int")
    )
    per_q = scored.groupBy("q").agg(
        F.min(F.when(F.col("_hit") == 1, F.col("rank"))).alias("_first"),
        F.sum("_hit").alias("n_hits"),
    )
    return per_q.select(
        F.col("q").alias(query_col),
        F.coalesce(F.col("_first"), F.lit(0))
        .cast("long")
        .alias("first_hit_rank"),
        F.when(F.col("_first").isNotNull(), F.expr("1000000L div _first"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rr_ppm"),
        F.col("n_hits").cast("long").alias("n_hits"),
        F.expr(f"n_hits * 1000000L div {int(k)}")
        .cast("long")
        .alias("precision_ppm"),
    )
