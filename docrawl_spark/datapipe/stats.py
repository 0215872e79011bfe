"""Integer-exact contingency statistics — corpus drift detection.

Chi-square goodness-of-fit over a two-way contingency table (source x
language, host x status-class, shard x script ...) is the standard
"did the mix change" audit: which cells are over/under-represented
against the independence expectation, and which rows (sources) drift
most. Floating-point chi-square is not cross-engine reproducible (sum
order changes ulps); everything here is exact integer arithmetic:

    expected_micro  = (row_total * col_total * 10^6)  div N
    chi2_cell_micro = ((o*N - rt*ct)^2 * 10^6) div (N * rt * ct)

computed in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — the squared
numerator reaches ~(o*N)^2 ~ 1e28 for 10^7-row corpora, far past
BIGINT, and both engines' 38-digit integer types hold it exactly;
``div`` (Spark) and ``//`` (DuckDB) agree on non-negative operands
(the numerator is a square). The final micro-unit cells fit BIGINT
(chi2 cell <= N, so <= 1e6 * N).

Zero cells are REAL cells: the full row-dim x col-dim cross is
materialized (absent observed counts coalesce to 0) so a source that
suddenly stops emitting a language still shows its (o=0, e>0)
deviation. The cross is dim x dim — margins, never facts.

Scale shape: one fact-table HashAggregate (cell counts), two margin
HashAggregates over the cell table, a dim-sized crossJoin (documented
benign — both sides are margin dims), broadcast joins back. No
corpus-sized shuffle beyond the first groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_D = "DECIMAL(38,0)"


def chisq_cells(df: DataFrame, row_col: str, col_col: str) -> DataFrame:
    """Per-cell chi-square decomposition of the ``row_col`` x
    ``col_col`` contingency table of ``df`` (null keys excluded).
    Returns one row per (row, col) in the FULL margin cross:
    (row_col, col_col, observed, expected_micro, chi2_cell_micro),
    all integers (micro = 1e-6 units, truncating division)."""
    facts = df.where(
        F.col(row_col).isNotNull() & F.col(col_col).isNotNull()
    ).select(F.col(row_col).alias("r"), F.col(col_col).alias("c"))
    cells = facts.groupBy("r", "c").agg(F.count(F.lit(1)).alias("o"))
    rows = cells.groupBy("r").agg(F.sum("o").alias("rt"))
    cols = cells.groupBy("c").agg(F.sum("o").alias("ct"))
    # margins x margins: dim-sized by construction (benign cross);
    # total N from the row margins (one tiny agg, broadcast back)
    grid = F.broadcast(rows).crossJoin(F.broadcast(cols))
    n = rows.agg(F.sum("rt").alias("n"))
    full = (
        grid.join(cells, ["r", "c"], "left")
        .select("r", "c", F.coalesce("o", F.lit(0)).alias("o"), "rt", "ct")
        .crossJoin(F.broadcast(n))
    )
    o = F.col("o").cast(_D)
    rt = F.col("rt").cast(_D)
    ct = F.col("ct").cast(_D)
    nn = F.col("n").cast(_D)
    diff = (o * nn - rt * ct).cast(_D)
    return full.select(
        F.col("r").alias(row_col),
        F.col("c").alias(col_col),
        F.col("o").cast("long").alias("observed"),
        F.expr(f"CAST(rt AS {_D}) * CAST(ct AS {_D}) * 1000000"
               f" div CAST(n AS {_D})").cast("long").alias("expected_micro"),
        (diff * diff * F.lit(1000000).cast(_D)).alias("_num"),
        (nn * rt * ct).alias("_den"),
    ).select(
        row_col,
        col_col,
        "observed",
        "expected_micro",
        F.expr("_num div _den").cast("long").alias("chi2_cell_micro"),
    )


def chisq_row_scores(df: DataFrame, row_col: str, col_col: str) -> DataFrame:
    """Per-row drift score: the sum of that row's chi2 cells (exact
    integer sum of the micro cells) plus the row total — the 'which
    source drifted' ranking."""
    cells = chisq_cells(df, row_col, col_col)
    return cells.groupBy(row_col).agg(
        F.sum("observed").cast("long").alias("row_total"),
        F.sum("chi2_cell_micro").cast("long").alias("chi2_row_micro"),
    )


def gini_impurity(df: DataFrame, group_col: str, label_col: str) -> DataFrame:
    """Per-group Gini impurity of the label mix, exact ppm:
    1e6 - (sum_i n_i^2 * 1e6) div n^2 — the diversity audit that works
    where Shannon entropy can't be made integer-exact (logs). 0 ppm =
    pure (one label), -> 1e6 * (1 - 1/k) for a uniform k-label mix.
    Impurity collapsing toward 0 on a source flags a feed gone
    monolingual / single-template.

    One decision: a SINGLE truncating division on the aggregated sums
    (not per-label), so the result is the exact floor of the rational
    value. The label-count sums stay in BIGINT to ~3e9 rows/group
    (n_i^2); the ppm-SCALED numerator sq*1e6 would pass BIGINT at just
    ~3e6 rows, so the division runs in DECIMAL(38,0)/HUGEINT. Shape:
    two HashAggregates, no window, no join."""
    facts = df.where(
        F.col(group_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(F.col(group_col).alias("g"), F.col(label_col).alias("l"))
    cells = facts.groupBy("g", "l").agg(F.count(F.lit(1)).alias("o"))
    agg = cells.groupBy("g").agg(
        F.sum("o").alias("n"),
        F.sum(F.col("o") * F.col("o")).alias("sq"),
        F.count(F.lit(1)).alias("n_labels"),
    )
    return agg.select(
        F.col("g").alias(group_col),
        F.col("n").cast("long").alias("n_rows"),
        F.col("n_labels").cast("long").alias("n_labels"),
        (
            F.lit(1000000)
            - F.expr(
                f"CAST(sq AS {_D}) * 1000000"
                f" div (CAST(n AS {_D}) * n)"
            )
        )
        .cast("long")
        .alias("gini_ppm"),
    )


def rank_drift_stats(
    df: DataFrame, group_col: str, label_col: str, value_col: str
) -> DataFrame:
    """Per-group two-sample rank statistics between the rows where
    boolean ``label_col`` is true (sample A) and false (sample B),
    over integer ``value_col`` — the distribution-drift audit that
    needs no distributional assumption and no floats:

    - Mann-Whitney U with midrank tie handling, carried as
      ``u2_a = 2*U_A`` (doubling makes tied midranks integral:
      a tie block of size t starting after cumulative count c
      contributes 2*midrank = 2c + t + 1 to each member).
    - ``auc_ppm = 2*U_A * 1e6 div (2 * n_a * n_b)`` — the exact floor
      of P(A > B) + P(A = B)/2, the probability a random A value
      exceeds a random B value (ties half-credit). 500_000 = no
      drift; the rank-biserial effect is 2*auc - 1.
    - Kolmogorov-Smirnov two-sample numerator
      ``ks_num = max_v |F_A(v)*n_a*n_b - F_B(v)*n_a*n_b|``
      (= max |ca*n_b - cb*n_a| over inclusive cumulative counts), and
      ``ks_ppm = ks_num * 1e6 div (n_a * n_b)``.
    - Total-variation distance ``tv_ppm = (sum_v |ca_v*n_b -
      cb_v*n_a|) * 1e6 div (2 * n_a * n_b)`` — the exact floor of
      (1/2) * sum |p_v - q_v|, the SUM-form companion to KS's
      max-form (KS sees one big localized shift; TV sees mass spread
      across many cells).

    For the VALUE at which the KS gap peaks (the separating
    threshold), use ks_two_sample — the location drill-down this
    panel deliberately omits.

    Groups missing either sample are excluded (no comparison exists).
    Scale shape: one fact HashAggregate onto (group, value) cells,
    two windows over the DISTINCT-VALUE dim per group (never the
    corpus — pre-bucket continuous values first), one final
    HashAggregate. BIGINT throughout (ca*n_b <= n^2 ~ 1e14 at 10^7
    rows/group; ranksum2 <= 2n^2)."""
    facts = df.where(
        F.col(group_col).isNotNull()
        & F.col(label_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(group_col).alias("g"),
        F.col(label_col).cast("boolean").alias("a"),
        F.col(value_col).cast("long").alias("v"),
    )
    cells = facts.groupBy("g", "v").agg(
        F.sum(F.when(F.col("a"), 1).otherwise(0)).alias("ca_v"),
        F.sum(F.when(F.col("a"), 0).otherwise(1)).alias("cb_v"),
    )
    w_run = Window.partitionBy("g").orderBy("v")
    w_all = Window.partitionBy("g")
    run = cells.select(
        "g",
        "v",
        "ca_v",
        "cb_v",
        F.sum(F.col("ca_v") + F.col("cb_v")).over(w_run).alias("c_incl"),
        F.sum("ca_v").over(w_run).alias("ca_incl"),
        F.sum("cb_v").over(w_run).alias("cb_incl"),
        F.sum("ca_v").over(w_all).alias("n_a"),
        F.sum("cb_v").over(w_all).alias("n_b"),
    )
    per_g = run.groupBy("g", "n_a", "n_b").agg(
        F.sum(
            F.col("ca_v")
            * (2 * F.col("c_incl") - F.col("ca_v") - F.col("cb_v") + 1)
        ).alias("ranksum2_a"),
        F.max(
            F.abs(
                F.col("ca_incl") * F.col("n_b")
                - F.col("cb_incl") * F.col("n_a")
            )
        ).alias("ks_num"),
        F.sum(
            F.abs(
                F.col("ca_v") * F.col("n_b") - F.col("cb_v") * F.col("n_a")
            )
        ).alias("tv_num"),
    )
    return (
        per_g.where((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .withColumn(
            "u2_a", F.expr("ranksum2_a - n_a * (n_a + 1)")
        )
        .select(
            F.col("g").alias(group_col),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("u2_a").cast("long").alias("u2_a"),
            F.expr(
                f"CAST(u2_a AS {_D}) * 1000000"
                f" div (2 * CAST(n_a AS {_D}) * n_b)"
            )
            .cast("long")
            .alias("auc_ppm"),
            F.col("ks_num").cast("long").alias("ks_num"),
            F.expr(
                f"CAST(ks_num AS {_D}) * 1000000"
                f" div (CAST(n_a AS {_D}) * n_b)"
            )
            .cast("long")
            .alias("ks_ppm"),
            F.col("tv_num").cast("long").alias("tv_num"),
            F.expr(
                f"CAST(tv_num AS {_D}) * 1000000"
                f" div (2 * CAST(n_a AS {_D}) * n_b)"
            )
            .cast("long")
            .alias("tv_ppm"),
        )
    )


def _tick_counts(
    df: DataFrame, group_col: str, tick_col: str, cast_long: bool = False
) -> DataFrame:
    """Shared prelude of every per-tick-count operator (cusum,
    mann_kendall, trend_ols, dispersion, autocorr): null group/tick
    rows excluded, one fact HashAggregate onto (g, t, y=count).
    ``cast_long`` forces an integral tick for span arithmetic."""
    t = F.col(tick_col).cast("long") if cast_long else F.col(tick_col)
    facts = df.where(
        F.col(group_col).isNotNull() & F.col(tick_col).isNotNull()
    ).select(F.col(group_col).alias("g"), t.alias("t"))
    return facts.groupBy("g", "t").agg(F.count(F.lit(1)).alias("y"))


def cusum_changepoint(
    df: DataFrame, group_col: str, tick_col: str
) -> DataFrame:
    """Per-group CUSUM changepoint over the per-tick row counts: with
    counts y_1..y_m in tick order, total T, prefix sums S_j, the
    deviation ``D_j = |S_j * m - j * T|`` (the cumulative count's gap
    from the uniform-rate line, scaled by m so it stays integral)
    peaks at the most likely single changepoint. Returns per group the
    argmax tick (earliest tick on ties), ``cusum_num = max D_j`` and
    ``cusum_ppm = max D_j * 1e6 div (T * m)`` in [0, 1e6) — 0 means a
    perfectly uniform rate, large means an abrupt level shift at
    ``change_tick``.

    Scale shape: one fact HashAggregate onto (group, tick), two
    window passes over the TICK dim per group (days/hours — never the
    corpus), one final pick. BIGINT-safe: S_j*m <= T*m ~ 1e10 * 1e5."""
    ticks = _tick_counts(df, group_col, tick_col)
    w_run = Window.partitionBy("g").orderBy("t")
    w_all = Window.partitionBy("g")
    run = ticks.select(
        "g",
        "t",
        F.row_number().over(w_run).alias("j"),
        F.sum("y").over(w_run).alias("s"),
        F.count(F.lit(1)).over(w_all).alias("m"),
        F.sum("y").over(w_all).alias("tot"),
    ).withColumn("dev", F.abs(F.col("s") * F.col("m") - F.col("j") * F.col("tot")))
    w_pick = Window.partitionBy("g").orderBy(F.col("dev").desc(), F.col("t").asc())
    return (
        run.withColumn("pick", F.row_number().over(w_pick))
        .where(F.col("pick") == 1)
        .select(
            F.col("g").alias(group_col),
            F.col("m").cast("long").alias("n_ticks"),
            F.col("tot").cast("long").alias("total_rows"),
            F.col("t").alias("change_tick"),
            F.col("dev").cast("long").alias("cusum_num"),
            F.expr(
                f"CAST(dev AS {_D}) * 1000000"
                f" div (CAST(tot AS {_D}) * m)"
            )
            .cast("long")
            .alias("cusum_ppm"),
        )
    )


def k_anonymity(df: DataFrame, quasi_cols: list[str], ks: list[int]) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple
    ``quasi_cols``: for each threshold k in ``ks``, how many
    equivalence classes have fewer than k rows and how many rows sit
    in them (re-identification risk before releasing a corpus slice).
    NULL is a real quasi-identifier value (it identifies), so null
    groups are counted like any other. Returns one row per k:
    (k, n_groups, n_rows, groups_below, rows_at_risk, min_class_size).

    Scale shape: one fact HashAggregate onto the quasi tuple, then a
    |ks|-way fan-out of the class-size DIM (never the facts) and one
    tiny aggregate."""
    sizes = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("sz")
    )
    fanned = sizes.select(
        "sz",
        F.explode(F.array(*[F.lit(int(k)) for k in ks])).alias("k"),
    )
    return (
        fanned.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("sz").alias("n_rows"),
            F.sum(F.when(F.col("sz") < F.col("k"), 1).otherwise(0)).alias(
                "groups_below"
            ),
            F.sum(F.when(F.col("sz") < F.col("k"), F.col("sz")).otherwise(0)).alias(
                "rows_at_risk"
            ),
            F.min("sz").alias("min_class_size"),
        )
        .select(
            F.col("k").cast("long").alias("k"),
            F.col("n_groups").cast("long").alias("n_groups"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("groups_below").cast("long").alias("groups_below"),
            F.col("rows_at_risk").cast("long").alias("rows_at_risk"),
            F.col("min_class_size").cast("long").alias("min_class_size"),
        )
    )


def _count_histogram(df: DataFrame, unit_col: str) -> DataFrame:
    """Histogram of per-unit row counts: one row per DISTINCT count
    value x with c = #units having exactly x rows, plus exclusive
    cumulative units/rows below x and grand totals. The block form
    every exact concentration statistic needs, with windows over the
    count-VALUE dim (≪ unit dim ≪ corpus)."""
    counts = df.where(F.col(unit_col).isNotNull()).groupBy(unit_col).agg(
        F.count(F.lit(1)).alias("x")
    )
    hist = counts.groupBy("x").agg(F.count(F.lit(1)).alias("c"))
    w_run = Window.orderBy("x")
    w_all = Window.partitionBy()
    return hist.select(
        "x",
        "c",
        (F.sum("c").over(w_run) - F.col("c")).alias("cu_prev"),
        (F.sum(F.col("x") * F.col("c")).over(w_run) - F.col("x") * F.col("c")).alias(
            "cr_prev"
        ),
        F.sum("c").over(w_all).alias("n_units"),
        F.sum(F.col("x") * F.col("c")).over(w_all).alias("tot_rows"),
    )


def lorenz_deciles(df: DataFrame, unit_col: str) -> DataFrame:
    """Lorenz concentration curve of rows over units (events over
    users, pages over hosts): for each decile d, the exact cumulative
    row share (ppm) held by the bottom ``(d * n_units) div 10`` units
    when units are sorted by ascending row count — the 'is the crawl
    budget all going to ten hosts' audit. Bottom-decile shares near 0
    with a top decile near 1e6 = extreme concentration.

    Exactness without a global unit sort: units with equal count are
    interchangeable, so the prefix sum at unit-rank r inside a count
    block of value x is cr_prev + (r - cu_prev) * x — identical to
    sorting all units by (count, unit) and summing the first r. The
    windows run over the count-VALUE histogram; the decile dim (10
    rows) range-joins into it."""
    hist = _count_histogram(df, unit_col)
    deciles = hist.sparkSession.range(1, 11).select(
        F.col("id").cast("long").alias("decile")
    )
    bounded = F.broadcast(deciles).crossJoin(
        F.broadcast(hist.select("n_units", "tot_rows").limit(1))
    ).withColumn("r", F.expr("decile * n_units div 10"))
    joined = bounded.join(
        hist.select("x", "c", "cu_prev", "cr_prev"),
        (F.col("cu_prev") < F.col("r"))
        & (F.col("r") <= F.col("cu_prev") + F.col("c")),
        "left",
    )
    return joined.select(
        "decile",
        F.col("r").cast("long").alias("unit_rank"),
        F.col("n_units").cast("long").alias("n_units"),
        F.coalesce(
            F.col("cr_prev") + (F.col("r") - F.col("cu_prev")) * F.col("x"),
            F.lit(0),
        )
        .cast("long")
        .alias("cum_rows"),
        F.coalesce(
            F.expr(
                f"CAST(cr_prev + (r - cu_prev) * x AS {_D}) * 1000000"
                " div tot_rows"
            ),
            F.lit(0).cast(_D),
        )
        .cast("long")
        .alias("cum_share_ppm"),
    )


def gini_concentration(df: DataFrame, unit_col: str) -> DataFrame:
    """Exact Gini coefficient (ppm) of row counts over units — the
    scalar companion to ``lorenz_deciles`` (inequality of the crawl /
    traffic allocation, NOT label impurity — see ``gini_impurity``).
    With units sorted ascending by count, a block of c units of count
    x occupying ranks cu_prev+1..cu_prev+c contributes
    2*sum(i*x_i) = x * c * (2*cu_prev + c + 1); then
    ``gini_ppm = (sum_blocks - (n+1)*T) * 1e6 div (n*T)`` — the exact
    floor of the textbook (2*sum(i*x_i) - (n+1)*T) / (n*T), which is
    >= 0 because ascending order minimizes the rank-weighted sum at
    (n+1)*T/2 (equality when all counts are equal). One window pass
    over the count-value histogram, one scalar aggregate."""
    hist = _count_histogram(df, unit_col)
    blocks = hist.select(
        "n_units",
        "tot_rows",
        (
            F.col("x").cast(_D)
            * F.col("c")
            * (2 * F.col("cu_prev") + F.col("c") + 1)
        ).alias("blk"),
    )
    return (
        blocks.groupBy("n_units", "tot_rows")
        .agg(F.sum("blk").alias("s2"))
        .select(
            F.col("n_units").cast("long").alias("n_units"),
            F.col("tot_rows").cast("long").alias("tot_rows"),
            F.expr(
                f"(s2 - (CAST(n_units AS {_D}) + 1) * tot_rows) * 1000000"
                f" div (CAST(n_units AS {_D}) * tot_rows)"
            )
            .cast("long")
            .alias("gini_ppm"),
        )
    )


def _signed_ppm(num: str, den: str, scale: int = 1000000) -> str:
    """Sign-symmetric integer scaling: Spark ``div`` truncates toward
    zero but DuckDB ``//`` floors, so they disagree on negative
    numerators — route the division through the absolute value on
    BOTH engines (the DuckDB mirror uses the same CASE with ``//``)."""
    return (
        f"CASE WHEN {num} < 0"
        f" THEN -(CAST(-({num}) AS {_D}) * {scale} div ({den}))"
        f" ELSE CAST({num} AS {_D}) * {scale} div ({den}) END"
    )


def mann_kendall_trend(
    df: DataFrame, group_col: str, tick_col: str
) -> DataFrame:
    """Per-group Mann-Kendall trend test over per-tick row counts:
    ``S = sum_{i<j} sign(y_j - y_i)`` over tick-ordered counts — the
    nonparametric 'is this feed's rate monotonically trending' audit
    (pairs with equal counts contribute 0 to S but still count in the
    tau-a denominator ``n_pairs = m(m-1)/2``). ``tau_ppm`` is the
    sign-symmetric exact scaling of S / n_pairs in [-1e6, 1e6]:
    +1e6 = strictly increasing, -1e6 = strictly decreasing, ~0 = no
    monotone trend. Complements cusum_changepoint (level SHIFT) with
    monotone DRIFT.

    Scale shape: one fact HashAggregate onto (group, tick), then a
    per-group pair self-join over the TICK DIM (fan-out m² on
    days/hours — never the corpus; m=365 days is 66k pairs). Groups
    with one tick are excluded (no pairs)."""
    ticks = _tick_counts(df, group_col, tick_col)
    a = ticks.select("g", F.col("t").alias("ti"), F.col("y").alias("yi"))
    b = ticks.select("g", F.col("t").alias("tj"), F.col("y").alias("yj"))
    pairs = a.join(b, "g").where(F.col("ti") < F.col("tj"))
    per_g = pairs.groupBy("g").agg(
        F.sum(F.signum(F.col("yj") - F.col("yi")).cast("long")).alias("s_num"),
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("yj") == F.col("yi"), 1).otherwise(0)).alias(
            "n_tie_pairs"
        ),
    )
    m = ticks.groupBy("g").agg(F.count(F.lit(1)).alias("n_ticks"))
    return (
        per_g.join(F.broadcast(m), "g")
        .select(
            F.col("g").alias(group_col),
            F.col("n_ticks").cast("long").alias("n_ticks"),
            F.col("s_num").cast("long").alias("s_num"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.col("n_tie_pairs").cast("long").alias("n_tie_pairs"),
            F.expr(_signed_ppm("s_num", "n_pairs"))
            .cast("long")
            .alias("tau_ppm"),
        )
    )


def trend_ols(df: DataFrame, group_col: str, tick_col: str) -> DataFrame:
    """Per-group least-squares trend slope of per-tick row counts
    against the tick RANK x = 1..m (observed ticks in order — gaps
    collapse; use dispersion_stats/cusum for gap-sensitive audits):
    exact integer numerator/denominator of the closed-form OLS slope

        slope = (m*Σxy - Σx*Σy) / (m*Σx² - (Σx)²)

    plus ``slope_micro`` = slope * 1e6 under sign-symmetric truncating
    division — 'rows per tick per tick' drift rate, the magnitude
    companion to mann_kendall_trend's direction. Groups with m < 2
    are excluded (denominator 0).

    Scale shape: one fact HashAggregate onto (group, tick), one
    row_number window over the TICK DIM, one final HashAggregate.
    Overflow envelope: the input sums stay in BIGINT to m²·ymax ≤
    9e18 (m = 1e4 ticks × ymax = 9e10 rows/tick); the num/den
    arithmetic runs in DECIMAL(38,0)/HUGEINT because m·Σxy ~ m³·ymax
    passes BIGINT much earlier; the FINAL slope_num ~ m³·ymax/12 must
    still fit the BIGINT output columns — holds for daily grain to
    ~30 years × 2e9 rows/day (m³·ymax ≤ 1.1e20). DuckDB mirrors get
    this width free (SUM(int) → HUGEINT)."""
    ticks = _tick_counts(df, group_col, tick_col)
    w = Window.partitionBy("g").orderBy("t")
    xy = ticks.select("g", "y", F.row_number().over(w).alias("x"))
    agg = xy.groupBy("g").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return (
        agg.where(F.col("m") >= 2)
        .withColumn(
            "slope_num",
            F.expr(f"CAST(m AS {_D}) * sxy - CAST(sx AS {_D}) * sy"),
        )
        .withColumn(
            "slope_den",
            F.expr(f"CAST(m AS {_D}) * sxx - CAST(sx AS {_D}) * sx"),
        )
        .select(
            F.col("g").alias(group_col),
            F.col("m").cast("long").alias("n_ticks"),
            F.col("sy").cast("long").alias("total_rows"),
            F.col("slope_num").cast("long").alias("slope_num"),
            F.col("slope_den").cast("long").alias("slope_den"),
            F.expr(_signed_ppm("slope_num", "slope_den"))
            .cast("long")
            .alias("slope_micro"),
        )
    )


def dispersion_stats(
    df: DataFrame, group_col: str, tick_col: str
) -> DataFrame:
    """Per-group index of dispersion (Fano factor) of per-tick row
    counts over the INTEGER tick span [min_tick, max_tick] — ticks
    with zero rows inside the span COUNT as zeros (they carry the
    burstiness): with span s and total T,

        dispersion_ppm = (s*Σy² - T²) * 1e6 div (s*T)

    = variance/mean in exact ppm. ~1e6 = Poisson-like arrivals,
    ≫1e6 = bursty (bot storms, batch re-feeds), ≪1e6 = rate-limited/
    uniform. ``tick_col`` must already be integral (day index via
    datediff — zero-tick inclusion needs arithmetic, not categories).

    Scale shape: one fact HashAggregate onto (group, tick), one
    per-group scalar aggregate — no window, no join, no span
    materialization (zeros only affect s, never Σy²). Numerator in
    DECIMAL(38,0) (s·Σy² can pass BIGINT at 1e5 ticks × 1e7/tick)."""
    ticks = _tick_counts(df, group_col, tick_col, cast_long=True)
    agg = ticks.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_ticks"),
        (F.max("t") - F.min("t") + 1).alias("span"),
        F.sum("y").alias("tot"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    return agg.select(
        F.col("g").alias(group_col),
        F.col("n_ticks").cast("long").alias("n_ticks"),
        F.col("span").cast("long").alias("span"),
        F.col("tot").cast("long").alias("total_rows"),
        F.expr(
            f"(CAST(span AS {_D}) * syy - CAST(tot AS {_D}) * tot)"
            f" * 1000000 div (CAST(span AS {_D}) * tot)"
        )
        .cast("long")
        .alias("dispersion_ppm"),
    )


def weighted_quantile(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    q_num: int = 1,
    q_den: int = 2,
) -> DataFrame:
    """Exact per-group weighted quantile (default: lower weighted
    median): the smallest value v whose inclusive cumulative weight
    satisfies ``cumw * q_den >= W * q_num`` — 'the size below which
    half the BYTES sit' (vs the row median's half the DOCS; weight =
    bytes/tokens/quantity). Integer-exact: the threshold compare is
    cross-multiplied, never divided. Rows with weight <= 0 or NULL
    value are excluded; groups losing all rows vanish.

    Scale shape: one fact HashAggregate onto (group, value) cells
    (weights pre-summed — ties collapse), one running-sum window over
    the DISTINCT-VALUE dim per group (pre-bucket continuous values),
    one final MIN aggregate."""
    facts = df.where(
        F.col(group_col).isNotNull()
        & F.col(value_col).isNotNull()
        & (F.col(weight_col).cast("long") > 0)
    ).select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("long").alias("v"),
        F.col(weight_col).cast("long").alias("w"),
    )
    cells = facts.groupBy("g", "v").agg(F.sum("w").alias("wv"))
    w_run = Window.partitionBy("g").orderBy("v")
    w_all = Window.partitionBy("g")
    run = cells.select(
        "g",
        "v",
        F.sum("wv").over(w_run).alias("cumw"),
        F.sum("wv").over(w_all).alias("tot_w"),
    )
    return (
        run.where(F.col("cumw") * q_den >= F.col("tot_w") * q_num)
        .groupBy("g", "tot_w")
        .agg(F.min("v").alias("wq"))
        .select(
            F.col("g").alias(group_col),
            F.col("tot_w").cast("long").alias("total_weight"),
            F.col("wq").cast("long").alias("weighted_quantile"),
        )
    )
def agreement_kappa(
    df: DataFrame, group_col: str, rater_a_col: str, rater_b_col: str
) -> DataFrame:
    """Per-group Cohen's kappa between two label columns ("raters") —
    the chance-corrected agreement audit for corpus curation: when a
    new quality classifier is rolled out next to the old one (or a
    cheap heuristic next to an expensive model), raw percent agreement
    is inflated by label imbalance; kappa subtracts the agreement two
    independent raters with these margins would get by chance:

        kappa = (N*diag - pe_num) / (N^2 - pe_num)
        pe_num = sum_k rowmargin_a(k) * colmargin_b(k)

    exact in ppm (sign-symmetric division — kappa is negative when
    raters agree LESS than chance). Also returns exact ``po_ppm``
    (observed agreement) and ``pe_ppm`` (chance agreement). Groups
    where both raters are constant with the same single label are
    excluded (denominator 0: kappa undefined, agreement vacuous).

    Scale shape: one fact HashAggregate onto (group, a, b) cells, two
    margin HashAggregates over the CELL table, one margin-x-margin
    inner join on the label (dim-sized), one final join — the corpus
    is touched once. BIGINT-safe to N ~ 3e9 rows/group (N*diag); the
    ppm scaling runs in DECIMAL(38,0)/HUGEINT.

    Rebuild-original operator (no reference counterpart — the
    reference has no classifier-agreement tooling)."""
    facts = df.where(
        F.col(group_col).isNotNull()
        & F.col(rater_a_col).isNotNull()
        & F.col(rater_b_col).isNotNull()
    ).select(
        F.col(group_col).alias("g"),
        F.col(rater_a_col).alias("a"),
        F.col(rater_b_col).alias("b"),
    )
    cells = facts.groupBy("g", "a", "b").agg(F.count(F.lit(1)).alias("o"))
    per_g = cells.groupBy("g").agg(
        F.sum("o").alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("o")).otherwise(0)).alias(
            "diag"
        ),
    )
    ma = cells.groupBy("g", F.col("a").alias("k")).agg(F.sum("o").alias("ra"))
    mb = cells.groupBy("g", F.col("b").alias("k")).agg(F.sum("o").alias("cb"))
    pe = (
        ma.join(mb, ["g", "k"])
        .groupBy("g")
        .agg(F.sum(F.col("ra") * F.col("cb")).alias("pe_num"))
    )
    out = per_g.join(pe, "g").where(
        F.col("n") * F.col("n") != F.col("pe_num")
    )
    return out.select(
        F.col("g").alias(group_col),
        F.col("n").cast("long").alias("n_rows"),
        F.expr(f"CAST(diag AS {_D}) * 1000000 div n")
        .cast("long")
        .alias("po_ppm"),
        F.expr(f"CAST(pe_num AS {_D}) * 1000000 div (CAST(n AS {_D}) * n)")
        .cast("long")
        .alias("pe_ppm"),
        F.expr(
            _signed_ppm("n * diag - pe_num", f"CAST(n AS {_D}) * n - pe_num")
        )
        .cast("long")
        .alias("kappa_ppm"),
    )


def autocorr_lag(
    df: DataFrame, group_col: str, tick_col: str, lag: int
) -> DataFrame:
    """Per-group lag-``k`` autocorrelation of per-tick row counts over
    the INTEGER tick span — the seasonality audit (lag=7 over daily
    counts: does this feed breathe weekly?). Ticks with zero rows
    inside [min_tick, max_tick] COUNT as zeros: a feed that posts
    Mondays only is perfectly weekly precisely because the other six
    days are zero. ``tick_col`` must be integral (e.g. datediff from
    a fixed epoch).

    Exact Pearson r over the n = span - lag aligned pairs
    (x_i, z_i) = (y_i, y_{i+lag}):

        num  = n*Σxz - Σx*Σz
        den² = (n*Σx² - Σx²tot) * (n*Σz² - Σz²tot)

    r itself needs a square root, so the cross-engine-exact output is
    ``r2_signed_ppm`` = sign(num) * num² * 1e6 div den² — the signed
    squared correlation in [-1e6, 1e6] (+1e6 perfect periodicity,
    negative = anti-phase). The subrange sums Σx (ticks ≤ hi-lag) and
    Σz (ticks ≥ lo+lag) are computed from the nonzero cells only —
    implicit zeros contribute nothing to any Σ; only n carries the
    span. Σxz comes from ONE equi-join of the cell table onto itself
    at t+lag (zero-count terms vanish from the product). Groups where
    either aligned window is constant (den 0 — e.g. span ≤ lag) are
    excluded.

    Scale shape: one fact HashAggregate onto (group, tick), one
    self-join + three HashAggregates over the TICK DIM (days — never
    the corpus). Overflow envelope: num² * 1e6 runs in
    DECIMAL(38,0)/HUGEINT, so it needs |num| ≤ ~3e15; num is the
    centered cross-moment, |num| ≤ (span·ymax)²/4, giving
    span·ymax ≲ 2e8 (e.g. 3 years of days × 1.8e5 rows/day, or 90
    days × 2e6). Past that, coarsen the tick grain (weekly lag over
    week ticks) or pre-scale the counts (y div c) before calling —
    Pearson r is insensitive to uniform count scaling up to the
    integer-floor perturbation.

    Rebuild-original operator (no reference counterpart)."""
    if lag < 1:
        raise ValueError("lag must be >= 1")
    ticks = _tick_counts(df, group_col, tick_col, cast_long=True)
    span = ticks.groupBy("g").agg(
        F.min("t").alias("lo"), F.max("t").alias("hi")
    )
    cells = ticks.join(F.broadcast(span), "g")
    side = cells.groupBy("g", "lo", "hi").agg(
        F.sum(F.when(F.col("t") <= F.col("hi") - lag, F.col("y")).otherwise(0))
        .alias("sx"),
        F.sum(
            F.when(
                F.col("t") <= F.col("hi") - lag, F.col("y") * F.col("y")
            ).otherwise(0)
        ).alias("sxx"),
        F.sum(F.when(F.col("t") >= F.col("lo") + lag, F.col("y")).otherwise(0))
        .alias("sz"),
        F.sum(
            F.when(
                F.col("t") >= F.col("lo") + lag, F.col("y") * F.col("y")
            ).otherwise(0)
        ).alias("szz"),
    )
    lead = ticks.select(
        "g", (F.col("t") - lag).alias("t"), F.col("y").alias("y_lead")
    )
    sxz = (
        ticks.join(lead, ["g", "t"])
        .groupBy("g")
        .agg(F.sum(F.col("y") * F.col("y_lead")).alias("sxz"))
    )
    agg = (
        side.join(sxz, "g", "left")
        .select(
            "g",
            (F.col("hi") - F.col("lo") + 1 - lag).alias("n"),
            "sx",
            "sxx",
            "sz",
            "szz",
            F.coalesce("sxz", F.lit(0)).alias("sxz"),
        )
        .where(F.col("n") >= 2)
        .withColumn("num", F.expr("n * sxz - sx * sz"))
        .withColumn("denx", F.expr("n * sxx - sx * sx"))
        .withColumn("denz", F.expr("n * szz - sz * sz"))
        .where((F.col("denx") > 0) & (F.col("denz") > 0))
    )
    return agg.select(
        F.col("g").alias(group_col),
        F.col("n").cast("long").alias("n_pairs"),
        F.col("num").cast("long").alias("acov_num"),
        F.col("denx").cast("long").alias("den_x"),
        F.col("denz").cast("long").alias("den_z"),
        # num^2 is non-negative, so the truncating division agrees
        # across engines; only the SIGN of num flips the result.
        F.expr(
            f"CASE WHEN num < 0 THEN -(CAST(num AS {_D}) * num * 1000000"
            f" div (CAST(denx AS {_D}) * denz))"
            f" ELSE CAST(num AS {_D}) * num * 1000000"
            f" div (CAST(denx AS {_D}) * denz) END"
        )
        .cast("long")
        .alias("r2_signed_ppm"),
    )


# Poisson(1) CDF in exact ppm: P(X <= k) for k = 0..6; weights above
# the last threshold cap at 7 (P(X >= 8) < 1e-5 — the cap shifts a
# replicate mean by < 0.01% and is applied identically in the oracle).
_POIS1_CDF_PPM = (367879, 735759, 919699, 981012, 996340, 999406, 999917)


def _poisson_weighted(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    n_reps: int,
    salt: str,
) -> DataFrame:
    """(g, rep, _vc, wt) rows: the ×(R+1) replicate explode with
    Poisson(1) inverse-CDF weights from the md5-ppm hash of
    (salt, rep, id); rep -1 carries weight 1 everywhere (the point
    estimate rides the same aggregation). Shared by the bootstrap
    mean and quantile estimators so the resample universe is
    identical across statistics for the same salt."""
    base = df.select(
        F.col(group_col).alias("g"),
        F.col(id_col).cast("string").alias("_id"),
        F.col(value_col).cast("long").alias("_vc"),
        F.explode(F.sequence(F.lit(-1), F.lit(int(n_reps) - 1))).alias("rep"),
    )
    key = F.concat(
        F.lit(f"{salt}|"),
        F.col("rep").cast("string"),
        F.lit("|"),
        F.col("_id"),
    )
    ppm = F.pmod(
        F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long"),
        F.lit(1_000_000),
    )
    wt = F.lit(7)
    for k in range(len(_POIS1_CDF_PPM) - 1, -1, -1):
        wt = F.when(ppm < F.lit(_POIS1_CDF_PPM[k]), F.lit(k)).otherwise(wt)
    wt = F.when(F.col("rep") == -1, F.lit(1)).otherwise(wt)
    return base.withColumn("wt", wt.cast("long"))


def poisson_bootstrap_means(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    n_reps: int = 24,
    salt: str = "boot1",
) -> DataFrame:
    """Deterministic hash-based Poisson bootstrap: per-group mean with
    order-statistic confidence bounds, without resampling data movement.

    The classic way to put error bars on 100 TB aggregates: true
    resampling-with-replacement needs global coordination, but for
    n -> inf the multinomial resample count of each row converges to
    Poisson(1), so each replicate just WEIGHTS every row independently
    — a map-side operation. Weights here are a PURE FUNCTION of
    (salt, replicate, row id) via the md5-ppm idiom
    (datapipe/sampling._hash_ppm): bit-reproducible across runs,
    engines, partitionings, and cluster sizes, and exactly mirrored by
    the DuckDB oracle.

    ``value_col`` must be an exact BIGINT (e.g. cents); replicate
    means are micro-units via BIGINT ``div`` — no float sum-order
    drift. Replicate -1 carries weight 1 everywhere (the point
    estimate rides the same aggregation). Output per group:
    n_events, point_mean_micro, n_reps_used, boot_lo_micro /
    boot_hi_micro (2nd / (R-1)th order statistics of the R replicate
    means — a ~92% interval at the default R=24).

    Scale shape: explode x(R+1) then ONE HashAggregate on
    (group, rep) with map-side combine — the shuffle carries only
    |groups| * R rows; the final per-group collect_list holds R
    BIGINTs. No window over the fact table, no self-join.
    """
    base = _poisson_weighted(df, group_col, value_col, id_col, n_reps, salt)
    per_rep = (
        base.groupBy("g", "rep")
        .agg(
            F.sum("wt").alias("sw"),
            F.sum(F.expr("wt * _vc")).alias("svc"),
        )
        .where(F.col("sw") > 0)
        .withColumn("mean_micro", F.expr("(svc * 10000) div sw"))
    )
    agg = per_rep.groupBy("g").agg(
        F.max(F.when(F.col("rep") == -1, F.col("sw"))).alias("n_events"),
        F.max(F.when(F.col("rep") == -1, F.col("mean_micro"))).alias(
            "point_mean_micro"
        ),
        F.sort_array(
            F.collect_list(F.when(F.col("rep") >= 0, F.col("mean_micro")))
        ).alias("ms"),
    )
    return agg.select(
        F.col("g").alias(group_col),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("point_mean_micro").cast("long").alias("point_mean_micro"),
        F.size("ms").cast("long").alias("n_reps_used"),
        F.try_element_at("ms", F.lit(2)).cast("long").alias("boot_lo_micro"),
        F.try_element_at(
            "ms", F.greatest(F.size("ms") - 1, F.lit(1))
        )
        .cast("long")
        .alias("boot_hi_micro"),
    )


def poisson_bootstrap_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    n_reps: int = 24,
    salt: str = "bootq1",
    q_num: int = 1,
    q_den: int = 2,
) -> DataFrame:
    """Bootstrap confidence bounds for a per-group QUANTILE (default:
    lower median) — the statistic where the bootstrap earns its keep:
    a mean has a CLT standard error, a median does not. Same
    deterministic Poisson-weight replicates as
    ``poisson_bootstrap_means`` (same salt → same resample universe);
    each replicate's quantile is the exact weighted quantile of its
    resample (weighted_quantile's cross-multiplied threshold, values
    with zero resample weight excluded). Output per group: n_events,
    point_q (the weight-1 replicate), n_reps_used, boot_lo_q /
    boot_hi_q (2nd / (R-1)th order statistics of the replicate
    quantiles).

    Scale shape: one HashAggregate onto (group, rep, value) cells,
    one running-sum window over the DISTINCT-VALUE dim per
    (group, rep) — the fact table itself is never windowed — then
    R-sized collect_lists per group.
    """
    base = _poisson_weighted(df, group_col, value_col, id_col, n_reps, salt)
    cells = (
        base.groupBy("g", "rep", "_vc")
        .agg(F.sum("wt").alias("wv"))
        .where(F.col("wv") > 0)
    )
    w_run = Window.partitionBy("g", "rep").orderBy("_vc")
    w_all = Window.partitionBy("g", "rep")
    run = cells.select(
        "g",
        "rep",
        "_vc",
        F.sum("wv").over(w_run).alias("cumw"),
        F.sum("wv").over(w_all).alias("tot"),
    )
    per_rep = (
        run.where(F.col("cumw") * q_den >= F.col("tot") * q_num)
        .groupBy("g", "rep")
        .agg(F.min("_vc").alias("qv"), F.max("tot").alias("tot"))
    )
    agg = per_rep.groupBy("g").agg(
        F.max(F.when(F.col("rep") == -1, F.col("tot"))).alias("n_events"),
        F.max(F.when(F.col("rep") == -1, F.col("qv"))).alias("point_q"),
        F.sort_array(
            F.collect_list(F.when(F.col("rep") >= 0, F.col("qv")))
        ).alias("qs"),
    )
    return agg.select(
        F.col("g").alias(group_col),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("point_q").cast("long").alias("point_q"),
        F.size("qs").cast("long").alias("n_reps_used"),
        F.try_element_at("qs", F.lit(2)).cast("long").alias("boot_lo_q"),
        F.try_element_at("qs", F.greatest(F.size("qs") - 1, F.lit(1)))
        .cast("long")
        .alias("boot_hi_q"),
    )


def ks_two_sample(
    df: DataFrame, group_col: str, value_col: str, side_col: str
) -> DataFrame:
    """Per-group exact two-sample Kolmogorov-Smirnov distance WITH the
    location of the maximum divergence — the drill-down companion to
    rank_drift_stats (which reports MW-AUC/KS/TV magnitudes but not
    WHERE the distributions diverge): ``ks_at`` is the lattice value
    at which the cumulative gap peaks, i.e. the threshold that best
    separates the two populations (latency shifted above 300 ms; the
    quality split moved at score 0.42). Use rank_drift_stats for the
    full drift panel; this when the answer must name the break point.

    Everything is integer-exact and cross-engine: ``value_col`` must
    already be an integral lattice (centi-units etc.), ``side_col`` a
    0/1 int. With per-value counts a_v, b_v and totals n_a, n_b, the
    classic D = max_v |A(v)/n_a - B(v)/n_b| over the cumulative counts
    A, B is computed as the integer ``dnum = max |A(v)*n_b - B(v)*n_a|``
    and reported as ``ks_ppm = dnum * 1e6 div (n_a*n_b)`` (DECIMAL(38,0)
    arithmetic — the cross product passes BIGINT at ~3e9 rows/side;
    DuckDB mirrors in HUGEINT for free). ``ks_at`` is the smallest
    lattice value attaining the max (deterministic tie-break). Groups
    with an empty side are excluded (D undefined).

    Scale shape: one fact HashAggregate onto (g, value) — the only
    corpus-sized shuffle; the cumulative window runs over the per-group
    DISTINCT-VALUE LATTICE (bounded by the lattice, not row count —
    centi-quantized telemetry has ≤ ~1e6 distinct cells regardless of
    corpus size), then dim-sized broadcasts for totals and the argmax.
    """
    facts = df.where(
        F.col(group_col).isNotNull()
        & F.col(value_col).isNotNull()
        & F.col(side_col).isNotNull()
    ).select(
        F.col(group_col).alias("g"),
        F.col(value_col).alias("v"),
        F.col(side_col).alias("side"),
    )
    cnt = facts.groupBy("g", "v").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("a_cnt"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("b_cnt"),
    )
    w = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cnt.select(
        "g",
        "v",
        F.sum("a_cnt").over(w).alias("cum_a"),
        F.sum("b_cnt").over(w).alias("cum_b"),
    )
    tot = (
        cnt.groupBy("g")
        .agg(F.sum("a_cnt").alias("n_a"), F.sum("b_cnt").alias("n_b"))
        .where((F.col("n_a") > 0) & (F.col("n_b") > 0))
    )
    d = cum.join(F.broadcast(tot), "g").select(
        "g",
        "v",
        "n_a",
        "n_b",
        F.abs(
            F.col("cum_a").cast(_D) * F.col("n_b")
            - F.col("cum_b").cast(_D) * F.col("n_a")
        ).alias("dnum"),
    )
    mx = d.groupBy("g").agg(F.max("dnum").alias("dmax"))
    return (
        d.join(F.broadcast(mx), "g")
        .where(F.col("dnum") == F.col("dmax"))
        .groupBy("g", "n_a", "n_b", "dmax")
        .agg(F.min("v").alias("ks_at"))
        .select(
            F.col("g").alias(group_col),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.expr(
                f"dmax * 1000000 div (CAST(n_a AS {_D}) * n_b)"
            )
            .cast("long")
            .alias("ks_ppm"),
            F.col("ks_at").cast("long").alias("ks_at"),
        )
    )


def theil_sen_trend(
    df: DataFrame, group_col: str, tick_col: str
) -> DataFrame:
    """Per-group Theil-Sen trend estimator over per-tick row counts:
    the MEDIAN of all pairwise slopes (y_j - y_i)/(t_j - t_i) over
    tick-ordered counts — the robust magnitude companion to
    mann_kendall_trend (direction) and trend_ols (least-squares
    magnitude, which one burst day can drag arbitrarily; the Theil-Sen
    median has a 29% breakdown point). Unlike trend_ols this uses REAL
    tick spacing (gaps count), so the slope is per tick-unit.

    Integer-exact and cross-engine by construction: each pairwise
    slope is first fixed to ``s_micro = (dy * 1e6) div dt`` under the
    sign-symmetric truncating division (_signed_ppm — Spark div and
    DuckDB // disagree on negative numerators), and the reported
    statistic is the median over the DOUBLED domain
    (``slope_med2_micro`` = percentile(2*s_micro, 0.5), exact because
    even-n midpoints of even integers are integers) — i.e. exactly 2x
    the median micro-slope. The statistic is DEFINED over the
    truncated micro-slopes, which makes it reproducible to the bit on
    both engines.

    Scale shape: one fact HashAggregate onto (g, t), then a per-group
    pair self-join over the TICK DIM (m² on days — m=365 is 66k pairs,
    never corpus-sized), one exact-percentile HashAggregate whose
    buffer is the pair dim. Groups with < 2 ticks drop (no pairs)."""
    ticks = _tick_counts(df, group_col, tick_col, cast_long=True)
    a = ticks.select("g", F.col("t").alias("ti"), F.col("y").alias("yi"))
    b = ticks.select("g", F.col("t").alias("tj"), F.col("y").alias("yj"))
    pairs = (
        a.join(b, "g")
        .where(F.col("ti") < F.col("tj"))
        .select(
            "g",
            (F.col("yj") - F.col("yi")).alias("dy"),
            (F.col("tj") - F.col("ti")).alias("dt"),
        )
    )
    slopes = pairs.select(
        "g", F.expr(_signed_ppm("dy", "dt")).cast("long").alias("s_micro")
    )
    m = ticks.groupBy("g").agg(F.count(F.lit(1)).alias("n_ticks"))
    return (
        slopes.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.percentile(F.col("s_micro") * 2, F.lit(0.5))
            .cast("long")
            .alias("slope_med2_micro"),
        )
        .join(F.broadcast(m), "g")
        .select(
            F.col("g").alias(group_col),
            F.col("n_ticks").cast("long").alias("n_ticks"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.col("slope_med2_micro"),
        )
    )


def l_diversity(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    ls: list[int],
) -> DataFrame:
    """Distinct l-diversity audit — k_anonymity's companion: a class
    can be large (k-anonymous) yet still leak if every member shares
    the same SENSITIVE value, so for each threshold l in ``ls`` count
    the equivalence classes (quasi-identifier tuples) whose number of
    DISTINCT ``sensitive_col`` values is below l, and the rows exposed
    in them. NULL quasi values are real classes (they identify); NULL
    sensitive values are dropped from the distinct count (an absent
    attribute discloses nothing) but their rows still count as
    exposed members.

    Returns one row per l: (l, n_classes, n_rows, classes_below,
    rows_at_risk, min_diversity).

    Scale shape: one fact HashAggregate onto (quasi..., sensitive)
    cells, one class-dim aggregate, then a |ls|-way fan-out of the
    class DIM — the k_anonymity shape with one extra dedup level."""
    cells = df.groupBy(
        *[F.col(c) for c in quasi_cols], F.col(sensitive_col).alias("_s")
    ).agg(F.count(F.lit(1)).alias("_n"))
    classes = cells.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.sum("_n").alias("sz"),
        F.sum(F.when(F.col("_s").isNotNull(), 1).otherwise(0)).alias(
            "n_distinct_sensitive"
        ),
    )
    fanned = classes.select(
        "sz",
        "n_distinct_sensitive",
        F.explode(F.array(*[F.lit(int(l)) for l in ls])).alias("l"),
    )
    return (
        fanned.groupBy("l")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("sz").alias("n_rows"),
            F.sum(
                F.when(F.col("n_distinct_sensitive") < F.col("l"), 1).otherwise(0)
            ).alias("classes_below"),
            F.sum(
                F.when(
                    F.col("n_distinct_sensitive") < F.col("l"), F.col("sz")
                ).otherwise(0)
            ).alias("rows_at_risk"),
            F.min("n_distinct_sensitive").alias("min_diversity"),
        )
        .select(
            F.col("l").cast("long").alias("l"),
            F.col("n_classes").cast("long").alias("n_classes"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("classes_below").cast("long").alias("classes_below"),
            F.col("rows_at_risk").cast("long").alias("rows_at_risk"),
            F.col("min_diversity").cast("long").alias("min_diversity"),
        )
    )


def discrete_hazard(df: DataFrame, duration_col: str) -> DataFrame:
    """Discrete-time survival table over integer durations (one row
    per subject, e.g. session length in minutes, crawl-job runtime in
    waves): for each observed duration d,

        n_at_risk  = subjects with duration >= d
        n_ended    = subjects with duration == d
        hazard_ppm   = n_ended  * 1e6 div n_at_risk   (end NOW given
                                                       survived to d)
        survival_ppm = (n_at_risk - n_ended) * 1e6 div n_total
                                                      (still alive
                                                       PAST d)

    With complete observation (no censoring) this IS the Kaplan-Meier
    estimator — the survival column is the exact empirical tail
    fraction, no probability products needed, so everything stays in
    integers. Rows exist only at observed durations (the KM
    convention: the curve steps at event times). The classic use:
    "do sessions die uniformly per minute (geometric / constant
    hazard) or at specific cliff minutes (timeouts, rate caps)?" —
    constant hazard_ppm across d is the geometric signature; spikes
    mark engineered cliffs.

    Scale shape: one subject-grain HashAggregate onto the duration
    histogram, then one window over the DURATION DIM (distinct
    durations, never subjects) for the reverse cumulative at-risk
    count, and a broadcast total."""
    durs = df.where(
        F.col(duration_col).isNotNull() & (F.col(duration_col) >= 0)
    ).select(F.col(duration_col).cast("long").alias("d"))
    hist = durs.groupBy("d").agg(F.count(F.lit(1)).alias("n_ended"))
    w = (
        Window.orderBy(F.col("d").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    at_risk = hist.withColumn("n_at_risk", F.sum("n_ended").over(w))
    total = hist.agg(F.sum("n_ended").alias("n_total"))
    return (
        at_risk.crossJoin(F.broadcast(total))
        .select(
            F.col("d").alias(duration_col),
            F.col("n_at_risk").cast("long").alias("n_at_risk"),
            F.col("n_ended").cast("long").alias("n_ended"),
            F.expr("n_ended * 1000000 div n_at_risk")
            .cast("long")
            .alias("hazard_ppm"),
            F.expr("(n_at_risk - n_ended) * 1000000 div n_total")
            .cast("long")
            .alias("survival_ppm"),
        )
    )


def equi_depth_histogram(df: DataFrame, value_col: str, k: int = 8) -> DataFrame:
    """Equi-depth (equal-frequency) histogram over an integer column —
    the ANALYZE-statistics artifact a cost-based optimizer and a skew
    planner both want: k buckets whose upper boundaries are the
    nearest-rank k-quantiles, computed exactly. Boundary i (1..k) is
    the smallest lattice value whose inclusive cumulative row count
    reaches ceil(i*n/k), tested as ``cum*k >= i*n`` in pure BIGINTs —
    no float quantiles, bit-identical cross-engine.

    Output per bucket: (bucket, upper_v, cum_rows, n_in_bucket) with
    n_in_bucket the exact rows in (prev boundary, this boundary] —
    equal to ~n/k except where a heavy value overflows its bucket
    (the equi-depth skew signal: a bucket holding >> n/k rows IS the
    hot key).

    Scale shape: one fact HashAggregate onto the distinct-value
    lattice, one window over the LATTICE (quantized/integer domains
    are bounded regardless of row count), boundary fan-out exactly k
    rows via a guarded sequence (empty when a cell spans no boundary
    — sequence() DESCENDS on inverted ranges, so the span is
    pre-filtered). The k-row result fits the driver."""
    cells = (
        df.where(F.col(value_col).isNotNull())
        .select(F.col(value_col).cast("long").alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = (
        Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = cells.select(
        "v",
        F.sum("cnt").over(w).alias("cum"),
        (F.sum("cnt").over(w) - F.col("cnt")).alias("cum_prev"),
    )
    n = cells.agg(F.sum("cnt").alias("n"))
    spans = (
        run.crossJoin(F.broadcast(n))
        .withColumn("i_lo", F.expr(f"cum_prev * {int(k)} div n + 1"))
        .withColumn("i_hi", F.expr(f"cum * {int(k)} div n"))
        .where(F.col("i_hi") >= F.col("i_lo"))
        .select(
            "v",
            "cum",
            F.explode(F.expr("sequence(i_lo, i_hi)")).alias("bucket"),
        )
    )
    wb = Window.orderBy("bucket")
    return (
        spans.select(
            F.col("bucket").cast("long").alias("bucket"),
            F.col("v").alias("upper_v"),
            F.col("cum").cast("long").alias("cum_rows"),
        )
        .withColumn(
            "n_in_bucket",
            (F.col("cum_rows") - F.coalesce(F.lag("cum_rows").over(wb), F.lit(0)))
            .cast("long"),
        )
    )
