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

from pyspark.sql import DataFrame
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
