"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet, compare row counts + sorted values (column names
sorted, rows sorted by all columns) — catching naming or value drift
before the driver does."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.sql(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def _assert_frames_match(spark_df: pd.DataFrame, duck_df: pd.DataFrame, name: str):
    assert len(spark_df) == len(duck_df), f"{name}: row count {len(spark_df)} vs {len(duck_df)}"
    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        f"{name}: columns {sorted(spark_df.columns)} vs {sorted(duck_df.columns)}"
    )
    a, b = _normalize(spark_df), _normalize(duck_df)
    for col in a.columns:
        # Driver-strict: the driver hashes str(value) over sorted columns /
        # sorted rows with NO float tolerance, so a float64 "99111.0" vs an
        # int64 "99111" IS a failure (round-1 lesson: DuckDB SUM(<int>)
        # returns HUGEINT -> pandas float64). Every oracle pair must agree
        # on exact stringified values, dtype included.
        av = a[col].where(a[col].notna(), None).map(lambda x: "__null__" if x is None else str(x))
        bv = b[col].where(b[col].notna(), None).map(lambda x: "__null__" if x is None else str(x))
        mism = (av != bv)
        assert not mism.any(), (
            f"{name}.{col}: first mismatch at {mism.idxmax()}: "
            f"{av[mism.idxmax()]!r} vs {bv[mism.idxmax()]!r} "
            f"(dtypes {a[col].dtype} vs {b[col].dtype})"
        )


QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    q = entry_mod.queries()[name]
    oracles = entry_mod.oracle_sql()
    spark_pdf = q(spark, SF_DIR).toPandas()
    if name not in oracles:
        assert len(spark_pdf) >= 0  # rows-only check (non-SQL-expressible op)
        return
    duck_pdf = _duck(oracles[name])
    _assert_frames_match(spark_pdf, duck_pdf, name)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["visit_rank", "url", "host", "depth"]
    assert len(rows) > 0


# xxhash64 scale twins: each has a _md5 counterpart that IS oracle-checked,
# plus a property test pinning pair-set equivalence between the two hash
# modes (test_datapipe.py). Any OTHER query without an oracle is a bug —
# this gate keeps the registry and the driver snapshot in lockstep.
NO_ORACLE_TWINS = {
    "minhash_lsh_pairs",   # twin: minhash_lsh_pairs_md5
    "simhash_neardup",     # twin: simhash_neardup_md5
    "winnow_fingerprints", # twin: winnow_fingerprints_md5
}


def test_every_query_has_oracle_or_documented_twin():
    q = set(entry_mod.queries())
    o = set(entry_mod.oracle_sql())
    bare = q - o - NO_ORACLE_TWINS
    assert not bare, (
        f"queries without an oracle_sql entry or a documented twin: {sorted(bare)} "
        "— add the DuckDB mirror (or, for a genuinely non-SQL-expressible op, "
        "a property-tested twin + an entry in NO_ORACLE_TWINS)"
    )
    # twins must stay real: each allowlisted name still registered and its
    # md5 counterpart still oracle-checked
    for name in NO_ORACLE_TWINS:
        assert name in q, f"stale NO_ORACLE_TWINS entry: {name}"
        assert f"{name}_md5" in o, f"{name}: md5 twin lost its oracle"
    assert not (o - q), f"orphan oracles: {sorted(o - q)}"
