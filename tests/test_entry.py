"""Mirrors the driver's correctness gate: run each queries() entry on
Spark and its oracle_sql() on DuckDB at sf0.01, compare row count,
column names, and order-insensitive values."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _canon(df_pandas):
    cols = sorted(df_pandas.columns)
    out = df_pandas[cols].copy()
    rows = []
    for tup in out.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                if math.isnan(v):
                    row.append("NaN")
                else:
                    row.append(repr(v))
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows), cols


ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())
ALL_KEYS = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, ddb, name):
    qfn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    spark_pdf = qfn(spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(sql).fetchdf()
    srows, scols = _canon(spark_pdf)
    drows, dcols = _canon(duck_pdf)
    assert scols == dcols, f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    mismatches = [
        (a, b) for a, b in zip(srows, drows) if a != b
    ]
    assert not mismatches, f"{name}: first value mismatch {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(set(ALL_KEYS) - set(ORACLE_KEYS)))
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0 and len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
