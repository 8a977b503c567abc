"""Self-check mimicking the driver's gate: run each queries() entry on
Spark AND its oracle_sql() on DuckDB over the same parquet, compare
row-count, column names, and order-insensitive values."""

import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif str(pdf[c].dtype).startswith(("int", "uint", "Int")):
            pdf[c] = pdf[c].astype("int64")
        elif str(pdf[c].dtype).startswith("float"):
            pdf[c] = pdf[c].astype("float64").round(6)
        elif str(pdf[c].dtype) == "bool":
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


ORACLED = sorted(entry_mod.oracle_sql().keys())
ROWS_ONLY = sorted(set(entry_mod.queries()) - set(ORACLED))


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema) > 0


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    ours = _canon(q(spark, SF).toPandas())
    theirs = _canon(ddb.execute(entry_mod.oracle_sql()[name]).df())
    assert list(ours.columns) == list(theirs.columns), (
        f"{name}: cols {list(ours.columns)} vs {list(theirs.columns)}"
    )
    assert len(ours) == len(theirs), f"{name}: {len(ours)} vs {len(theirs)} rows"
    pd.testing.assert_frame_equal(
        ours, theirs, check_dtype=False, check_exact=False, atol=1e-6,
        obj=name,
    )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF)
    assert df.count() >= 0
