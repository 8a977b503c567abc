"""Strict driver-gate mimic: run queries() vs oracle_sql() at sf0.01 and
compare EXACT values (sorted columns, sorted rows, stringified) — the same
bar as the driver's value-hash, unlike the pytest atol=1e-6 check.

Usage: python tools/check_oracle_exact.py [query ...]   (default: all oracled)
"""

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if str(pdf[c].dtype).startswith("float"):
            pdf[c] = pdf[c].astype("float64").round(6)
        pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def main():
    import __spark_entry__ as entry_mod
    from ecmwf_models_spark.session import get_spark

    spark = get_spark("oracle-exact", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracles = entry_mod.oracle_sql()
    queries = entry_mod.queries()
    names = sys.argv[1:] or sorted(oracles)
    n_bad = 0
    for name in names:
        try:
            ours = canon(queries[name](spark, SF).toPandas())
            theirs = canon(con.execute(oracles[name]).df())
            ok_rows = len(ours) == len(theirs)
            ok_cols = list(ours.columns) == list(theirs.columns)
            ok_vals = ok_rows and ok_cols and ours.equals(theirs)
            status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
            if status == "FAIL":
                n_bad += 1
            print(f"{name}: {status} rows={len(ours)}/{len(theirs)} "
                  f"cols={ok_cols} exact={ok_vals}", flush=True)
            if not ok_vals and ok_rows and ok_cols:
                diff = (ours != theirs).any(axis=1)
                print(ours[diff].head(3))
                print(theirs[diff].head(3))
        except Exception as e:  # noqa: BLE001
            n_bad += 1
            print(f"{name}: ERR {type(e).__name__}: {e}", flush=True)
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
