#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs DuckDB on oracle_sql.json over the sf dir's parquet tables and
compares each query's result against the Spark-written parquet in outDir:
row count, column names, and exact values after sorting rows & columns.

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            duck = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_bad += 1; continue
        spark = con.sql(f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df()
        if len(duck) != len(spark):
            print(f"FAIL {name}: rows duck={len(duck)} spark={len(spark)}"); n_bad += 1; continue
        if sorted(duck.columns) != sorted(spark.columns):
            print(f"FAIL {name}: cols duck={sorted(duck.columns)} spark={sorted(spark.columns)}")
            n_bad += 1; continue
        d, s = norm(duck), norm(spark)
        # The driver's hash is type-KIND-sensitive: int-width drift (int32 vs
        # int64) hash-matched in round 1, but DuckDB HUGEINT (→ float64/object
        # in pandas) vs Spark LONG did not. Flag kind mismatches only.
        dt_drift = [c for c in d.columns
                    if d[c].dtype.kind != s[c].dtype.kind]
        try:
            pd.testing.assert_frame_equal(d, s, check_dtype=False, check_exact=True)
            if dt_drift:
                print(f"WARN {name}: values equal but dtypes differ "
                      f"{[(c, str(d[c].dtype), str(s[c].dtype)) for c in dt_drift]}")
                n_bad += 1
            else:
                print(f"ok   {name} ({len(duck)} rows)"); n_ok += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch")
            diff = (d != s) & ~(d.isna() & s.isna())
            rows = diff.any(axis=1)
            print("  duck:\n", d[rows].head(5).to_string())
            print("  spark:\n", s[rows].head(5).to_string())
            n_bad += 1
    # rows-only queries (no oracle): mirror the driver's weaker check —
    # output exists and has rows
    oracle_names = set(oracle)
    for d in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, d)
        if not os.path.isdir(path) or d in oracle_names:
            continue
        try:
            n = len(con.sql(f"SELECT 1 FROM read_parquet('{path}/*.parquet')").df())
            if n > 0:
                print(f"ok   {d} ({n} rows, rows-only)")
                n_ok += 1
            else:
                print(f"FAIL {d}: rows-only query returned 0 rows")
                n_bad += 1
        except Exception as e:
            print(f"FAIL {d}: unreadable output: {e}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
