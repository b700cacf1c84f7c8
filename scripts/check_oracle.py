#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare each
Verify-dumped parquet result against its DuckDB oracle SQL.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Comparison: sort columns by name, sort rows by all columns, compare
cell-by-cell (exact for ints/strings/lists; exact bitwise for floats —
the engine is built so aggregates are bit-reproducible).
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # lists/arrays -> tuples so they sort/compare
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple)) or
                     type(v).__name__ == "ndarray").any():
            df[c] = df[c].map(lambda v: tuple(v) if v is not None and
                              not (isinstance(v, float) and math.isnan(v)) else None)
        # tz-aware -> naive UTC for comparison
        if str(df[c].dtype).startswith("datetime64[ns,"):
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
        if str(df[c].dtype).startswith("datetime64") and not str(df[c].dtype).startswith("datetime64[ns]"):
            df[c] = df[c].astype("datetime64[ns]")
    return df.sort_values(by=list(df.columns), kind="mergesort",
                          na_position="first").reset_index(drop=True)


def diff_report(name, spark_df, oracle_df):
    if list(spark_df.columns) != list(oracle_df.columns):
        print(f"  [schema] spark={list(spark_df.columns)}\n           oracle={list(oracle_df.columns)}")
        return
    if len(spark_df) != len(oracle_df):
        print(f"  [rows] spark={len(spark_df)} oracle={len(oracle_df)}")
    n = min(len(spark_df), len(oracle_df))
    bad = 0
    for c in spark_df.columns:
        a, b = spark_df[c].iloc[:n], oracle_df[c].iloc[:n]
        neq = []
        for i in range(n):
            x, y = a.iloc[i], b.iloc[i]
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y:
                    neq.append((i, x, y))
            elif (x is None) != (y is None) or not (x == y or (pd.isna(x) and pd.isna(y))):
                neq.append((i, x, y))
        if neq:
            bad += 1
            i, x, y = neq[0]
            print(f"  [col {c}] {len(neq)} diffs; first at row {i}: spark={x!r} oracle={y!r}")
    if bad == 0 and len(spark_df) == len(oracle_df):
        print("  (no cell diffs after sorting — ordering-only mismatch?)")


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok, fail = [], []
    for name, sql in sorted(oracle_sql.items()):
        try:
            spark_df = canon(pd.read_parquet(f"{out_dir}/{name}"))
            oracle_df = canon(con.sql(sql).df())
            same_schema = list(spark_df.columns) == list(oracle_df.columns)
            same = same_schema and spark_df.equals(oracle_df)
            if not same and same_schema and len(spark_df) == len(oracle_df):
                # .equals is strict about dtype; retry cell-wise
                same = all(
                    (spark_df[c].isna() & oracle_df[c].isna() |
                     (spark_df[c] == oracle_df[c])).all()
                    for c in spark_df.columns)
            if same:
                ok.append(name)
                print(f"PASS {name} ({len(spark_df)} rows)")
            else:
                fail.append(name)
                print(f"FAIL {name}")
                diff_report(name, spark_df, oracle_df)
        except Exception as e:
            fail.append(name)
            print(f"ERROR {name}: {type(e).__name__}: {e}")
    print(f"\n{len(ok)} pass / {len(fail)} fail")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
