#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle compare.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name>/ parquet (written by graft.Verify), runs
the matching SQL from oracle_sql.json in DuckDB with views over the sf_dir
tables, sorts columns by name (mirroring the driver), and diffs values.
Dev tool only — not part of the engine.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stable row order for compare (driver hashing detail unknown; we demand
    # our queries be totally ordered anyway, so compare both as-is and sorted)
    return df.reset_index(drop=True)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        spark_df = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        try:
            duck_df = norm(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_bad += 1; continue
        ok_shape = spark_df.shape == duck_df.shape
        ok_cols = list(spark_df.columns) == list(duck_df.columns)
        if not (ok_shape and ok_cols):
            print(f"FAIL {name}: shape {spark_df.shape} vs {duck_df.shape}, "
                  f"cols {list(spark_df.columns)} vs {list(duck_df.columns)}")
            n_bad += 1; continue
        # exact compare on string repr per cell (hash-match proxy)
        s = spark_df.astype(str).reset_index(drop=True)
        o = duck_df.astype(str).reset_index(drop=True)
        if s.equals(o):
            print(f"OK   {name} ({len(s)} rows)"); n_ok += 1
        else:
            # also try row-sorted compare to distinguish ordering-only diffs
            s2 = s.sort_values(list(s.columns)).reset_index(drop=True)
            o2 = o.sort_values(list(o.columns)).reset_index(drop=True)
            tag = "ORDER-ONLY " if s2.equals(o2) else ""
            diff = (s != o).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL {name}: {tag}value mismatch at rows {list(idx)}")
            for i in idx:
                print(f"  spark: {spark_df.iloc[i].to_dict()}")
                print(f"  duck : {duck_df.iloc[i].to_dict()}")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
