#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check_oracle.py <sf_dir> <verify_out_dir>

Loads every <name>/ parquet result written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB over the same testdata
parquets, sorts columns by name and rows by all columns, and compares
values exactly. Reports per-query PASS/FAIL with first diffs.
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # Sort RAW, exactly like the driver does — no ndarray->tuple conversion
    # before the sort. A query that returns a raw array column must crash
    # here the same way it crashes in the driver (r2's q60 lesson: the local
    # checker masked a driver failure by canonicalizing arrays pre-sort).
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    # normalize cell values to comparable primitives (post-sort, compare only)
    def norm(v):
        if isinstance(v, float):
            return round(v, 9)
        if hasattr(v, "item"):
            try:
                return norm(v.item())
            except Exception:
                pass
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return tuple(norm(x) for x in v)
        return v
    return df.map(norm)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            status = "ROWS-ONLY" if len(got) > 0 else "EMPTY!"
            print(f"{name:28s} {status}  rows={len(got)}")
            n_pass += len(got) > 0
            n_fail += len(got) == 0
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"{name:28s} ORACLE-SQL-ERROR: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"{name:28s} FAIL cols: spark={list(g.columns)} oracle={list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"{name:28s} FAIL rows: spark={len(g)} oracle={len(e)}")
            n_fail += 1
            continue
        neq = (g.astype(str) != e.astype(str))
        if neq.any().any():
            bad = neq.any(axis=1)
            i = bad.idxmax()
            print(f"{name:28s} FAIL values at row {i}:")
            print("  spark :", g.loc[i].to_dict())
            print("  oracle:", e.loc[i].to_dict())
            n_fail += 1
        else:
            print(f"{name:28s} PASS  rows={len(g)}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
