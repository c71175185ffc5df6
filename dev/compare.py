#!/usr/bin/env python3
"""Dev-only local oracle harness (mimics the driver's t2 check).

Usage: python3 dev/compare.py <sfDir> <verifyOutDir>

Registers the sfDir parquet tables as DuckDB views, runs each SQL in
<verifyOutDir>/oracle_sql.json, loads the corresponding Spark parquet
result, sorts columns by name + rows by all columns, and diffs values.
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints and timestamps for stable compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("int32", "int16", "int8", "uint32"):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); failed.append(name); continue
        try:
            expect = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); failed.append(name); continue
        got = canon(con.execute(
            f"SELECT * FROM read_parquet({files!r})").df())
        if list(expect.columns) != list(got.columns):
            print(f"FAIL {name}: cols expect={list(expect.columns)} got={list(got.columns)}")
            failed.append(name); continue
        if len(expect) != len(got):
            print(f"FAIL {name}: rows expect={len(expect)} got={len(got)}")
            failed.append(name); continue
        diffs = []
        for c in expect.columns:
            e, g = expect[c], got[c]
            if str(e.dtype) != str(g.dtype):
                diffs.append(f"dtype[{c}]: {e.dtype} vs {g.dtype}")
            eq = (e == g) | (e.isna() & g.isna())
            if not eq.all():
                i = int((~eq).idxmax())
                diffs.append(f"val[{c}] row {i}: {e[i]!r} vs {g[i]!r} "
                             f"({int((~eq).sum())} diffs)")
        if diffs:
            print(f"FAIL {name}: " + "; ".join(diffs[:4])); failed.append(name)
        else:
            print(f"ok   {name} ({len(got)} rows)")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} match")
    return 1 if failed else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
