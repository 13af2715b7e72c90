#!/usr/bin/env python3
"""Dev-only self-check mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <outDir>
Reads outDir/<name> parquet dirs (written by graft.Verify) and
outDir/oracle_sql.json, runs each oracle in DuckDB against the sfDir
tables, and compares row count, schema (column names), and a hash of
the value matrix with columns sorted by name and rows sorted.
"""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def h(df: pd.DataFrame) -> str:
    s = df.to_csv(index=False, float_format="%.6f")
    return hashlib.md5(s.encode()).hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = []
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); fails.append(name); continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files])
        except Exception as e:
            print(f"FAIL {name}: can't read spark output: {e}"); fails.append(name); continue
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}"); fails.append(name); continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: cols {list(a.columns)} vs {list(b.columns)}"); fails.append(name); continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); fails.append(name); continue
        if h(a) != h(b):
            print(f"FAIL {name}: hash mismatch ({len(a)} rows)")
            merged = a.merge(b, indicator=True, how="outer")
            diff = merged[merged._merge != "both"]
            print(diff.head(6).to_string())
            fails.append(name); continue
        print(f"OK   {name} ({len(a)} rows)")
    # queries that crashed in Verify leave a marker file — print the
    # actual error instead of the bare "no spark output" row
    for f in sorted(glob.glob(f"{out_dir}/_FAILED/*")):
        name = f.split("/")[-1]
        msg = open(f).read().strip().splitlines()[0][:160]
        print(f"FAIL {name}: verify crashed: {msg}")
        if name not in fails:
            fails.append(name)
    # rows-only queries (no oracle)
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name == "_FAILED":
            continue
        if name not in oracles:
            files = glob.glob(f"{d}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"{'OK  ' if n > 0 else 'FAIL'} {name} (rows-only: {n})")
            if n == 0: fails.append(name)
    print(f"\n{len(oracles)} oracle queries, {len(fails)} failures: {fails}")
    return 1 if fails else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
