#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json entry in DuckDB over the sfDir parquet tables,
reads the Spark result parquet, sorts columns by name and rows by all
columns, and compares values AND dtypes cell-exactly.
"""
import sys, json, glob
import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

def norm(df):
    df = df[sorted(df.columns)]
    # list/array cells (e.g. token or code arrays) aren't hashable —
    # convert to tuples so sorting and equality work cell-exactly
    for c in df.columns:
        if df[c].dtype == object and df[c].map(
                lambda v: hasattr(v, "__len__") and not isinstance(v, (str, bytes))).any():
            df[c] = df[c].map(lambda v: tuple(v) if hasattr(v, "__len__")
                              and not isinstance(v, (str, bytes)) else v)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results_dirs = {p.rstrip("/").split("/")[-1] for p in glob.glob(f"{outdir}/*/")}
    nfail = 0
    for name in sorted(results_dirs):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"{name}: NO OUTPUT"); nfail += 1; continue
        spark = norm(duckdb.connect().execute(
            f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf())
        if name not in oracle:
            print(f"{name}: rows-only ({len(spark)} rows)"); continue
        try:
            duck = norm(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}"); nfail += 1; continue
        ok = True
        if list(duck.columns) != list(spark.columns):
            print(f"{name}: COLUMN MISMATCH duck={list(duck.columns)} spark={list(spark.columns)}")
            ok = False
        elif len(duck) != len(spark):
            print(f"{name}: ROWCOUNT duck={len(duck)} spark={len(spark)}")
            ok = False
        else:
            for c in duck.columns:
                if str(duck[c].dtype) != str(spark[c].dtype):
                    print(f"{name}: DTYPE {c} duck={duck[c].dtype} spark={spark[c].dtype}")
                    ok = False
                elif not duck[c].equals(spark[c]):
                    bad = duck[c] != spark[c]
                    idx = bad[bad].index[:3]
                    print(f"{name}: VALUES {c} differ at {list(idx)}: "
                          f"duck={[duck[c][i] for i in idx]} spark={[spark[c][i] for i in idx]}")
                    ok = False
        if ok:
            print(f"{name}: MATCH ({len(duck)} rows)")
        else:
            nfail += 1
    for name in sorted(set(oracle) - results_dirs):
        print(f"{name}: oracle present but no Spark output"); nfail += 1
    sys.exit(1 if nfail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
