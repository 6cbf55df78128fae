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

class ArrayColumnError(Exception):
    """An array-typed output column. The DRIVER's harness does not
    tuple-ize these — its pandas lexsort crashes on ndarray cells
    (the r7 s8_sq_quantize failure) — so the local stand-in must FLAG
    them, not paper over them. Render arrays to strings in the query
    (concat_ws / array_to_string), the a8 rule."""

def norm(df):
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object and df[c].map(
                lambda v: hasattr(v, "__len__") and not isinstance(v, (str, bytes))).any():
            raise ArrayColumnError(c)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def zero_sign_mismatch(a, b):
    """Cells where both engines agree numerically but disagree on the
    sign of zero — equal to pandas, DIFFERENT to the driver's value
    hash (the r7 t15_collocations failure)."""
    import numpy as np
    if str(a.dtype) not in ("float32", "float64"):
        return []
    av, bv = a.to_numpy(), b.to_numpy()
    zero = (av == 0) & (bv == 0) & ~np.isnan(av) & ~np.isnan(bv)
    return list(np.nonzero(zero & (np.signbit(av) != np.signbit(bv)))[0][:3])

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
        try:
            spark = norm(duckdb.connect().execute(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf())
        except ArrayColumnError as e:
            print(f"{name}: ARRAY COLUMN '{e}' (crashes the driver's "
                  f"pandas sort — render to string)"); nfail += 1; continue
        if name not in oracle:
            print(f"{name}: rows-only ({len(spark)} rows)"); continue
        try:
            duck = norm(con.execute(oracle[name]).fetchdf())
        except ArrayColumnError as e:
            print(f"{name}: ORACLE ARRAY COLUMN '{e}' (duck-side list "
                  f"output — render to string in the oracle SQL, the a8 "
                  f"rule)"); nfail += 1; continue
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
                else:
                    zs = zero_sign_mismatch(duck[c], spark[c])
                    if zs:
                        print(f"{name}: SIGN-OF-ZERO {c} at {zs} "
                              f"(pandas-equal, hash-different — "
                              f"canonicalize with Num.rnd0 / ROUND+0.0)")
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
