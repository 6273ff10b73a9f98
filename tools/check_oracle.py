#!/usr/bin/env python3
"""Local dev-loop mimic of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<query>/ parquet (Spark result), runs the
corresponding oracle SQL from oracle_sql.json in DuckDB over the same
sfDir tables, sorts columns by name and rows by all columns, and
compares values + dtypes. Dev-only; the library has no Python deps.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}"); n_fail += 1; continue
        if s.shape != d.shape:
            print(f"FAIL {name}: shape spark={s.shape} duck={d.shape}"); n_fail += 1; continue
        dtype_mismatch = [(c, str(s[c].dtype), str(d[c].dtype)) for c in s.columns
                          if str(s[c].dtype) != str(d[c].dtype)]
        bad = None
        for c in s.columns:
            sv, dv = s[c].values, d[c].values
            if np.issubdtype(s[c].dtype, np.floating) or np.issubdtype(d[c].dtype, np.floating):
                eq = (pd.isna(sv) & pd.isna(dv)) | (sv == dv)
            else:
                eq = (pd.isna(sv) & pd.isna(dv)) | (sv == dv)
            if not eq.all():
                i = int(np.argmin(eq))
                bad = (c, i, sv[i], dv[i]); break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col {c} row {i}: spark={a!r} duck={b!r}"); n_fail += 1
        else:
            extra = f"  [dtype diff: {dtype_mismatch}]" if dtype_mismatch else ""
            print(f"PASS {name} ({len(s)} rows){extra}"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
