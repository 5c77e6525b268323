#!/usr/bin/env python
"""Local mimic of the driver's correctness gate: for each SparkEntry query
output under OUTDIR, run the corresponding oracle SQL in DuckDB (with the
sfDir tables registered as views) and diff rows/schema/values.

Usage: python tools/validate_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, '*.parquet')):
    name = os.path.basename(p).replace('.parquet', '')
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(outdir, 'oracle_sql.json')))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            try:
                df[c] = pd.to_numeric(df[c], errors='ignore')
            except Exception:
                pass
    df = df.sort_values(by=list(df.columns), kind='mergesort').reset_index(drop=True)
    return df

fails = []
# a query that crashed in Verify writes no output dir (and Verify deletes
# any stale one) — that must read as a failure here, not be silently
# skipped by the listdir loop below
for name in sorted(oracle):
    if not os.path.isdir(os.path.join(outdir, name)):
        print(f"{name}: MISSING-OUTPUT (query crashed in Verify?)")
        fails.append(name)
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    spark_df = con.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')").df()
    if name not in oracle:
        print(f"{name}: NO-ORACLE rows={len(spark_df)}")
        continue
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE-SQL-ERROR {e}")
        fails.append(name)
        continue
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        print(f"{name}: SCHEMA-MISMATCH spark={list(a.columns)} duck={list(b.columns)}")
        fails.append(name); continue
    if len(a) != len(b):
        print(f"{name}: ROWCOUNT-MISMATCH spark={len(a)} duck={len(b)}")
        fails.append(name); continue
    neq = None
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
            import numpy as np
            ok = ((av.isna() & bv.isna()) | (np.isclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True))).all()
        else:
            ok = (av.astype(str) == bv.astype(str)).all()
        if not ok:
            mism = (av.astype(str) != bv.astype(str))
            idx = mism[mism].index[:3].tolist()
            neq = (c, [(av[i], bv[i]) for i in idx])
            break
    if neq:
        print(f"{name}: VALUE-MISMATCH col={neq[0]} examples={neq[1]}")
        fails.append(name)
    else:
        print(f"{name}: OK rows={len(a)}")

print(f"\n{len(fails)} failures: {fails}" if fails else "\nALL MATCH")
sys.exit(1 if fails else 0)
