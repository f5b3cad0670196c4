#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read Verify.scala's
parquet dumps + oracle_sql.json, run each oracle in DuckDB against the same
sf tables, and compare (row count, column names, sorted-row values).

Usage: python3 tools/local_verify.py <sfDir> <outDir> [query ...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    pq = f"{outdir}/{name}"
    if not os.path.isdir(pq):
        print(f"FAIL {name}: no spark output dir"); fail += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{pq}/*.parquet'").df()
        want = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fail += 1; continue
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        print(f"FAIL {name}: columns {gc} vs {wc}"); fail += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); fail += 1; continue
    g = got[gc].copy(); w = want[wc].copy()
    # normalize: timestamps → str, floats bit-compared
    for df in (g, w):
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime"):
                df[c] = df[c].astype(str)
    g = g.sort_values(gc, kind="mergesort").reset_index(drop=True)
    w = w.sort_values(wc, kind="mergesort").reset_index(drop=True)
    try:
        pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
        print(f"PASS {name} ({len(got)} rows)")
    except AssertionError as e:
        print(f"FAIL {name}: value mismatch: {str(e)[:500]}")
        diff = (g != w) & ~(g.isna() & w.isna())
        bad = diff.any(axis=1)
        if bad.any():
            i = bad.idxmax()
            print("  first bad row got :", g.loc[i].to_dict())
            print("  first bad row want:", w.loc[i].to_dict())
        fail += 1
print("ALL PASS" if fail == 0 else f"{fail} FAILURES")
sys.exit(1 if fail else 0)
