#!/usr/bin/env python
"""Replicate the driver's correctness gate locally: run the FIRST 50
registry queries at sf0.01 and compare each against its DuckDB oracle
(native column order, row count, value equality) — the exact check the
driver hashes. The local pytest gate runs at sf0.001; this catches any
sf-dependent drift in the driver's window before the driver does.

Usage: python jobs/window_sweep.py          (first 50 — the driver window)
       python jobs/window_sweep.py --all    (every registered query — the
       tail is otherwise only oracle-checked at sf0.001 by pytest, so this
       is the one check that catches sf-dependent drift OUTSIDE the window)
"""
import glob
import os
import sys
import time

import ray

ray.init(address="local", num_cpus=32, include_dashboard=False)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import logging

logging.getLogger("ray.data").setLevel(logging.ERROR)
import duckdb
import numpy as np
import pandas as pd

import __ray_entry__ as e
qs = e.queries(); osql = e.oracle_sql()
sf = "/root/testdata/sf0.01"
for i, a in enumerate(sys.argv[1:], 1):
    if a == "--sf-dir":          # e.g. --sf-dir /root/testdata/sf0.1 —
        sf = sys.argv[i + 1]     # certify the registry at a scale neither
        break                    # the driver (0.01) nor pytest (0.001) runs
con = duckdb.connect()
for p in glob.glob(sf + "/*.parquet"):
    con.sql(f"CREATE VIEW {os.path.basename(p)[:-8]} AS SELECT * FROM read_parquet('{p}')")
window = list(qs) if "--all" in sys.argv[1:] else list(qs)[:50]
bad = []
for name in window:
    t0 = time.time()
    try:
        res = qs[name](sf)
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        if not isinstance(df, pd.DataFrame):
            raise TypeError(f"unsupported result type {type(res).__name__}")
    except Exception as ex:
        bad.append((name, f"engine error: {ex}")); print(name, "ENGINE ERROR", ex); continue
    sql = osql.get(name)
    if sql is None:
        print(f"{name:38s} rows-only {len(df)} rows {time.time()-t0:.1f}s"); continue
    try:
        odf = con.sql(sql).df()
    except Exception as ex:
        bad.append((name, f"oracle error: {ex}")); print(name, "ORACLE ERROR", ex); continue
    ok = True; why = ""
    if list(df.columns) != list(odf.columns):
        ok, why = False, f"cols {list(df.columns)} vs {list(odf.columns)}"
    elif len(df) != len(odf):
        ok, why = False, f"rows {len(df)} vs {len(odf)}"
    else:
        a = df.sort_values(list(df.columns)).reset_index(drop=True)
        b = odf.sort_values(list(odf.columns)).reset_index(drop=True)
        for c in a.columns:
            if np.issubdtype(a[c].dtype, np.number) and np.issubdtype(b[c].dtype, np.number):
                # EXACT equality (NaN==NaN), mirroring the driver's value
                # hash — allclose's rtol would certify values the hash
                # rejects (1e-5 relative ≈ 1e3 absolute on 1e8-scale sums).
                x = a[c].to_numpy(dtype=float); y = b[c].to_numpy(dtype=float)
                if not ((x == y) | (np.isnan(x) & np.isnan(y))).all():
                    ok, why = False, f"values differ in {c}"; break
            else:
                if not (a[c].astype(str) == b[c].astype(str)).all():
                    ok, why = False, f"values differ in {c}"; break
    print(f"{name:38s} {'OK' if ok else 'FAIL ' + why} {time.time()-t0:.1f}s")
    if not ok: bad.append((name, why))
print("----"); print("FAILURES:", bad if bad else "none")
ray.shutdown()
