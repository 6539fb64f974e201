#!/usr/bin/env python
"""Adversarial-data certification: replay every oracle-paired registry
query on MUTATED copies of the test tables, with DuckDB reading the same
mutated parquet, under the driver-strict compare (native column order,
row count, bit-exact values).

The six manual round-5 review sweeps each found null/edge bugs the
null-free synthetic tables could never expose (NaN poisoning, INT64_MIN
scatter, float64 key degradation...). This harness systematizes that
hunt: any engine/oracle divergence, or any engine crash the oracle
survives, is a finding.

Mutations (each written once to /tmp/mutdata/<name>/):
  nulls    every column of every table gets ~4% NULLs (group/join/FK keys
           included — the engines' SQL null semantics must agree, not
           avoid) EXCEPT each table's own primary key: entity ids are
           non-null by the synthesized tables' contract, and nulling a
           unique id only tests "merge all anonymous rows into one
           entity", a definitional quagmire with no 100-TB analog
  empty    every table is zero rows, schema preserved
  skew     key-ish columns (*key, *_id, *type, lang, source, label) get
           30% of rows overwritten with their modal value — EXCEPT each
           table's own primary key (duplicating entity ids violates the
           tables' documented uniqueness contract and makes oracle
           self-joins explode; FK/group-key skew is the interesting case)
  unicode  documents.text gets \x0b/nbsp/zero-width/astral prefixes and
           suffixes, empty strings, and whitespace-only docs
  none     identity copy — a targeted clean-data oracle check
           (--only q1,q2 replays just those queries against DuckDB)

Usage: python jobs/mutation_sweep.py [nulls empty skew unicode] [--sf DIR]
           [--only q1,q2] [--keep]
       (no args = all four, base tables from /root/testdata/sf0.001;
        --only restricts to named queries, --keep reuses the mutated
        tables already on disk)
"""
import glob
import os
import shutil
import sys
import time
import zlib

import ray

ray.init(address="local", num_cpus=32, include_dashboard=False)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import logging

logging.getLogger("ray.data").setLevel(logging.ERROR)
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as e

BASE = "/root/testdata/sf0.001"
for i, a in enumerate(sys.argv):
    if a == "--sf":
        BASE = sys.argv[i + 1]
KEYISH = ("key", "_id", "type", "lang", "source", "label")
# each table's own primary key: never skewed (entity ids are unique by
# the tables' documented contract; FK / group-key columns stay fair game)
PRIMARY = {"r_regionkey", "n_nationkey", "c_custkey", "s_suppkey",
           "p_partkey", "o_orderkey", "event_id", "doc_id", "vec_id"}


def _null_out(col: pa.ChunkedArray, frac: float, seed: int) -> pa.Array:
    arr = col.combine_chunks()
    n = len(arr)
    rng = np.random.Generator(np.random.Philox(key=[seed, 0x4D55]))
    mask = rng.random(n) < frac
    if not mask.any():
        return arr
    # take() with a null index yields null — works for EVERY type
    # (pc.if_else rejects nested list columns like `embedding`)
    idx = pa.array([None if m else i for i, m in enumerate(mask)], pa.int64())
    return arr.take(idx)


def mutate(kind: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for p in sorted(glob.glob(BASE + "/*.parquet")):
        name = os.path.basename(p)[:-8]
        t = pq.read_table(p)
        if kind == "nulls":
            cols = [t.column(i).combine_chunks() if c in PRIMARY else
                    _null_out(t.column(i), 0.04, zlib.crc32(f"{name}.{c}".encode()))
                    for i, c in enumerate(t.column_names)]
            t = pa.table(dict(zip(t.column_names, cols)))
        elif kind == "empty":
            t = t.schema.empty_table()
        elif kind == "skew":
            rng = np.random.Generator(
                np.random.Philox(key=[zlib.crc32(name.encode()), 0x534B]))
            cols = {}
            for c in t.column_names:
                arr = t.column(c).combine_chunks()
                if (any(k in c for k in KEYISH) and c not in PRIMARY
                        and len(arr) and arr.null_count < len(arr)):
                    vc = pa.compute.value_counts(arr.drop_null())
                    modal = vc.field("values").take(
                        [int(np.argmax(vc.field("counts")))])[0].as_py()
                    mask = rng.random(len(arr)) < 0.30
                    arr = pa.compute.if_else(
                        pa.array(~mask), arr,
                        pa.array([modal] * len(arr), arr.type))
                cols[c] = arr
            t = pa.table(cols)
        elif kind == "unicode" and name == "documents":
            txt = t.column("text").to_pylist()
            rng = np.random.Generator(np.random.Philox(key=[7, 0x554E]))
            r = rng.random(len(txt))
            for i, s in enumerate(txt):
                if s is None:
                    continue
                if r[i] < 0.08:
                    txt[i] = "\x0b " + s + "​\U0001f600"
                elif r[i] < 0.14:
                    txt[i] = "  \t" + s + " \r\n"
                elif r[i] < 0.17:
                    txt[i] = ""
                elif r[i] < 0.20:
                    txt[i] = " \t  "
            t = t.set_column(t.column_names.index("text"), "text",
                             pa.array(txt, pa.string()))
        pq.write_table(t, os.path.join(out_dir, name + ".parquet"))


def compare(df: pd.DataFrame, odf: pd.DataFrame):
    if len(df) == 0 and len(odf) == 0:
        # Ray Data drops 0-row blocks at iteration, so an empty Dataset
        # to_pandas()-es column-less; when BOTH engines agree the result
        # is empty, the schema loss is that documented artifact, not a
        # divergence (operators whose empty results are row-bounded and
        # driver-visible return schema'd Arrow via util.bounded_table).
        return None
    if list(df.columns) != list(odf.columns):
        return f"cols {list(df.columns)} vs {list(odf.columns)}"
    if len(df) != len(odf):
        return f"rows {len(df)} vs {len(odf)}"
    a = df.sort_values(list(df.columns)).reset_index(drop=True)
    b = odf.sort_values(list(odf.columns)).reset_index(drop=True)
    for c in a.columns:
        if np.issubdtype(a[c].dtype, np.number) and np.issubdtype(b[c].dtype, np.number):
            x = a[c].to_numpy(dtype=float)
            y = b[c].to_numpy(dtype=float)
            if not ((x == y) | (np.isnan(x) & np.isnan(y))).all():
                return f"values differ in {c}"
        else:
            # None (pyarrow bool null) and NaN (duckdb bool null) are both
            # SQL NULL — normalize before the string compare
            x = a[c].astype(object).where(a[c].notna(), "<NULL>").astype(str)
            y = b[c].astype(object).where(b[c].notna(), "<NULL>").astype(str)
            if not (x == y).all():
                return f"values differ in {c}"
    return None


def run(kind: str, only: set | None = None, keep: bool = False) -> list:
    sfdir = f"/tmp/mutdata/{kind}"
    if not (keep and os.path.isdir(sfdir) and glob.glob(sfdir + "/*.parquet")):
        shutil.rmtree(sfdir, ignore_errors=True)
        mutate(kind, sfdir)
    qs, osql = e.queries(), e.oracle_sql()
    if only:
        qs = {n: f for n, f in qs.items() if n in only}
    con = duckdb.connect()
    for p in glob.glob(sfdir + "/*.parquet"):
        con.sql(f"CREATE VIEW {os.path.basename(p)[:-8]} AS "
                f"SELECT * FROM read_parquet('{p}')")
    bad = []
    for name in qs:
        t0 = time.time()
        try:
            res = qs[name](sfdir)
            df = res.to_pandas() if hasattr(res, "to_pandas") else res
            if not isinstance(df, pd.DataFrame):
                raise TypeError(f"unsupported result type {type(res).__name__}")
        except Exception as ex:
            bad.append((kind, name, f"engine error: {type(ex).__name__}: {ex}"))
            print(f"[{kind}] {name} ENGINE ERROR {type(ex).__name__}: {str(ex)[:200]}")
            continue
        sql = osql.get(name)
        if sql is None:
            print(f"[{kind}] {name:38s} rows-only {len(df)} rows {time.time()-t0:.1f}s")
            continue
        try:
            odf = con.sql(sql).df()
        except Exception as ex:
            # the oracle choking on the mutation (e.g. DuckDB arithmetic on
            # an all-null column) is a data-shape artifact, not a finding —
            # but the ENGINE side already ran without crashing above
            print(f"[{kind}] {name:38s} oracle-skip ({type(ex).__name__})")
            continue
        why = compare(df, odf)
        print(f"[{kind}] {name:38s} {'OK' if why is None else 'FAIL ' + why} "
              f"{time.time()-t0:.1f}s")
        if why:
            bad.append((kind, name, why))
    return bad


only: set | None = None
keep = "--keep" in sys.argv
for i, a in enumerate(sys.argv):
    if a == "--only":
        only = set(sys.argv[i + 1].split(","))
args = [a for i, a in enumerate(sys.argv[1:], 1)
        if not a.startswith("--") and a != BASE
        and sys.argv[i - 1] not in ("--sf", "--only")]
kinds = args or ["nulls", "empty", "skew", "unicode"]
all_bad = []
for kind in kinds:
    all_bad += run(kind, only=only, keep=keep)
print("----")
print("FAILURES:", all_bad if all_bad else "none")
ray.shutdown()
sys.exit(1 if all_bad else 0)
