#!/usr/bin/env python3
"""Local pre-validation: mirror the driver's DuckDB-oracle compare.

Usage: oracle_check.py [sfdir] [verify_out]
Reads <verify_out>/<name>/ parquet (Spark dump) and <verify_out>/oracle_sql.json,
runs each oracle against DuckDB views over <sfdir>/*.parquet, and compares
(sorted columns-by-name, sorted rows, exact values; floats compared exactly
first, then with 1e-9 tolerance reported separately).
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

def _duck_child(sfdir, sql, q):
    """Child-process body: run ONE oracle in a fresh process and ship the
    DataFrame back. Full process isolation is the only reliable reset:
    heavy list-valued oracles leave the allocator so fragmented that
    LATER queries fail tiny allocations even on fresh connections (r14:
    the sf0.1 pass failed queries that pass in isolation, differently
    each run). A spawned process costs ~1 s — noise against the heavy
    oracles, and the per-query memory cap + spill dir keep any single
    query out-of-core instead of fatal.
    """
    import duckdb as dk
    c = dk.connect()
    c.sql("SET temp_directory='/tmp/duckdb_oracle_spill'")
    # cap at 70% of physical RAM (never a host-specific constant: a fixed
    # 48GB on a smaller host exceeds physical memory and heavy oracles get
    # OOM-killed instead of spilling to the temp directory)
    mem_gb = max(4, int(os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
                        * 0.70 / (1 << 30)))
    c.sql(f"SET memory_limit='{mem_gb}GB'")
    for pth in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(pth)[: -len(".parquet")]
        c.sql(f"CREATE VIEW {name} AS SELECT * FROM '{pth}'")
    q.put(c.sql(sql).df())

def run_oracle(sql: str) -> pd.DataFrame:
    import multiprocessing as mp
    # fork, not spawn: spawn re-imports this module top-level (no main
    # guard); fork inherits the parent copy-on-write and the parent never
    # executes DuckDB queries itself, so every child starts allocator-clean
    ctx = mp.get_context("fork")
    q = ctx.Queue()
    proc = ctx.Process(target=_duck_child, args=(sfdir, sql, q))
    proc.start()
    try:
        import queue as _queue
        while True:
            try:
                df = q.get(timeout=5)
                break
            except _queue.Empty:
                if not proc.is_alive():
                    raise RuntimeError(
                        f"oracle child died (exit={proc.exitcode}) without a result")
    finally:
        proc.join()
    return df

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df

fails = []
for name in sorted(oracle):
    spark_dir = f"{out}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark dump")
        fails.append(name)
        continue
    try:
        sdf = canon(pd.concat([pd.read_parquet(f) for f in glob.glob(f"{spark_dir}/*.parquet")]))
        ddf = canon(run_oracle(oracle[name]))
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}")
        fails.append(name)
        continue
    if list(sdf.columns) != list(ddf.columns):
        print(f"FAIL {name}: columns spark={list(sdf.columns)} duck={list(ddf.columns)}")
        fails.append(name)
        continue
    if len(sdf) != len(ddf):
        print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}")
        fails.append(name)
        continue
    mismatch = None
    for c in sdf.columns:
        a, b = sdf[c].tolist(), ddf[c].tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            xn = x is None or (isinstance(x, float) and math.isnan(x))
            yn = y is None or (isinstance(y, float) and math.isnan(y))
            if xn and yn:
                continue
            if xn != yn or x != y:
                approx = (
                    isinstance(x, float)
                    and isinstance(y, float)
                    and not (xn or yn)
                    and abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y))
                )
                mismatch = (c, i, x, y, approx)
                break
        if mismatch:
            break
    if mismatch:
        c, i, x, y, approx = mismatch
        tag = "CLOSE" if approx else "FAIL"
        print(f"{tag} {name}: col={c} row={i} spark={x!r} duck={y!r}")
        fails.append(name)
    else:
        print(f"ok   {name}: {len(sdf)} rows")

# queries with no oracle: just report row counts
for d in sorted(glob.glob(f"{out}/*/")):
    name = os.path.basename(d.rstrip("/"))
    if name not in oracle:
        try:
            n = sum(len(pd.read_parquet(f)) for f in glob.glob(f"{d}/*.parquet"))
            print(f"rows {name}: {n} (no oracle)")
        except Exception as e:
            print(f"rows {name}: unreadable: {e}")

sys.exit(1 if fails else 0)
