#!/usr/bin/env python3
"""Per-oracle DuckDB wall-time profile.

Usage: oracle_profile.py [sfdir] [verify_out] [only_csv]

Runs every oracle in <verify_out>/oracle_sql.json against DuckDB views over
<sfdir>/*.parquet — one fresh forked process per oracle (the allocator-
fragmentation isolation oracle_check.py uses) — and prints per-oracle wall
seconds sorted descending, plus the total. This is the cost the DRIVER's
correctness gate pays per key: keep the worst key bounded (see
Round15Spec's budget pin) or the gate stops completing (r14 lesson:
CORRECTNESS_r14.json came back empty because the oracle pass could not
finish under driver conditions).

Results land in ORACLE_COST.tsv next to the verify_out dump so a round
artifact (docs/ORACLE_COST.md) can be refreshed from it.
"""
import glob
import json
import os
import sys
import time

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None


def _child(sfdir, sql):
    import duckdb as dk
    c = dk.connect()
    c.sql("SET temp_directory='/tmp/duckdb_oracle_spill'")
    mem_gb = max(4, int(os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
                        * 0.70 / (1 << 30)))
    c.sql(f"SET memory_limit='{mem_gb}GB'")
    for pth in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(pth)[: -len(".parquet")]
        c.sql(f"CREATE VIEW {name} AS SELECT * FROM '{pth}'")
    c.sql(sql).fetchall()


def main():
    import multiprocessing as mp
    ctx = mp.get_context("fork")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    rows = []
    for name in sorted(oracle):
        if only and name not in only:
            continue
        t0 = time.monotonic()
        p = ctx.Process(target=_child, args=(sfdir, oracle[name]))
        p.start()
        p.join()
        dt = time.monotonic() - t0
        status = "ok" if p.exitcode == 0 else f"exit={p.exitcode}"
        rows.append((dt, name, status, len(oracle[name])))
        print(f"{dt:8.2f}s  {name}  [{status}]  sql={len(oracle[name])}B", flush=True)
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    with open(f"{out}/ORACLE_COST.tsv", "w") as f:
        f.write("seconds\tname\tstatus\tsql_bytes\n")
        for dt, name, status, nb in rows:
            f.write(f"{dt:.2f}\t{name}\t{status}\t{nb}\n")
    print(f"\nTOTAL {total:.1f}s over {len(rows)} oracles; worst:")
    for dt, name, status, nb in rows[:12]:
        print(f"  {dt:7.2f}s  {name}  [{status}]  {nb}B")


if __name__ == "__main__":
    main()
