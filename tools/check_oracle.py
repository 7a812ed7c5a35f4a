#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify,
then compare each query's parquet output against its DuckDB oracle SQL
two ways:
 1. exact value equality (column names sorted, rows sorted);
 2. the driver's hash: md5 of to_csv() after column-name sort + row
    sort, Spark side read via pd.read_parquet (decimals stay Decimal),
    oracle side via duckdb .df() (decimals degrade to float64).
    Empirically this reproduced round 1's CORRECTNESS_r01.json
    pass/fail set exactly, so treat a csv-hash mismatch as a gate
    failure even when values compare equal (it means the two sides
    RENDER differently, e.g. Decimal('1.20') vs 1.2).

Usage: python3 tools/check_oracle.py [sfdir] [outdir] [--no-verify] [query ...]
"""
import hashlib, json, math, subprocess, sys
from pathlib import Path

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
flags = set(a for a in sys.argv[3:] if a.startswith("--"))
only = [a for a in sys.argv[3:] if not a.startswith("--")]

if "--no-verify" not in flags:
    r = subprocess.run(
        ["sbt", f'runMain graft.Verify {SF} {OUT}'],
        capture_output=True, text=True, cwd="/root/repo")
    if r.returncode != 0:
        print(r.stdout[-3000:], r.stderr[-3000:])
        sys.exit(1)

oracle = json.loads(Path(f"{OUT}/oracle_sql.json").read_text())
con = duckdb.connect()
# GRAFT_DUCKDB_MEM (e.g. "60GB"): cap DuckDB so a quadratic oracle
# (the q137/q139 class) errors/spills instead of drawing the OS OOM
# killer — which kills SILENTLY and can take concurrent JVMs with it.
# sf1_sweep.py relies on this for per-query isolation on shared boxes.
import os
if os.environ.get("GRAFT_DUCKDB_MEM"):
    con.sql(f"SET memory_limit='{os.environ['GRAFT_DUCKDB_MEM']}'")
    con.sql(f"SET temp_directory='/tmp/graft_duckdb_spill'")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

from decimal import Decimal

def driver_hash(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            first = next((v for v in df[c] if v is not None), None)
            if isinstance(first, Decimal):
                continue  # compare decimals exactly, never via float
            try:
                df[c] = df[c].astype(float)
            except (ValueError, TypeError):
                pass
    return df.sort_values(list(df.columns)).reset_index(drop=True)

fails = []
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        raw_got = pd.read_parquet(f"{OUT}/{name}")
        if driver_hash(raw_got) != driver_hash(con.sql(sql).df()):
            fails.append((name, "driver csv-hash mismatch "
                          "(types/rendering differ between engines)"))
            continue
        got = canon(raw_got)
        # .arrow() keeps DECIMAL as Decimal (df() degrades it to float64)
        want = canon(con.sql(sql).arrow().to_pandas())
        if list(got.columns) != list(want.columns):
            fails.append((name, f"cols {list(got.columns)} vs {list(want.columns)}"))
            continue
        if len(got) != len(want):
            fails.append((name, f"rows {len(got)} vs {len(want)}"))
            continue
        bad = None
        for c in got.columns:
            a, b = got[c], want[c].astype(got[c].dtype) \
                if got[c].dtype != want[c].dtype else want[c]
            if got[c].dtype.kind == "f":
                neq = ~((a == b) | (a.isna() & b.isna()))
            else:
                neq = ~((a == b) | (a.isna() & b.isna()))
            if neq.any():
                i = neq.idxmax()
                bad = f"col {c} row {i}: {a[i]!r} vs {b[i]!r}"
                break
        if bad:
            fails.append((name, bad))
        else:
            print(f"  OK   {name} ({len(got)} rows)")
    except Exception as e:
        fails.append((name, f"EXC {type(e).__name__}: {str(e)[:200]}"))

for name, why in fails:
    print(f"  FAIL {name}: {why}")
print(f"{len(oracle) - len(fails)}/{len(oracle)} queries match" +
      (f" ({SF})" if not only else ""))
sys.exit(1 if fails else 0)
