#!/usr/bin/env python3
"""sf1 oracle breadth sweep (round 13, VERDICT r12 "next round" #7).

Round 12 proved 20 scale-sensitive queries at sf1; this drives the
WHOLE query set through the same gate with per-query isolation, so
one infeasible oracle (the documented q137/q139 class: DuckDB
materializes a quadratic CTE the engine never builds, >130 GB) kills
neither the sweep nor the box. Each query's compare runs in its own
subprocess (tools/check_oracle.py --no-verify <q>) under a wall
timeout; the outcome is recorded q-by-q:

  OK       — rows+schema+hash match the DuckDB oracle at sf1
  FAIL     — a real mismatch (a bug: investigate immediately)
  TIMEOUT  — oracle exceeded --timeout seconds (named exclusion)
  CRASH    — oracle process died (OOM-killed etc.; named exclusion)

Usage:
  python3 tools/make_sfx.py /root/testdata/sf0.1 /tmp/sfx1 10
  sbt "runMain graft.Verify /tmp/sfx1 /tmp/sf1_out"        # Spark side
  python3 tools/sf1_sweep.py /tmp/sfx1 /tmp/sf1_out \
      [--timeout 900] [--skip q137_video_dup_pairs,...] [qnames...]

The sweep log goes to stdout AND <outdir>/sf1_sweep_log.txt; commit
the log's summary into SCALE.md.
"""
import json
import subprocess
import sys
import time
from pathlib import Path

SF = sys.argv[1]
OUT = sys.argv[2]
rest = sys.argv[3:]
timeout = 900
skip = set()
only = []
i = 0
while i < len(rest):
    if rest[i] == "--timeout":
        timeout = int(rest[i + 1]); i += 2
    elif rest[i] == "--skip":
        skip |= set(rest[i + 1].split(",")); i += 2
    else:
        only.append(rest[i]); i += 1

oracle = json.loads(Path(f"{OUT}/oracle_sql.json").read_text())
names = sorted(only or oracle.keys())
log_path = Path(OUT) / "sf1_sweep_log.txt"
log = open(log_path, "a")


def record(line: str) -> None:
    print(line, flush=True)
    log.write(line + "\n")
    log.flush()


record(f"== sf1 sweep over {len(names)} queries, timeout {timeout}s, "
       f"sf={SF} ==")
counts = {"OK": 0, "FAIL": 0, "TIMEOUT": 0, "CRASH": 0, "SKIP": 0}
for name in names:
    if name in skip:
        counts["SKIP"] += 1
        record(f"SKIP     {name} (named exclusion, see SCALE.md)")
        continue
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, "tools/check_oracle.py", SF, OUT,
             "--no-verify", name],
            capture_output=True, text=True, cwd="/root/repo",
            timeout=timeout)
        dt = time.time() - t0
        out = (r.stdout or "") + (r.stderr or "")
        # check_oracle's N/N summary counts the whole oracle map even
        # when narrowed (documented caveat) — detect the per-query OK
        # line instead
        if r.returncode == 0 and f"OK   {name}" in out:
            counts["OK"] += 1
            record(f"OK       {name} ({dt:.0f}s)")
        elif r.returncode < 0:
            counts["CRASH"] += 1
            record(f"CRASH    {name} signal {-r.returncode} ({dt:.0f}s)"
                   f" - check `dmesg | grep -i killed` for the OOM killer")
        else:
            counts["FAIL"] += 1
            tail = out.strip().splitlines()[-3:]
            record(f"FAIL     {name} ({dt:.0f}s): " + " | ".join(tail))
    except subprocess.TimeoutExpired:
        counts["TIMEOUT"] += 1
        record(f"TIMEOUT  {name} (> {timeout}s)")

record("== summary: " + ", ".join(f"{k} {v}" for k, v in counts.items()
                                  if v) + " ==")
