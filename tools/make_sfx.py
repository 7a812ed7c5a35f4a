#!/usr/bin/env python3
"""Replicate a driver testdata directory K-fold into an sf1-class
correctness fixture (round 12, VERDICT item 4).

The driver ships parquet at sf{0.001,0.01,0.1} only; the sf1 ORACLE
decade (do Spark and DuckDB still hash-agree when per-key sequences
and pair fan-outs grow 10x?) needs sf1-shaped inputs. This tool
builds them by deterministic replication of sf0.1 — valid for the
oracle contract because BOTH sides read the SAME parquet; realism of
the distribution is not what the sweep checks. Replication rules:

  - region/nation: copied (fixed dimensions; FKs keep pointing at
    them).
  - customer/supplier/part/orders/lineitem: K copies with every
    primary/foreign key shifted by copy * (max(key)+1) of its home
    table, so FK joins stay exactly K-fold.
  - events: K copies with event_id shifted and ts shifted by
    copy * (span + 1h); user_id is NOT shifted, so per-key event
    sequences grow K-fold LONGER — the scale-sensitive direction for
    MATCH_RECOGNIZE / CEP / session windows (shifting user_id would
    only add keys, which sf0.1 already exercises).
  - documents/embeddings: K copies with doc_id/vec_id shifted; text
    and vectors unchanged (dedup groups grow K-fold — both engines
    see the same degenerate groups, and the media fixtures derive
    pixels from the SHIFTED ids, so media payloads stay distinct).

Every shifted column is cast back to its source parquet type so the
replicated schema is bit-identical to the driver's layout.

Usage: python3 tools/make_sfx.py /root/testdata/sf0.1 /tmp/sfx1 10
"""
import os
import sys

import duckdb


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def cols_types(t):
        con.execute(
            f"create or replace view v_{t} as "
            f"select * from read_parquet('{src}/{t}.parquet')")
        return con.execute(
            "select column_name, data_type from duckdb_columns() "
            f"where table_name = 'v_{t}' order by column_index").fetchall()

    def key_space(t, c):
        return con.execute(f"select max({c}) + 1 from v_{t}").fetchone()[0]

    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        cols_types(t)

    ck = key_space("customer", "c_custkey")
    sk = key_space("supplier", "s_suppkey")
    pk = key_space("part", "p_partkey")
    ok = key_space("orders", "o_orderkey")
    ek = key_space("events", "event_id")
    dk = key_space("documents", "doc_id")
    vk = key_space("embeddings", "vec_id")
    span_s = con.execute(
        "select cast(epoch(max(ts) - min(ts)) as bigint) + 3600"
        " from v_events").fetchone()[0]

    shifts = {
        "customer": {"c_custkey": ck},
        "supplier": {"s_suppkey": sk},
        "part": {"p_partkey": pk},
        "orders": {"o_orderkey": ok, "o_custkey": ck},
        "lineitem": {"l_orderkey": ok, "l_partkey": pk, "l_suppkey": sk},
        "events": {"event_id": ek},   # ts handled specially below
        "documents": {"doc_id": dk},
        "embeddings": {"vec_id": vk},
    }

    for t in ["region", "nation"]:
        con.execute(f"copy (select * from v_{t}) to '{dst}/{t}.parquet'"
                    " (format parquet)")
        print(f"{t}: copied")

    for t, sh in shifts.items():
        exprs = []
        for c, ty in cols_types(t):
            if c in sh:
                exprs.append(f"cast({c} + r.k * {sh[c]} as {ty}) as {c}")
            elif t == "events" and c == "ts":
                exprs.append(
                    f"ts + r.k * interval '{span_s}' second as ts")
            else:
                exprs.append(c)
        con.execute(
            f"copy (select {', '.join(exprs)} from v_{t} "
            f"cross join range({k}) r(k)) to '{dst}/{t}.parquet'"
            " (format parquet)")
        n = con.execute(
            f"select count(*) from read_parquet('{dst}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows ({k}x)")


if __name__ == "__main__":
    main()
