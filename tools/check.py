#!/usr/bin/env python3
"""Local dev mirror of the driver's t2 correctness gate.

Usage: python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
(after: sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out")

For each query output parquet, runs the oracle SQL in DuckDB over views of
the sf parquet tables, sorts columns by name and rows by all columns, and
compares values exactly. Reports PASS/FAIL per query.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            rr.append(repr(v))
        out.append(tuple(rr))
    out.sort()
    return [cols[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    npass = nfail = 0
    for name, sql in sorted(oracle.items()):
        if not os.path.isdir(f"{out_dir}/{name}"):
            continue  # subset Verify run — only check what was dumped
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
            exp = con.execute(sql)
            ecols = [d[0] for d in exp.description]
            erows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            nfail += 1
            continue
        gc, gr = canon(grows, gcols)
        ec, er = canon(erows, ecols)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} vs oracle {ec}")
            nfail += 1
        elif gr != er:
            nfail += 1
            print(f"FAIL {name}: rows {len(gr)} vs {len(er)}")
            sg, se = set(gr), set(er)
            for r in list(sg - se)[:3]:
                print(f"   engine-only: {r}")
            for r in list(se - sg)[:3]:
                print(f"   oracle-only: {r}")
        else:
            npass += 1
            print(f"PASS {name} ({len(gr)} rows)")
    print(f"\n{npass} pass / {nfail} fail")
    return 1 if nfail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
