#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: compare_oracle.py <sfDir> <verifyOutDir>

Registers each parquet table of sfDir as a DuckDB view, runs every oracle
SQL from <verifyOutDir>/oracle_sql.json, and compares against the Spark
result parquet written by graft.Verify: columns sorted by name, rows sorted
by all columns, exact value equality (floats compared to 1e-9 after the
engine-side rounding contract).
"""
import json
import math
import sys

import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df()
    except Exception as e:
        fails.append((name, f"missing spark result: {e}"))
        continue
    ec = sorted(exp.columns)
    gc = sorted(got.columns)
    if ec != gc:
        fails.append((name, f"columns differ: spark={gc} oracle={ec}"))
        continue
    exp = exp[ec].sort_values(ec).reset_index(drop=True)
    got = got[gc].sort_values(gc).reset_index(drop=True)
    if len(exp) != len(got):
        fails.append((name, f"row count: spark={len(got)} oracle={len(exp)}"))
        continue
    bad = None
    for c in ec:
        ev, gv = exp[c], got[c]
        if ev.dtype.kind == "f" or gv.dtype.kind == "f":
            diff = [(i, a, b) for i, (a, b) in enumerate(zip(ev, gv))
                    if not (a == b or (isinstance(a, float) and isinstance(b, float)
                                       and math.isclose(a, b, abs_tol=1e-9)))]
        else:
            diff = [(i, a, b) for i, (a, b) in enumerate(zip(ev, gv)) if
                    str(a) != str(b)]
        if diff:
            bad = (c, diff[:3])
            break
    if bad:
        fails.append((name, f"values differ in col {bad[0]}: {bad[1]}"))
    else:
        print(f"OK    {name}  rows={len(got)}")

for name, msg in fails:
    print(f"FAIL  {name}: {msg}")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} oracle-gated queries match")
sys.exit(1 if fails else 0)
