#!/usr/bin/env python3
"""Correctness-gate COVERAGE tripwire: compare a CORRECTNESS_rNN.json
(or a Verify outDir's oracle_sql.json) against the previous round's,
flagging queries that silently vanished. Between r6 and r7 the driver
regenerated events.parquet with a new timestamp type and 22 queries
dropped out of the gate with zero signal (Verify logs-and-continues;
all remaining entries still said PASS). Usage:
    dev/coverage_check.py CORRECTNESS_r07.json CORRECTNESS_r08.json
"""
import sys, json

prev, cur = (json.load(open(p)) for p in sys.argv[1:3])
gone, new = sorted(set(prev) - set(cur)), sorted(set(cur) - set(prev))
bad = [k for k, v in cur.items()
       if isinstance(v, dict) and not (v.get("rows_match") and v.get("schema_match") and v.get("hash_match"))]
if new:
    print(f"new ({len(new)}): {', '.join(new)}")
if gone:
    print(f"DROPPED from gate ({len(gone)}): {', '.join(gone)}")
if bad:
    print(f"FAILING ({len(bad)}): {', '.join(sorted(bad))}")
print("PASS" if not (gone or bad) else "COVERAGE/CORRECTNESS REGRESSION")
sys.exit(1 if (gone or bad) else 0)
