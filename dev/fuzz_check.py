#!/usr/bin/env python3
"""Randomized differential fuzz gate, DuckDB half (r9 verdict item 5).
Replays every case dumped by `graft.FuzzDump` (sbt "Test/runMain
graft.FuzzDump OUTDIR [SEEDS]"): registers the case's input parquet as
views, runs the case's independently-authored oracle.sql, and compares
to the Spark output with the driver's exact semantics (sorted columns,
sorted rows, stringified exact values). Usage:
    dev/fuzz_check.py OUTDIR [op1,op2,...]
"""
import sys, glob, os
import duckdb

outdir = sys.argv[1]
only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
fail = ok = 0
per_op = {}
for sqlf in sorted(glob.glob(f"{outdir}/*/s*/oracle.sql")):
    d = os.path.dirname(sqlf)
    op = os.path.basename(os.path.dirname(d))
    if only is not None and op not in only:
        continue
    con = duckdb.connect()
    for t in sorted(glob.glob(f"{d}/*.parquet")):
        name = os.path.basename(t)[:-8]
        if name == "out":
            continue
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}/*.parquet')")
    case = f"{op}/{os.path.basename(d)}"
    try:
        exp = con.execute(open(sqlf).read()).fetchdf()
    except Exception as e:
        print(f"FAIL {case}: oracle SQL error: {e}"); fail += 1; continue
    got = con.execute(f"SELECT * FROM read_parquet('{d}/out.parquet/*.parquet')").fetchdf()
    ec, gc = sorted(exp.columns), sorted(got.columns)
    if ec != gc:
        print(f"FAIL {case}: columns {gc} vs oracle {ec}"); fail += 1; continue
    e = exp[ec].sort_values(ec).reset_index(drop=True)
    g = got[gc].sort_values(gc).reset_index(drop=True)
    if len(e) != len(g):
        print(f"FAIL {case}: rows {len(g)} vs oracle {len(e)}"); fail += 1; continue
    mism = (e.astype(str) != g.astype(str))
    if mism.any().any():
        bad = mism.any(axis=1)
        idx = bad[bad].index[0]
        print(f"FAIL {case}: {int(bad.sum())}/{len(e)} rows differ; first:")
        print("  oracle:", e.loc[idx].to_dict())
        print("  spark :", g.loc[idx].to_dict())
        fail += 1; continue
    ok += 1
    per_op[op] = per_op.get(op, 0) + 1
for op in sorted(per_op):
    print(f"OK   {op}: {per_op[op]} cases")
print(f"PASS ({ok} cases)" if fail == 0 else f"{fail} FAILURES ({ok} ok)")
sys.exit(1 if fail else 0)
