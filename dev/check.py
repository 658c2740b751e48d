#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mimicking the driver:
run Verify output vs DuckDB oracle SQL; sort columns by name, sort rows,
compare values exactly. Usage: dev/check.py OUTDIR SFDIR [q1,q2,...]"""
import sys, json, glob
import duckdb

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
fail = 0
for name, sql in sorted(oracle.items()):
    if only is not None and name not in only:
        continue
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}"); fail += 1; continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    got = con.execute(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
    ec, gc = sorted(exp.columns), sorted(got.columns)
    if ec != gc:
        print(f"FAIL {name}: columns {gc} vs oracle {ec}"); fail += 1; continue
    e = exp[ec].sort_values(ec).reset_index(drop=True)
    g = got[gc].sort_values(gc).reset_index(drop=True)
    if len(e) != len(g):
        print(f"FAIL {name}: rows {len(g)} vs oracle {len(e)}"); fail += 1; continue
    # exact value compare (stringify to dodge dtype-width diffs)
    mism = (e.astype(str) != g.astype(str))
    if mism.any().any():
        bad = mism.any(axis=1)
        print(f"FAIL {name}: {int(bad.sum())}/{len(e)} rows differ; first:")
        idx = bad[bad].index[0]
        print("  oracle:", e.loc[idx].to_dict())
        print("  spark :", g.loc[idx].to_dict())
        fail += 1; continue
    print(f"OK   {name}: {len(e)} rows")
print("PASS" if fail == 0 else f"{fail} FAILURES")
sys.exit(1 if fail else 0)
