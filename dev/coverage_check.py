#!/usr/bin/env python3
"""Correctness-gate COVERAGE tripwire: compare a CORRECTNESS_rNN.json
(or a Verify outDir's oracle_sql.json) against the previous round's,
flagging queries that silently vanished. Between r6 and r7 the driver
regenerated events.parquet with a new timestamp type and 22 queries
dropped out of the gate with zero signal (Verify logs-and-continues;
all remaining entries still said PASS).

Also audits the SURVEY.md §2 contract: every oracle-gated key the
checklist claims (a backtick-quoted `q_*` immediately followed by ✓)
must exist in the current gate, and every gate key must appear
somewhere in §2 — so checklist ↔ gate can't drift (r9 verdict item 2).

Usage:
    dev/coverage_check.py CORRECTNESS_r09.json CORRECTNESS_r10.json [SURVEY.md]
"""
import sys, json, re, os

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

survey = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SURVEY.md")
drift = []
if os.path.exists(survey):
    text = open(survey).read()
    m = re.search(r"^## §2 .*?(?=^## )", text, re.M | re.S)
    sec2 = m.group(0) if m else ""
    claimed = set(re.findall(r"`(q_\w+)`\s*✓", sec2))
    mentioned = set(re.findall(r"\b(q_\w+)\b", sec2))
    unimpl = sorted(claimed - set(cur))
    unlisted = sorted(set(cur) - mentioned)
    if unimpl:
        drift.append(f"SURVEY §2 claims ✓ but gate lacks ({len(unimpl)}): {', '.join(unimpl)}")
    if unlisted:
        drift.append(f"gate keys missing from SURVEY §2 ({len(unlisted)}): {', '.join(unlisted)}")
    for d in drift:
        print(d)
    if not drift:
        print(f"SURVEY §2 contract: {len(claimed)} claimed keys all gated, "
              f"all {len(cur)} gate keys listed")

failed = bool(gone or bad or drift)
print("PASS" if not failed else "COVERAGE/CORRECTNESS REGRESSION")
sys.exit(1 if failed else 0)
