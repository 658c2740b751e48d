#!/usr/bin/env python3
"""Pair two full-bench maps (dev/bench_full*.json) query by query.

Usage: python3 dev/compare_bench.py OLD.json NEW.json [min_ratio]

Prints the paired totals, median per-query ratio (the host-throttling
detector: a UNIFORM median shift with unchanged plans is environment,
not regression), and the per-query outliers beyond min_ratio (default
1.3) in both directions. Compare only full-session maps — subset runs
are JIT-cold and not comparable (SURVEY §7.24).
"""
import json
import statistics
import sys


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old = json.load(open(sys.argv[1]))["queries"]
    new = json.load(open(sys.argv[2]))["queries"]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    common = sorted(set(old) & set(new))
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    pairs = [(k, old[k], new[k]) for k in common if old[k] > 0.05]
    ratios = sorted((n / o, k, o, n) for k, o, n in pairs)
    med = statistics.median(r for r, *_ in ratios)
    print(f"paired {len(common)} queries; totals "
          f"{sum(old[k] for k in common):.1f}s -> {sum(new[k] for k in common):.1f}s; "
          f"median per-query ratio {med:.3f}")
    if abs(med - 1.0) > 0.15:
        print("NOTE: median shift > 15% — uniform => environmental "
              "(host throttling), not a plan regression; re-run before diagnosing")
    slower = [(k, o, n, r) for r, k, o, n in ratios if r / med >= thr]
    faster = [(k, o, n, r) for r, k, o, n in ratios if med / r >= thr]
    for label, rows in (("slower", slower[::-1]), ("faster", faster)):
        if rows:
            print(f"{label} beyond {thr}x (median-normalized):")
            for k, o, n, r in rows:
                print(f"  {k:28s} {o:6.2f}s -> {n:6.2f}s  ({r:.2f}x raw, {r/med:.2f}x norm)")
    if only_old:
        print("dropped queries:", ", ".join(only_old))
    if only_new:
        print("new queries:", ", ".join(only_new))


if __name__ == "__main__":
    main()
