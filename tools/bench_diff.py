#!/usr/bin/env python3
"""Compare two Bench result lines (target/bench_summary.json format).

Usage: bench_diff.py before.json after.json [min_abs_delta_sec]

Prints per-query deltas sorted by absolute saving, plus totals over the
common query set. Accepts either the raw result line written by
graft.Bench to target/bench_summary.json or a wrapper object with a
"summary" field holding it.
"""
import json
import sys


def load(path):
    with open(path) as f:
        obj = json.load(f)
    if "summary" in obj and isinstance(obj["summary"], dict):
        obj = obj["summary"]
    return obj


def main():
    before, after = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 0.15
    qb, qa = before["queries"], after["queries"]
    common = sorted(set(qb) & set(qa))
    missing = sorted(set(qb) - set(qa))
    added = sorted(set(qa) - set(qb))
    tb = sum(qb[q] for q in common if qb[q] >= 0)
    ta = sum(qa[q] for q in common if qa[q] >= 0)
    rows = [(qb[q] - qa[q], q, qb[q], qa[q]) for q in common]
    rows.sort(reverse=True)
    print(f"common {len(common)} queries: {tb:.1f}s -> {ta:.1f}s "
          f"({(ta - tb) / tb * 100:+.1f}%)")
    print(f"calib before-run: {before.get('calib_before')}"
          f"/{before.get('calib_after')}  after-run: "
          f"{after.get('calib_before')}/{after.get('calib_after')}")
    print(f"contaminated: {before.get('contaminated')} -> "
          f"{after.get('contaminated')}")
    if missing:
        print("MISSING in after:", missing)
    if added:
        print("added in after:", added)
    print(f"\n{'query':28s} {'before':>8s} {'after':>8s} {'delta':>8s}")
    for d, q, b, a in rows:
        if abs(d) >= thr:
            print(f"{q:28s} {b:8.2f} {a:8.2f} {-d:+8.2f}")


if __name__ == "__main__":
    main()
