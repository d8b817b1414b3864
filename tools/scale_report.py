#!/usr/bin/env python3
"""Dev-only scale-ratio report (same status as check.py; not library code).

Compares two Bench JSON artifacts (e.g. sf0.1 vs the 10x unique-content
tier) and prints per-query wall ratios sorted descending, flagging any
query whose scaled time exceeds `budget` x its base time. A ratio around
the data growth factor R is linear scaling; well under R means the
query's work is bounded by a workload/vocabulary side rather than the
corpus; well over R is a superlinear term worth chasing.

Usage: python3 tools/scale_report.py <base.json> <scaled.json> [budget=30]
"""
import json
import sys


def main():
    base = json.load(open(sys.argv[1]))
    scaled = json.load(open(sys.argv[2]))
    budget = float(sys.argv[3]) if len(sys.argv) > 3 else 30.0
    bq, sq = base["queries"], scaled["queries"]
    rows = []
    for name in sorted(sq):
        if name not in bq:
            rows.append((float("inf"), name, bq.get(name), sq[name]))
            continue
        # guard tiny denominators: sub-100ms base times are all JVM noise
        ratio = sq[name] / max(bq[name], 0.1)
        rows.append((ratio, name, bq[name], sq[name]))
    rows.sort(reverse=True)
    n_flag = 0
    print(f"{'query':28s} {'base_s':>8s} {'scaled_s':>9s} {'ratio':>7s}")
    for ratio, name, b, s in rows:
        flag = ""
        if ratio > budget:
            flag = f"  <-- exceeds {budget:g}x budget"
            n_flag += 1
        bs = f"{b:8.2f}" if b is not None else "     n/a"
        print(f"{name:28s} {bs} {s:9.2f} {ratio:7.2f}{flag}")
    tb = sum(v for k, v in bq.items() if k in sq)
    ts = sum(sq.values())
    print(f"\ntotal base={tb:.1f}s scaled={ts:.1f}s ratio={ts / max(tb, 0.1):.2f}")
    for side, errs in (("base", base.get("errors", {})),
                       ("scaled", scaled.get("errors", {}))):
        for k, v in errs.items():
            print(f"ERROR[{side}] {k}: {v}")
    sys.exit(1 if n_flag else 0)


if __name__ == "__main__":
    main()
