#!/usr/bin/env python3
"""Per-query diff of two Bench JSONs (dev-only, same status as check.py).

Usage: bench_diff.py OLD.json NEW.json [slack_ratio slack_abs]

Prints every query with old/new seconds and the delta, flags
regressions past slack_ratio*old + slack_abs (the judge's standing
1.5x + 0.5s bar), and summarizes common-query totals plus queries
present on only one side. Exit code 1 iff any regression is flagged.
"""
import json
import sys


def main() -> int:
    old_p, new_p = sys.argv[1], sys.argv[2]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    abs_s = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5
    old = json.load(open(old_p))["queries"]
    new = json.load(open(new_p))["queries"]
    num = lambda v: isinstance(v, (int, float))
    common = sorted(k for k in old if k in new and num(old[k]) and num(new[k]))
    only_old = sorted(k for k in old if k not in new)
    only_new = sorted(k for k in new if k not in old)
    regressions = []
    for k in common:
        bar = ratio * old[k] + abs_s
        flag = "REGRESSION" if new[k] > bar else ""
        if flag:
            regressions.append(k)
        print(f"{k:32s} {old[k]:9.3f} -> {new[k]:9.3f}  ({new[k]-old[k]:+8.3f}) {flag}")
    print(f"-- common ({len(common)}): {sum(old[k] for k in common):.1f}s -> "
          f"{sum(new[k] for k in common):.1f}s")
    if only_old:
        print(f"-- only in OLD ({len(only_old)}): {' '.join(only_old)}")
    if only_new:
        print(f"-- only in NEW ({len(only_new)}): "
              + " ".join(f"{k}={new[k]:.2f}s" if num(new[k]) else k for k in only_new))
    if regressions:
        print(f"-- REGRESSIONS past {ratio}x+{abs_s}s ({len(regressions)}): "
              + " ".join(regressions))
        return 1
    print(f"-- zero regressions past {ratio}x+{abs_s}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
