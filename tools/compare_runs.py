#!/usr/bin/env python3
"""Dev-only layout/environment determinism harness (same status as check.py).

Usage: python3 tools/compare_runs.py <baselineVerifyDir> <otherVerifyDir> [...moreDirs]

Compares the SPARK parquet dumps of two or more graft.Verify output
dirs query-by-query with check.py's order-insensitive canonical hash
(columns sorted by name, rows sorted, floats rounded to 9 places).
A query whose hash depends on the physical layout (shuffle partition
count, core count) or on the JVM default timezone/locale would break
on any real cluster, where neither ever matches local[32] — this is
the proof harness for that axis.
"""
import sys, glob, os
import pandas as pd
from check import canon


def hashes(out_dir):
    result = {}
    for d in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, d)
        if not os.path.isdir(path):
            continue
        files = sorted(glob.glob(f"{path}/*.parquet"))
        if not files:
            result[d] = "NO_OUTPUT"
            continue
        df = pd.concat([pd.read_parquet(f) for f in files])
        result[d] = canon(df)
    return result


def main():
    base_dir, rest = sys.argv[1], sys.argv[2:]
    base = hashes(base_dir)
    n_bad = 0
    for other_dir in rest:
        other = hashes(other_dir)
        missing = sorted(set(base) - set(other)) + sorted(set(other) - set(base))
        for q in missing:
            print(f"FAIL {q}: present in only one of {base_dir} / {other_dir}")
            n_bad += 1
        for q in sorted(set(base) & set(other)):
            if base[q] != other[q]:
                print(f"FAIL {q}: hash differs {base_dir} vs {other_dir}")
                n_bad += 1
        same = sum(1 for q in set(base) & set(other) if base[q] == other[q])
        print(f"== {other_dir}: {same} identical, "
              f"{len(set(base) & set(other)) - same} divergent, {len(missing)} missing ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
