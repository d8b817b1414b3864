#!/usr/bin/env python3
"""Structural closure check for the determinism sweeps (VERDICT r8 #6).

Usage: python3 tools/sweep_check.py <verifyDir> [...moreVerifyDirs]

The layout/TZ determinism sweeps only prove what they cover; a query
added AFTER a sweep ran would ship unproven on those axes without
anyone noticing. This check makes that impossible to miss at round
close: it extracts the query list from SparkEntry.scala AT HEAD (the
`"name" -> ((` entries of the `queries` map — the same set graft.Verify
dumps) and FAILS unless every query has a non-empty parquet dump in
EVERY given sweep dir. Run it on each sweep dir after compare_runs.py;
rc != 0 means the sweep is stale and must be re-run at HEAD.
"""
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ENTRY = os.path.join(HERE, "..", "src", "main", "scala", "graft", "SparkEntry.scala")


def head_queries():
    src = open(ENTRY, encoding="utf-8").read()
    names = re.findall(r'"([A-Za-z0-9_]+)"\s*->\s*\(\(', src)
    if len(names) < 100:
        sys.exit(f"sweep_check: only {len(names)} queries parsed from "
                 f"SparkEntry.scala — extraction regex is stale, fix it")
    return sorted(set(names))


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    queries = head_queries()
    bad = 0
    for sweep_dir in sys.argv[1:]:
        missing = [q for q in queries
                   if not any(f.endswith(".parquet")
                              for f in (os.listdir(os.path.join(sweep_dir, q))
                                        if os.path.isdir(os.path.join(sweep_dir, q))
                                        else []))]
        for q in missing:
            print(f"FAIL {sweep_dir}: no dump for {q}")
        bad += len(missing)
        print(f"== {sweep_dir}: {len(queries) - len(missing)}/{len(queries)} "
              f"HEAD queries present ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
