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

HERMETICITY (VERDICT r9 #2): each dir must also carry a HEAD_SHA stamp
file (written by the close script: sha captured before AND after the
dump, stamped only if equal) matching the CURRENT git HEAD, and every
query's dump mtime must not predate the last commit touching src/main
— the round-9 failure mode was a tier dir mixing dumps from three
different HEADs, producing a spurious FAIL the judge had to re-dump to
clear. A dir with no stamp fails loudly.
"""
import os
import re
import subprocess
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


def git(*args):
    return subprocess.run(["git", "-C", os.path.join(HERE, "..")] + list(args),
                          capture_output=True, text=True).stdout.strip()


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    queries = head_queries()
    head = git("rev-parse", "HEAD")
    src_commit_ts = int(git("log", "-1", "--format=%ct", "--", "src/main") or 0)
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
        # hermeticity: the stamp must exist and match the current HEAD
        stamp_path = os.path.join(sweep_dir, "HEAD_SHA")
        if not os.path.isfile(stamp_path):
            print(f"FAIL {sweep_dir}: no HEAD_SHA stamp — dump provenance unknown")
            bad += 1
        else:
            stamp = open(stamp_path).read().strip()
            if stamp != head:
                print(f"FAIL {sweep_dir}: stamped {stamp[:12]} != HEAD {head[:12]}")
                bad += 1
        # ...and no dump may predate the last commit touching src/main
        stale = [q for q in queries if q not in missing
                 and os.path.getmtime(os.path.join(sweep_dir, q)) < src_commit_ts]
        for q in stale:
            print(f"FAIL {sweep_dir}: dump for {q} predates last src/main commit")
        bad += len(stale)
        print(f"== {sweep_dir}: {len(queries) - len(missing)}/{len(queries)} "
              f"HEAD queries present, {len(stale)} stale ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
