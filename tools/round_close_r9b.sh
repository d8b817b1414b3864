#!/bin/bash
# Round-9 close, part 2 (reordered after the q_kruskal wrap fix): wait
# for the in-flight 10x DuckDB check, re-check the fixed q_kruskal at
# 10x, run the 100x Verify at the FIXED head, then the idle benches
# BEFORE the long 100x DuckDB check so the perf artifacts land first.
set -x
cd /root/repo
R=/root/scaled/r9

# wait for the running 10x check to drain
while pgrep -f "tools/check.py /root/scaled/sfx10z" > /dev/null; do sleep 20; done
# the fixed q_kruskal, re-checked at the tier (the original log keeps
# the honest pre-fix FAIL line; this one records the fix)
python3 tools/check.py /root/scaled/sfx10z $R/tier10z q_kruskal > $R/check_tier10z_kruskal_postfix.log 2>&1

SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g SPARK_GRAFT_VERIFY_TIMEOUT=1200 \
  sbt -batch "runMain graft.Verify /root/scaled/sfx100z $R/tier100z" > $R/log_tier100z.log 2>&1

# idle benches, strict sequence
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > $R/bench_sf01.log 2>&1
SPARK_GRAFT_SF_DIR=/root/scaled/sfx10z SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  sbt -batch "runMain graft.Bench" > $R/bench_10z.log 2>&1
SPARK_GRAFT_SF_DIR=/root/scaled/sfx100z SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_BENCH_TIMEOUT=900 \
  sbt -batch "runMain graft.Bench" > $R/bench_100z.log 2>&1
echo BENCHES_DONE > $R/benches.done

# the long pole last: full-suite DuckDB correctness at 100x
timeout 14400 python3 tools/check.py /root/scaled/sfx100z $R/tier100z > $R/check_tier100z.log 2>&1
echo DONE > $R/close.done
