#!/bin/bash
# Round-9 close harness (dev-only, same status as check.py): determinism
# sweeps at HEAD over ALL queries (VERDICT r8 #6), full-suite correctness
# at sf0.01 / 10x Zipf / 100x Zipf (VERDICT r8 #5), then idle benches in
# strict sequence. Run AFTER src/main is frozen for the round.
set -x
cd /root/repo
R=/root/scaled/r9
mkdir -p $R

# --- determinism sweeps at sf0.01 (all queries, incl. every r9 newcomer)
SPARK_GRAFT_CPUS=4 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $R/close_canon" > $R/log_canon.log 2>&1
SPARK_GRAFT_CPUS=4 SPARK_GRAFT_SHUFFLE=7 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $R/close_shuf7" > $R/log_shuf7.log 2>&1
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $R/close_l32" > $R/log_l32.log 2>&1
SPARK_GRAFT_CPUS=4 EXTRA_JAVA_OPTS="-Duser.timezone=America/New_York" \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $R/close_tzny" > $R/log_tzny.log 2>&1
SPARK_GRAFT_CPUS=4 EXTRA_JAVA_OPTS="-Duser.language=tr -Duser.country=TR -Duser.timezone=Europe/Istanbul" \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $R/close_trtr" > $R/log_trtr.log 2>&1

python3 tools/compare_runs.py $R/close_canon $R/close_shuf7 $R/close_l32 $R/close_tzny $R/close_trtr > $R/compare_close.log 2>&1
python3 tools/sweep_check.py $R/close_canon $R/close_shuf7 $R/close_l32 $R/close_tzny $R/close_trtr > $R/sweep_check.log 2>&1

# --- full correctness vs DuckDB at final HEAD, three scales
python3 tools/check.py /root/testdata/sf0.01 $R/close_canon > $R/check_close_sf001.log 2>&1

SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  sbt -batch "runMain graft.Verify /root/scaled/sfx10z $R/tier10z" > $R/log_tier10z.log 2>&1
timeout 10800 python3 tools/check.py /root/scaled/sfx10z $R/tier10z > $R/check_tier10z.log 2>&1

SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g SPARK_GRAFT_VERIFY_TIMEOUT=1200 \
  sbt -batch "runMain graft.Verify /root/scaled/sfx100z $R/tier100z" > $R/log_tier100z.log 2>&1
timeout 14400 python3 tools/check.py /root/scaled/sfx100z $R/tier100z > $R/check_tier100z.log 2>&1

# --- idle benches, strict sequence, after all sweeps
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > $R/bench_sf01.log 2>&1
SPARK_GRAFT_SF_DIR=/root/scaled/sfx10z SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  sbt -batch "runMain graft.Bench" > $R/bench_10z.log 2>&1
SPARK_GRAFT_SF_DIR=/root/scaled/sfx100z SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_BENCH_TIMEOUT=900 \
  sbt -batch "runMain graft.Bench" > $R/bench_100z.log 2>&1

echo DONE > $R/close.done
