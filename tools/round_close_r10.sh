#!/bin/bash
# Round-10 close harness (dev-only, same status as check.py).
# Ordering per VERDICT r9: the 100x DuckDB oracle check runs FIRST in
# the close (it was cut off at 25/235 at r9's round end), benches after;
# every dump dir gets a HEAD_SHA stamp (captured before AND after the
# dump, stamped only if equal) so sweep_check's hermeticity gate can
# refuse mixed-HEAD artifact dirs.
set -x
cd /root/repo
R=/root/scaled/r10
mkdir -p $R

stamp() {  # stamp <dir> <sha-before>
  local sha_after=$(git rev-parse HEAD)
  if [ "$2" = "$sha_after" ]; then echo "$sha_after" > "$1/HEAD_SHA"; fi
}

SHA=$(git rev-parse HEAD)

# --- scaled-tier correctness FIRST (the r9 long pole, now at the front)
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g SPARK_GRAFT_VERIFY_TIMEOUT=1800 \
  sbt -batch "runMain graft.Verify /root/scaled/sfx100z $R/tier100z" > $R/log_tier100z.log 2>&1
stamp $R/tier100z $SHA
timeout 21600 python3 tools/check.py /root/scaled/sfx100z $R/tier100z > $R/check_tier100z.log 2>&1

SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  sbt -batch "runMain graft.Verify /root/scaled/sfx10z $R/tier10z" > $R/log_tier10z.log 2>&1
stamp $R/tier10z $SHA
timeout 10800 python3 tools/check.py /root/scaled/sfx10z $R/tier10z > $R/check_tier10z.log 2>&1

# --- determinism sweeps at sf0.01 (all queries, all five configs)
SPARK_GRAFT_CPUS=4 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $R/close_canon" > $R/log_canon.log 2>&1
stamp $R/close_canon $SHA
SPARK_GRAFT_CPUS=4 SPARK_GRAFT_SHUFFLE=7 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $R/close_shuf7" > $R/log_shuf7.log 2>&1
stamp $R/close_shuf7 $SHA
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $R/close_l32" > $R/log_l32.log 2>&1
stamp $R/close_l32 $SHA
SPARK_GRAFT_CPUS=4 EXTRA_JAVA_OPTS="-Duser.timezone=America/New_York" \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $R/close_tzny" > $R/log_tzny.log 2>&1
stamp $R/close_tzny $SHA
SPARK_GRAFT_CPUS=4 EXTRA_JAVA_OPTS="-Duser.language=tr -Duser.country=TR -Duser.timezone=Europe/Istanbul" \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $R/close_trtr" > $R/log_trtr.log 2>&1
stamp $R/close_trtr $SHA

python3 tools/compare_runs.py $R/close_canon $R/close_shuf7 $R/close_l32 $R/close_tzny $R/close_trtr > $R/compare_close.log 2>&1
python3 tools/sweep_check.py $R/close_canon $R/close_shuf7 $R/close_l32 $R/close_tzny $R/close_trtr $R/tier10z $R/tier100z > $R/sweep_check.log 2>&1

python3 tools/check.py /root/testdata/sf0.01 $R/close_canon > $R/check_close_sf001.log 2>&1

# --- idle benches, strict sequence, after all correctness artifacts
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > $R/bench_sf01.log 2>&1
SPARK_GRAFT_SF_DIR=/root/scaled/sfx10z SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  sbt -batch "runMain graft.Bench" > $R/bench_10z.log 2>&1
SPARK_GRAFT_SF_DIR=/root/scaled/sfx100z SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_BENCH_TIMEOUT=900 \
  sbt -batch "runMain graft.Bench" > $R/bench_100z.log 2>&1

# --- extract the one-line bench JSONs into repo-root artifacts
grep -o '{"metric".*}' $R/bench_sf01.log | tail -1 > /root/repo/BENCH_SF01_r10.json
grep -o '{"metric".*}' $R/bench_10z.log  | tail -1 > /root/repo/BENCH_SFX10Z_r10.json
grep -o '{"metric".*}' $R/bench_100z.log | tail -1 > /root/repo/BENCH_SFX100Z_r10.json

echo DONE > $R/close.done
