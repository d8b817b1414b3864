#!/bin/bash
# Round-10 close, part 2 (restructured mid-close): the 100x DuckDB
# check (launched by part 1, per the run-it-FIRST rule) proceeds in
# parallel while the remaining sbt-side artifacts land — serializing
# everything behind a ~3h check is exactly how r9 lost its bench and
# sweep tail to the round clock. DuckDB holds no sbt lock, so the only
# cost is co-tenancy noise, disclosed in SCALE_r10.md where it can
# affect numbers (benches run last and note whether the check was
# still active).
set -x
cd /root/repo
R=/root/scaled/r10

stamp() {
  local sha_after=$(git rev-parse HEAD)
  if [ "$2" = "$sha_after" ]; then echo "$sha_after" > "$1/HEAD_SHA"; fi
}
SHA=$(git rev-parse HEAD)

SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  sbt -batch "runMain graft.Verify /root/scaled/sfx10z $R/tier10z" > $R/log_tier10z.log 2>&1
stamp $R/tier10z $SHA

# determinism sweeps at sf0.01 (all queries, all five configs)
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

# 10x DuckDB check AFTER the sweeps (the 100x one is the priority
# artifact and is already running from part 1)
timeout 10800 python3 tools/check.py /root/scaled/sfx10z $R/tier10z > $R/check_tier10z.log 2>&1

# idle-as-possible benches, last; record whether the 100x check still runs
pgrep -f "check.py /root/scaled/sfx100z" > $R/bench_cotenant_100xcheck.flag || true
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > $R/bench_sf01.log 2>&1
SPARK_GRAFT_SF_DIR=/root/scaled/sfx10z SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  sbt -batch "runMain graft.Bench" > $R/bench_10z.log 2>&1
SPARK_GRAFT_SF_DIR=/root/scaled/sfx100z SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_BENCH_TIMEOUT=900 \
  sbt -batch "runMain graft.Bench" > $R/bench_100z.log 2>&1

grep -o '{"metric".*}' $R/bench_sf01.log | tail -1 > /root/repo/BENCH_SF01_r10.json
grep -o '{"metric".*}' $R/bench_10z.log  | tail -1 > /root/repo/BENCH_SFX10Z_r10.json
grep -o '{"metric".*}' $R/bench_100z.log | tail -1 > /root/repo/BENCH_SFX100Z_r10.json

echo DONE > $R/close.done
