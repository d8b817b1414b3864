#!/bin/bash
# Round-12 close harness (dev-only, same status as check.py).
#
# Discipline (VERDICT r11 #1-#3 + carried r10 rules):
#  - DISK-HEADROOM gate before every tier phase;
#  - 100x oracle check FIRST, TWO-LANE (VERDICT r11 #2: the seven known
#    spillers run SERIAL with a big memory budget — the r11 20GB
#    per-slice pin CREATED their ENOSPC spills — everything else runs
#    in parallel 20GB slices); benches run IDLE, strictly last;
#  - scaled tier dumps export the tier-switched twins
#    (SPARK_GRAFT_SCALED_TWINS=1, ADVICE r11 on q_spatial_join); the
#    sf0.01 sweeps keep the independent defaults;
#  - parallel sf0.01 sweeps are SAFE now: Verify pins graft.scratch.dir
#    to its own out dir (ADVICE r11 clobber fix) — no serial repair;
#  - machine-counted close: sweep_check --tally per tier (allowlist =
#    the designed q_prefix_join abort only), --bench gates on every
#    extracted bench JSON; tally merges logs NEWEST-WINS (mtime);
#  - the three BENCH_*_r12.json extractions + gates.txt are written by
#    THIS script or they do not exist — SCALE_r12.md may only cite
#    artifacts that are on disk when it is committed (VERDICT r11 #1).
set -x
cd /root/repo
R=/root/scaled/r12
mkdir -p $R
TALLY_ALLOW=q_prefix_join
BENCH_ALLOW=q_prefix_join
SPILLERS="q_attribution q_bm25 q_copurchase q_rrf_fusion q_sparse_sim q_spatial_nn q_sssp"

stamp() {  # stamp <dir> <sha-before>
  local sha_after=$(git rev-parse HEAD)
  if [ "$2" = "$sha_after" ]; then echo "$sha_after" > "$1/HEAD_SHA"; fi
}

SHA=$(git rev-parse HEAD)

# ---- phase 1: 100x dump + TWO-LANE check (check runs FIRST in the close)
python3 tools/sweep_check.py --disk-gate /root/scaled 55 || exit 1
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g SPARK_GRAFT_VERIFY_TIMEOUT=1800 \
  SPARK_GRAFT_SCALED_TWINS=1 \
  sbt -batch "runMain graft.Verify /root/scaled/sfx100z $R/tier100z" > $R/log_tier100z.log 2>&1
stamp $R/tier100z $SHA
# lane A (serial, big memory): the seven known spillers
CHECK_MEM=90GB CHECK_TMP=/root/scaled/ducktmpA timeout 14400 \
  python3 tools/check.py /root/scaled/sfx100z $R/tier100z $SPILLERS \
  > $R/check_tier100z_big.log 2>&1
rm -rf /root/scaled/ducktmpA
# lane B (4 parallel slices, 20GB each): everything else
python3 - <<EOF
import json
spill = set("$SPILLERS".split())
qs = sorted(q for q in json.load(open('$R/tier100z/oracle_sql.json')) if q not in spill)
for i in range(4):
    open(f'$R/slice{i}.txt', 'w').write('\n'.join(qs[i::4]))
EOF
for i in 0 1 2 3; do
  CHECK_MEM=20GB CHECK_TMP=/root/scaled/ducktmp$i timeout 14400 \
    python3 tools/check.py /root/scaled/sfx100z $R/tier100z \
    $(cat $R/slice$i.txt) > $R/check_tier100z_s$i.log 2>&1 &
done
wait
rm -rf /root/scaled/ducktmp0 /root/scaled/ducktmp1 /root/scaled/ducktmp2 /root/scaled/ducktmp3
# the q_mart_*/q_src_orc scratch tables live under the dump dir now
# (per-run hermeticity); the oracle twins recompute from the base
# tables and never read them, so reclaim the space once checks pass
rm -rf $R/tier100z/_scratch

# ---- phase 2: 10x dump + sliced check
python3 tools/sweep_check.py --disk-gate /root/scaled 30 || exit 1
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g SPARK_GRAFT_VERIFY_TIMEOUT=1800 \
  SPARK_GRAFT_SCALED_TWINS=1 \
  sbt -batch "runMain graft.Verify /root/scaled/sfx10z $R/tier10z" > $R/log_tier10z.log 2>&1
stamp $R/tier10z $SHA
python3 - <<EOF
import json
qs = sorted(json.load(open('$R/tier10z/oracle_sql.json')))
for i in range(2):
    open(f'$R/slice10_{i}.txt', 'w').write('\n'.join(qs[i::2]))
EOF
for i in 0 1; do
  CHECK_MEM=20GB CHECK_TMP=/root/scaled/ducktmp$i timeout 10800 \
    python3 tools/check.py /root/scaled/sfx10z $R/tier10z \
    $(cat $R/slice10_$i.txt) > $R/check_tier10z_s$i.log 2>&1 &
done
wait
rm -rf /root/scaled/ducktmp0 /root/scaled/ducktmp1
rm -rf $R/tier10z/_scratch

# ---- phase 3: determinism sweeps at sf0.01 (5 configs; parallel is
# safe now — each Verify's scratch + cells live under its own out dir)
SPARK_GRAFT_CPUS=4 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $R/close_canon" > $R/log_canon.log 2>&1 &
P1=$!
SPARK_GRAFT_CPUS=4 SPARK_GRAFT_SHUFFLE=7 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $R/close_shuf7" > $R/log_shuf7.log 2>&1 &
P2=$!
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $R/close_l32" > $R/log_l32.log 2>&1 &
P3=$!
wait $P1 $P2 $P3
SPARK_GRAFT_CPUS=4 EXTRA_JAVA_OPTS="-Duser.timezone=America/New_York" \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $R/close_tzny" > $R/log_tzny.log 2>&1 &
P4=$!
SPARK_GRAFT_CPUS=4 EXTRA_JAVA_OPTS="-Duser.language=tr -Duser.country=TR -Duser.timezone=Europe/Istanbul" \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $R/close_trtr" > $R/log_trtr.log 2>&1 &
P5=$!
wait $P4 $P5
stamp $R/close_canon $SHA; stamp $R/close_shuf7 $SHA; stamp $R/close_l32 $SHA
stamp $R/close_tzny $SHA; stamp $R/close_trtr $SHA

python3 tools/compare_runs.py $R/close_canon $R/close_shuf7 $R/close_l32 $R/close_tzny $R/close_trtr > $R/compare_close.log 2>&1
python3 tools/sweep_check.py $R/close_canon $R/close_shuf7 $R/close_l32 $R/close_tzny $R/close_trtr $R/tier10z $R/tier100z > $R/sweep_check.log 2>&1
python3 tools/check.py /root/testdata/sf0.01 $R/close_canon > $R/check_close_sf001.log 2>&1

# ---- phase 4: IDLE benches, strictly serial, nothing else running.
# Clock-budgeted (the r11 close died HERE): each bench is gated by an
# env flag so the round can run exactly what fits and gates.txt
# records exactly what ran — a skipped bench is a named SKIP line,
# never an unwritten file silently claimed later.
B1=skip; B10=skip; B100=skip
if [ "${RUN_BENCH_SF01:-1}" = 1 ]; then
  python3 tools/sweep_check.py --disk-gate /root/scaled 25 || exit 1
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" > $R/bench_sf01.log 2>&1
  grep -o '{"metric".*}' $R/bench_sf01.log | tail -1 > /root/repo/BENCH_SF01_r12.json
  python3 tools/sweep_check.py --bench - BENCH_SF01_r12.json > $R/bench_gate.log 2>&1
  B1=$?
fi
if [ "${RUN_BENCH_10Z:-0}" = 1 ]; then
  python3 tools/sweep_check.py --disk-gate /root/scaled 25 || exit 1
  SPARK_GRAFT_SF_DIR=/root/scaled/sfx10z SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
    sbt -batch "runMain graft.Bench" > $R/bench_10z.log 2>&1
  grep -o '{"metric".*}' $R/bench_10z.log  | tail -1 > /root/repo/BENCH_SFX10Z_r12.json
  python3 tools/sweep_check.py --bench - BENCH_SFX10Z_r12.json >> $R/bench_gate.log 2>&1
  B10=$?
fi
if [ "${RUN_BENCH_100Z:-0}" = 1 ]; then
  python3 tools/sweep_check.py --disk-gate /root/scaled 25 || exit 1
  SPARK_GRAFT_SF_DIR=/root/scaled/sfx100z SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    SPARK_GRAFT_BENCH_TIMEOUT=900 \
    sbt -batch "runMain graft.Bench" > $R/bench_100z.log 2>&1
  grep -o '{"metric".*}' $R/bench_100z.log | tail -1 > /root/repo/BENCH_SFX100Z_r12.json
  python3 tools/sweep_check.py --bench $BENCH_ALLOW BENCH_SFX100Z_r12.json >> $R/bench_gate.log 2>&1
  B100=$?
fi

# ---- phase 5: machine-counted gates (any UNTRIAGED line fails the close)
python3 tools/sweep_check.py --tally $R/tier100z $TALLY_ALLOW $R/check_tier100z_big.log $R/check_tier100z_s*.log > $R/tally_100z.log 2>&1
T100=$?
python3 tools/sweep_check.py --tally $R/tier10z - $R/check_tier10z_s*.log > $R/tally_10z.log 2>&1
T10=$?
echo "gates: tally100=$T100 tally10=$T10 bench_sf01=$B1 bench10z=$B10 bench100z=$B100" > $R/gates.txt
cat $R/gates.txt
echo DONE > $R/close.done
