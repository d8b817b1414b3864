#!/bin/bash
# Round-13 close SUPPLEMENT: the combined check window that
# round_close_r13.sh's 1.3x clock gate skipped by 78 seconds
# (remaining=6942s vs needed=7020s at 21:27). Operator relaunch,
# gate-free, because (a) checks are the RETRYABLE class — an
# interruption leaves per-slice logs the tally merges plus a RUNNING
# line in gates.txt, the exact failure mode the gate-factor asymmetry
# was designed around — and (b) the window's realistic wall (~75-90
# min, tracks parallel) fits the ~115 min actually remaining. The
# benches this round protects are already DONE green. Phases append
# to the SAME gates.txt with _b suffixes.
set -x
REPO=${REPO:-/root/scaled/r13repo}
R=/root/scaled/r13
G=$R/gates.txt
TALLY_ALLOW=q_prefix_join
SPILLERS="q_attribution q_bm25 q_copurchase q_rrf_fusion q_sparse_sim q_spatial_nn q_sssp"
cd $REPO
SHA=$(git rev-parse HEAD)
echo "phase=check_window_b state=RUNNING operator-relaunch started=$(date +%s)" >> $G
done_line() { echo "phase=$1 rc=$2 finished=$(date +%s)" >> $G; }
stamp() {
  local sha_after=$(git rev-parse HEAD)
  if [ "$SHA" = "$sha_after" ]; then echo "$sha_after" > "$1/HEAD_SHA"; fi
}

# track 1: spiller lane, serial within the lane, reduced cap
(
  CHECK_MEM=56GB CHECK_TMP=/root/scaled/ducktmpA timeout 7200 \
    python3 tools/check.py /root/scaled/sfx100z $R/tier100z $SPILLERS \
    > $R/check_tier100z_big.log 2>&1
  rm -rf /root/scaled/ducktmpA
  done_line lane_spill_b $?
) &
T1=$!
# track 2: everything else in 4 parallel 14GB slices
(
  python3 - <<EOF
import json
spill = set("$SPILLERS".split())
qs = sorted(q for q in json.load(open('$R/tier100z/oracle_sql.json')) if q not in spill)
for i in range(4):
    open(f'$R/slice{i}.txt', 'w').write('\n'.join(qs[i::4]))
EOF
  for i in 0 1 2 3; do
    CHECK_MEM=14GB CHECK_TMP=/root/scaled/ducktmp$i timeout 7200 \
      python3 tools/check.py /root/scaled/sfx100z $R/tier100z \
      $(cat $R/slice$i.txt) > $R/check_tier100z_s$i.log 2>&1 &
  done
  wait
  rm -rf /root/scaled/ducktmp0 /root/scaled/ducktmp1 /root/scaled/ducktmp2 /root/scaled/ducktmp3
  done_line lane_slices_b 0
) &
T2=$!
# track 3: 10x dump then its sliced check
(
  SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=20g SPARK_GRAFT_VERIFY_TIMEOUT=1800 \
    SPARK_GRAFT_SCALED_TWINS=1 \
    sbt -batch "runMain graft.Verify /root/scaled/sfx10z $R/tier10z" > $R/log_tier10z.log 2>&1
  stamp $R/tier10z
  python3 - <<EOF
import json
qs = sorted(json.load(open('$R/tier10z/oracle_sql.json')))
for i in range(2):
    open(f'$R/slice10_{i}.txt', 'w').write('\n'.join(qs[i::2]))
EOF
  for i in 0 1; do
    CHECK_MEM=12GB CHECK_TMP=/root/scaled/ducktmp10_$i timeout 5400 \
      python3 tools/check.py /root/scaled/sfx10z $R/tier10z \
      $(cat $R/slice10_$i.txt) > $R/check_tier10z_s$i.log 2>&1 &
  done
  wait
  rm -rf /root/scaled/ducktmp10_0 /root/scaled/ducktmp10_1
  done_line tier10z_b 0
) &
T3=$!
# track 4: 5 determinism sweeps at sf0.01 (3 then 2)
(
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
  stamp $R/close_canon; stamp $R/close_shuf7; stamp $R/close_l32
  stamp $R/close_tzny; stamp $R/close_trtr
  python3 tools/compare_runs.py $R/close_canon $R/close_shuf7 $R/close_l32 $R/close_tzny $R/close_trtr > $R/compare_close.log 2>&1
  python3 tools/check.py /root/testdata/sf0.01 $R/close_canon > $R/check_close_sf001.log 2>&1
  done_line sweeps_b 0
) &
T4=$!
wait $T1 $T2 $T3 $T4
done_line check_window_b 0

# 90GB serial retry for any spiller the tighter cap failed
RETRY=$(grep -E "FAIL|ERR" $R/check_tier100z_big.log | grep -oE "q_[a-z0-9_]+" | sort -u | tr '\n' ' ')
if [ -n "$RETRY" ]; then
  CHECK_MEM=90GB CHECK_TMP=/root/scaled/ducktmpR timeout 5400 \
    python3 tools/check.py /root/scaled/sfx100z $R/tier100z $RETRY \
    > $R/check_tier100z_retry.log 2>&1
  rm -rf /root/scaled/ducktmpR
  done_line retry_spill_b $?
fi

# machine-counted gates
python3 tools/sweep_check.py --tally $R/tier100z $TALLY_ALLOW $R/check_tier100z_*.log > $R/tally_100z.log 2>&1
done_line tally_100z_b $?
python3 tools/sweep_check.py --tally $R/tier10z - $R/check_tier10z_s*.log > $R/tally_10z.log 2>&1
done_line tally_10z_b $?
DIRS="$R/close_canon $R/close_shuf7 $R/close_l32 $R/close_tzny $R/close_trtr $R/tier10z $R/tier100z"
python3 tools/sweep_check.py $DIRS > $R/sweep_check.log 2>&1
done_line sweep_check_b $?
echo "close_b_finished=$(date +%s)" >> $G
echo DONE > $R/close_b.done
