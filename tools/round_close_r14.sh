#!/bin/bash
# Round-14 close harness TEMPLATE (dev-only), derived from the r13
# close with its three incident-log lessons baked in (SCALE_r13 §5):
#
#  1. REAL rc per phase: every check/bench captures RC=$? on the very
#     next line, BEFORE any cleanup rm — three r13 done_line calls
#     recorded a cleanup's rc (phantom rc=0 lines; only the tally
#     gates caught it).
#  2. STAGGERED sbt STARTS: concurrent `sbt -batch` launched in the
#     same instant in one project dir race on the sbt-server socket
#     ("Address already in use" killed two r13 tracks) — every
#     concurrent sbt start is now separated by `sleep 8`.
#  3. SPILLER TWINS SERIAL PER-QUERY at CHECK_MEM=100GB, CHEAP-FIRST,
#     as the LAST check work when the box is otherwise drained: the
#     parallel-lane attempts OOM'd (56GB cap + co-tenants) or
#     ENOSPC'd (48/90GB caps spilling beside each other on the ~94GB
#     effective filesystem); the serial 100GB pass landed all seven
#     (q_rrf_fusion peaks ~150GB working set: 100GB mem + ~60GB
#     spill — it needs the disk to itself).
#
#  Carried from r13: clock gate (2.0x benches / 1.3x checks) with
#  append-as-you-go gates.txt; benches FIRST (idle) then checks;
#  pinned clone; tier-switched twins for scaled dumps; machine-counted
#  tallies (allowlist = designed q_prefix_join abort at 100x only).
#  NOTE r14 must tier-check the r13 surface (q_mart_txn3, q_mart_sql
#  + abandon/grace/ReadLimit paths) — the r13 tier dumps were pinned
#  at 8cd1c35, which predates them.
set -x
REPO=${REPO:-/root/scaled/r14repo}
R=/root/scaled/r14
mkdir -p $R
G=$R/gates.txt
TALLY_ALLOW=q_prefix_join
BENCH_ALLOW=q_prefix_join
# r14: q_attribution / q_bm25 / q_rrf_fusion left the spiller set —
# their scaledOracleOverrides twins (VERDICT r13 #3) run in ~25 s each
# at 100x under a 16GB cap (validated equal to the default twins at
# sf0.1/10x and to the r13 engine dumps at 100x), so they ride the
# normal slice lane now.
SPILLERS_CHEAP_FIRST="q_kcore q_sparse_sim q_spatial_nn q_sssp q_copurchase"
SPILLERS_SET="q_copurchase q_kcore q_sparse_sim q_spatial_nn q_sssp"
ROUND_END_EPOCH=${ROUND_END_EPOCH:?pass the round-end epoch}

cd $REPO
SHA=$(git rev-parse HEAD)
echo "close_head=$SHA round_end=$ROUND_END_EPOCH started=$(date +%s)" >> $G

gate() {
  local rem=$(( ROUND_END_EPOCH - $(date +%s) ))
  local need=$(( $2 * $3 / 10 ))
  if [ $rem -lt $need ]; then
    echo "phase=$1 state=SKIP reason=clock remaining=${rem}s needed=${need}s precedent=${2}s" >> $G
    return 1
  fi
  echo "phase=$1 state=RUNNING remaining=${rem}s precedent=${2}s started=$(date +%s)" >> $G
  return 0
}
done_line() { echo "phase=$1 rc=$2 finished=$(date +%s)" >> $G; }
stamp() {
  local sha_after=$(git rev-parse HEAD)
  if [ "$SHA" = "$sha_after" ]; then echo "$sha_after" > "$1/HEAD_SHA"; fi
}

# ---- idle block: benches, strictly serial (r13 precedents) ----
if gate bench_100z 7100 20; then
  python3 tools/sweep_check.py --disk-gate /root/scaled 25 || exit 1
  SPARK_GRAFT_SF_DIR=/root/scaled/sfx100z SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    SPARK_GRAFT_BENCH_TIMEOUT=900 \
    sbt -batch "runMain graft.Bench" > $R/bench_100z.log 2>&1
  RC=$?
  grep -o '{"metric".*}' $R/bench_100z.log | tail -1 > /root/repo/BENCH_SFX100Z_r14.json
  python3 tools/sweep_check.py --bench $BENCH_ALLOW /root/repo/BENCH_SFX100Z_r14.json > $R/bench_gate.log 2>&1
  GRC=$?
  done_line bench_100z $((RC > GRC ? RC : GRC))
fi
if gate bench_10z 1800 20; then
  SPARK_GRAFT_SF_DIR=/root/scaled/sfx10z SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
    sbt -batch "runMain graft.Bench" > $R/bench_10z.log 2>&1
  RC=$?
  grep -o '{"metric".*}' $R/bench_10z.log | tail -1 > /root/repo/BENCH_SFX10Z_r14.json
  python3 tools/sweep_check.py --bench - /root/repo/BENCH_SFX10Z_r14.json >> $R/bench_gate.log 2>&1
  GRC=$?
  done_line bench_10z $((RC > GRC ? RC : GRC))
fi
if gate bench_sf01 1100 20; then
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" > $R/bench_sf01.log 2>&1
  RC=$?
  grep -o '{"metric".*}' $R/bench_sf01.log | tail -1 > /root/repo/BENCH_SF01_r14.json
  python3 tools/sweep_check.py --bench - /root/repo/BENCH_SF01_r14.json >> $R/bench_gate.log 2>&1
  GRC=$?
  done_line bench_sf01 $((RC > GRC ? RC : GRC))
fi

# ---- 100x dump (r13 measured 39m) ----
if gate tier100z_dump 2400 13; then
  python3 tools/sweep_check.py --disk-gate /root/scaled 45 || exit 1
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g SPARK_GRAFT_VERIFY_TIMEOUT=1800 \
    SPARK_GRAFT_SCALED_TWINS=1 \
    sbt -batch "runMain graft.Verify /root/scaled/sfx100z $R/tier100z" > $R/log_tier100z.log 2>&1
  RC=$?
  stamp $R/tier100z
  done_line tier100z_dump $RC
fi

# ---- combined light-check window: slice lane || 10x || sweeps
# (NO spiller lane here — lesson 3; sbt starts staggered — lesson 2)
if [ -d $R/tier100z ] && gate check_window 4200 13; then
  (
    python3 - <<EOF
import json
spill = set("$SPILLERS_SET".split())
qs = sorted(q for q in json.load(open('$R/tier100z/oracle_sql.json')) if q not in spill)
for i in range(4):
    open(f'$R/slice{i}.txt', 'w').write('\n'.join(qs[i::4]))
EOF
    SLICE_PIDS=""
    for i in 0 1 2 3; do
      CHECK_MEM=16GB CHECK_TMP=/root/scaled/ducktmp$i timeout 14400 \
        python3 -u tools/check.py /root/scaled/sfx100z $R/tier100z \
        $(cat $R/slice$i.txt) > $R/check_tier100z_s$i.log 2>&1 &
      SLICE_PIDS="$SLICE_PIDS $!"
    done
    # VERDICT r13 #2: wait each child pid and aggregate the REAL rcs
    # (the r13 bare `wait` dropped them; a later cleanup rm supplied a
    # phantom 0). Capture BEFORE any cleanup.
    SRC=0
    for p in $SLICE_PIDS; do wait $p; rc=$?; [ $rc -gt $SRC ] && SRC=$rc; done
    rm -rf /root/scaled/ducktmp0 /root/scaled/ducktmp1 /root/scaled/ducktmp2 /root/scaled/ducktmp3
    done_line lane_slices $SRC
    exit $SRC
  ) &
  T2=$!
  sleep 8
  (
    SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=20g SPARK_GRAFT_VERIFY_TIMEOUT=1800 \
      SPARK_GRAFT_SCALED_TWINS=1 \
      sbt -batch "runMain graft.Verify /root/scaled/sfx10z $R/tier10z" > $R/log_tier10z.log 2>&1
    RC=$?
    stamp $R/tier10z
    python3 - <<EOF
import json
qs = sorted(json.load(open('$R/tier10z/oracle_sql.json')))
for i in range(2):
    open(f'$R/slice10_{i}.txt', 'w').write('\n'.join(qs[i::2]))
EOF
    T10_PIDS=""
    for i in 0 1; do
      CHECK_MEM=12GB CHECK_TMP=/root/scaled/ducktmp10_$i timeout 10800 \
        python3 -u tools/check.py /root/scaled/sfx10z $R/tier10z \
        $(cat $R/slice10_$i.txt) > $R/check_tier10z_s$i.log 2>&1 &
      T10_PIDS="$T10_PIDS $!"
    done
    # VERDICT r13 #2: aggregate the Verify rc AND both slice-check rcs
    # (the r13 line recorded only the sbt rc, slice rcs died at `wait`).
    MAXRC=$RC
    for p in $T10_PIDS; do wait $p; rc=$?; [ $rc -gt $MAXRC ] && MAXRC=$rc; done
    rm -rf /root/scaled/ducktmp10_0 /root/scaled/ducktmp10_1
    done_line tier10z $MAXRC
    exit $MAXRC
  ) &
  T3=$!
  sleep 8
  (
    SPARK_GRAFT_CPUS=4 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $R/close_canon" > $R/log_canon.log 2>&1 &
    P1=$!
    sleep 8
    SPARK_GRAFT_CPUS=4 SPARK_GRAFT_SHUFFLE=7 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $R/close_shuf7" > $R/log_shuf7.log 2>&1 &
    P2=$!
    sleep 8
    SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $R/close_l32" > $R/log_l32.log 2>&1 &
    P3=$!
    wait $P1 $P2 $P3
    SPARK_GRAFT_CPUS=4 EXTRA_JAVA_OPTS="-Duser.timezone=America/New_York" \
      sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $R/close_tzny" > $R/log_tzny.log 2>&1 &
    P4=$!
    sleep 8
    SPARK_GRAFT_CPUS=4 EXTRA_JAVA_OPTS="-Duser.language=tr -Duser.country=TR -Duser.timezone=Europe/Istanbul" \
      sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $R/close_trtr" > $R/log_trtr.log 2>&1 &
    P5=$!
    wait $P4 $P5
    stamp $R/close_canon; stamp $R/close_shuf7; stamp $R/close_l32
    stamp $R/close_tzny; stamp $R/close_trtr
    python3 tools/compare_runs.py $R/close_canon $R/close_shuf7 $R/close_l32 $R/close_tzny $R/close_trtr > $R/compare_close.log 2>&1
    RC=$?
    python3 tools/check.py /root/testdata/sf0.01 $R/close_canon > $R/check_close_sf001.log 2>&1
    CRC=$?
    [ $CRC -gt $RC ] && RC=$CRC
    done_line sweeps $RC
    exit $RC
  ) &
  T4=$!
  # VERDICT r13 #2: the window rc is the MAX of its three lanes' real
  # aggregated rcs (each subshell exits with its own max), not a
  # hardcoded 0.
  WRC=0
  for p in $T2 $T3 $T4; do wait $p; rc=$?; [ $rc -gt $WRC ] && WRC=$rc; done
  done_line check_window $WRC
fi

# ---- spiller twins: SERIAL per-query, 100GB, cheap-first, box
# otherwise drained (r13's winning recipe; ~45 min total)
if [ -d $R/tier100z ] && gate spillers_serial 2700 13; then
  SPRC=0
  for q in $SPILLERS_CHEAP_FIRST; do
    CHECK_MEM=100GB CHECK_TMP=/root/scaled/ducktmpF timeout 2400 \
      python3 -u tools/check.py /root/scaled/sfx100z $R/tier100z $q \
      >> $R/check_tier100z_spill.log 2>&1
    rc=$?
    [ $rc -gt $SPRC ] && SPRC=$rc
    rm -rf /root/scaled/ducktmpF
  done
  done_line spillers_serial $SPRC
fi

# ---- machine-counted gates ----
if gate tally 300 10; then
  TRC=0
  if [ -d $R/tier100z ]; then
    python3 tools/sweep_check.py --tally $R/tier100z $TALLY_ALLOW $R/check_tier100z_*.log > $R/tally_100z.log 2>&1
    rc=$?; [ $rc -gt $TRC ] && TRC=$rc
    done_line tally_100z $rc
  fi
  if [ -d $R/tier10z ]; then
    python3 tools/sweep_check.py --tally $R/tier10z - $R/check_tier10z_s*.log > $R/tally_10z.log 2>&1
    rc=$?; [ $rc -gt $TRC ] && TRC=$rc
    done_line tally_10z $rc
  fi
  if [ -d $R/close_canon ]; then
    DIRS="$R/close_canon $R/close_shuf7 $R/close_l32 $R/close_tzny $R/close_trtr"
    [ -d $R/tier10z ] && DIRS="$DIRS $R/tier10z"
    [ -d $R/tier100z ] && DIRS="$DIRS $R/tier100z"
    python3 tools/sweep_check.py $DIRS > $R/sweep_check.log 2>&1
    rc=$?; [ $rc -gt $TRC ] && TRC=$rc
    done_line sweep_check $rc
  fi
  done_line tally $TRC
fi
echo "close_finished=$(date +%s)" >> $G
cat $G
echo DONE > $R/close.done
