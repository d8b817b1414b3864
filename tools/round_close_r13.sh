#!/bin/bash
# Round-13 close harness (dev-only, same status as check.py).
#
# Discipline (VERDICT r12 #1-#3 + carried rules), changes vs r12:
#
#  1. CLOCK GATE (VERDICT r12 #3): every phase compares remaining round
#     budget against FACTOR x its measured r11-log precedent and writes
#     a named SKIP line to gates.txt on shortfall — no phase ever
#     starts doomed. FACTOR = 2.0 for benches (the class that died
#     twice; a cut bench log is worthless) and 1.3 for check/sweep
#     phases (a cut check leaves per-slice logs the tally merges, so
#     starting has partial value). ROUND_END_EPOCH passed by operator.
#
#  2. BENCHES FIRST, checks second — inverting the r10-carried
#     "benches strictly last", decided UP FRONT (this header predates
#     the run): the 100x bench is the artifact owed two rounds running
#     and it died both times precisely because it was scheduled last.
#     Benches need strict idleness; checks tolerate concurrency and
#     interruption, so they take the tail risk. VERDICT r12 #2: the
#     100x bench runs ONCE at the r13 close HEAD, diffed vs
#     BENCH_SFX100Z_r10 (the last completed one).
#
#  3. ONE COMBINED CHECK WINDOW after the 100x dump: spiller lane
#     (serial, CHECK_MEM=56GB) || 4x14GB slice lane || 10x dump+check
#     || 5 sf0.01 sweeps. Rationale: run fully serially these phases
#     do not fit any round that also carries a ~2h bench; the r11 logs
#     show check lanes and tier dumps already overlapped fine. Caps
#     are sized so realistic peak stays under RAM; any query that
#     fails from the tighter caps is retried SERIALLY at 90GB at the
#     end (retry_spill), clock-gated — checks are retryable, benches
#     are not, which is exactly why benches got the idle head.
#
#  4. The sf0.1 bench is NOT re-run by the close: the driver runs it
#     per-round anyway (BENCH_r13.json), and a near-idle smoke at the
#     close HEAD was extracted to BENCH_SF01_r13.json before launch
#     (provenance disclosed in SCALE_r13 §6). gates.txt carries a
#     named SKIP for it.
#
#  Carried: disk-headroom gates; scaled dumps export tier-switched
#  twins (SPARK_GRAFT_SCALED_TWINS=1); machine-counted close via
#  sweep_check --tally / --bench (allowlist = designed q_prefix_join
#  abort at 100x only); PINNED CLONE — the whole close runs from
#  $REPO (cp -a of /root/repo at the close HEAD) so dev work in
#  /root/repo cannot swap classes under a running close JVM.
#  gates.txt is APPEND-AS-YOU-GO: every phase writes RUNNING at start
#  and rc at end — a mid-phase cut is visible, never a silent hole.
set -x
REPO=${REPO:-/root/scaled/r13repo}
R=/root/scaled/r13
mkdir -p $R
G=$R/gates.txt
TALLY_ALLOW=q_prefix_join
BENCH_ALLOW=q_prefix_join
SPILLERS="q_attribution q_bm25 q_copurchase q_rrf_fusion q_sparse_sim q_spatial_nn q_sssp"
ROUND_END_EPOCH=${ROUND_END_EPOCH:?pass the round-end epoch}

cd $REPO
SHA=$(git rev-parse HEAD)
echo "close_head=$SHA round_end=$ROUND_END_EPOCH started=$(date +%s)" >> $G

# gate <phase> <precedent_secs> <factor_x10>  -> rc 0 = run, rc 1 = skip
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

# ---- idle block: benches, strictly serial, nothing else running ----

# phase A: 100x bench (precedent: r10 wall 7560s; factor 2.0)
if gate bench_100z 7560 20; then
  python3 tools/sweep_check.py --disk-gate /root/scaled 25 || exit 1
  SPARK_GRAFT_SF_DIR=/root/scaled/sfx100z SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    SPARK_GRAFT_BENCH_TIMEOUT=900 \
    sbt -batch "runMain graft.Bench" > $R/bench_100z.log 2>&1
  grep -o '{"metric".*}' $R/bench_100z.log | tail -1 > /root/repo/BENCH_SFX100Z_r13.json
  python3 tools/sweep_check.py --bench $BENCH_ALLOW /root/repo/BENCH_SFX100Z_r13.json > $R/bench_gate.log 2>&1
  done_line bench_100z $?
fi

# phase B: 10x bench (precedent: r11 wall 1980s; factor 2.0)
if gate bench_10z 1980 20; then
  SPARK_GRAFT_SF_DIR=/root/scaled/sfx10z SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
    sbt -batch "runMain graft.Bench" > $R/bench_10z.log 2>&1
  grep -o '{"metric".*}' $R/bench_10z.log | tail -1 > /root/repo/BENCH_SFX10Z_r13.json
  python3 tools/sweep_check.py --bench - /root/repo/BENCH_SFX10Z_r13.json >> $R/bench_gate.log 2>&1
  done_line bench_10z $?
fi

# phase C: sf0.1 bench — deliberate named SKIP (header note 4)
echo "phase=bench_sf01 state=SKIP reason=pre-extracted-smoke-at-HEAD+driver-runs-BENCH_r13 " >> $G

# ---- check block (concurrent dev work in /root/repo is fine) ----

# phase D: 100x dump (precedent: r11 2400s; factor 1.3)
if gate tier100z_dump 2400 13; then
  python3 tools/sweep_check.py --disk-gate /root/scaled 45 || exit 1
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g SPARK_GRAFT_VERIFY_TIMEOUT=1800 \
    SPARK_GRAFT_SCALED_TWINS=1 \
    sbt -batch "runMain graft.Verify /root/scaled/sfx100z $R/tier100z" > $R/log_tier100z.log 2>&1
  stamp $R/tier100z
  done_line tier100z_dump 0
fi

# phase E: combined check window — four concurrent tracks
# (precedent: max(track) ~5400s; factor 1.3)
if [ -d $R/tier100z ] && gate check_window 5400 13; then
  # track 1: spiller lane, serial within the lane, reduced cap
  (
    CHECK_MEM=56GB CHECK_TMP=/root/scaled/ducktmpA timeout 14400 \
      python3 tools/check.py /root/scaled/sfx100z $R/tier100z $SPILLERS \
      > $R/check_tier100z_big.log 2>&1
    rm -rf /root/scaled/ducktmpA
    done_line lane_spill $?
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
      CHECK_MEM=14GB CHECK_TMP=/root/scaled/ducktmp$i timeout 14400 \
        python3 tools/check.py /root/scaled/sfx100z $R/tier100z \
        $(cat $R/slice$i.txt) > $R/check_tier100z_s$i.log 2>&1 &
    done
    wait
    rm -rf /root/scaled/ducktmp0 /root/scaled/ducktmp1 /root/scaled/ducktmp2 /root/scaled/ducktmp3
    done_line lane_slices 0
  ) &
  T2=$!
  # track 3: 10x dump then its sliced check
  (
    if gate tier10z 2700 13; then
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
        CHECK_MEM=12GB CHECK_TMP=/root/scaled/ducktmp10_$i timeout 10800 \
          python3 tools/check.py /root/scaled/sfx10z $R/tier10z \
          $(cat $R/slice10_$i.txt) > $R/check_tier10z_s$i.log 2>&1 &
      done
      wait
      rm -rf /root/scaled/ducktmp10_0 /root/scaled/ducktmp10_1
      done_line tier10z 0
    fi
  ) &
  T3=$!
  # track 4: 5 determinism sweeps at sf0.01 (3 then 2)
  (
    if gate sweeps 2400 13; then
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
      done_line sweeps 0
    fi
  ) &
  T4=$!
  wait $T1 $T2 $T3 $T4
  done_line check_window 0
fi

# phase F: serial 90GB retry for any spiller the tighter cap failed
if [ -f $R/check_tier100z_big.log ]; then
  RETRY=$(grep -E "FAIL|ERR" $R/check_tier100z_big.log | grep -oE "q_[a-z0-9_]+" | sort -u | tr '\n' ' ')
  if [ -n "$RETRY" ] && gate retry_spill 3600 13; then
    CHECK_MEM=90GB CHECK_TMP=/root/scaled/ducktmpR timeout 10800 \
      python3 tools/check.py /root/scaled/sfx100z $R/tier100z $RETRY \
      > $R/check_tier100z_retry.log 2>&1
    rm -rf /root/scaled/ducktmpR
    done_line retry_spill $?
  fi
fi

# ---- machine-counted gates (any UNTRIAGED line fails the close) ----
if gate tally 300 10; then
  if [ -d $R/tier100z ]; then
    python3 tools/sweep_check.py --tally $R/tier100z $TALLY_ALLOW $R/check_tier100z_*.log > $R/tally_100z.log 2>&1
    done_line tally_100z $?
  fi
  if [ -d $R/tier10z ]; then
    python3 tools/sweep_check.py --tally $R/tier10z - $R/check_tier10z_s*.log > $R/tally_10z.log 2>&1
    done_line tally_10z $?
  fi
  if [ -d $R/close_canon ]; then
    DIRS="$R/close_canon $R/close_shuf7 $R/close_l32 $R/close_tzny $R/close_trtr"
    [ -d $R/tier10z ] && DIRS="$DIRS $R/tier10z"
    [ -d $R/tier100z ] && DIRS="$DIRS $R/tier100z"
    python3 tools/sweep_check.py $DIRS > $R/sweep_check.log 2>&1
    done_line sweep_check $?
  fi
  done_line tally 0
fi
echo "close_finished=$(date +%s)" >> $G
cat $G
echo DONE > $R/close.done
