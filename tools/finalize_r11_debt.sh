#!/bin/bash
# Finalize the r11 bench-debt repair (VERDICT r11 #1): extract the 100x
# bench JSON, run every gate, write /root/scaled/r11/gates.txt with the
# REAL return codes. Run only after bench_rerun.done exists.
set -x
cd /root/repo
R=/root/scaled/r11
[ -f $R/bench_rerun.done ] || { echo "100x bench not done"; exit 1; }
grep -o '{"metric".*}' $R/bench_100z.log | tail -1 > /root/repo/BENCH_SFX100Z_r11.json
[ -s /root/repo/BENCH_SFX100Z_r11.json ] || { echo "no final JSON in bench_100z.log"; exit 1; }
python3 tools/sweep_check.py --tally $R/tier100z q_prefix_join $R/check_tier100z_s*.log > $R/tally_100z.final.log 2>&1
T100=$?
python3 tools/sweep_check.py --tally $R/tier10z - $R/check_tier10z_s*.log > $R/tally_10z.final.log 2>&1
T10=$?
python3 tools/sweep_check.py --bench - BENCH_SF01_r11.json BENCH_SFX10Z_r11.json > $R/bench_gate.log 2>&1
B1=$?
python3 tools/sweep_check.py --bench q_prefix_join BENCH_SFX100Z_r11.json >> $R/bench_gate.log 2>&1
B2=$?
echo "gates: tally100=$T100 tally10=$T10 bench01_10=$B1 bench100=$B2" > $R/gates.txt
cat $R/gates.txt
