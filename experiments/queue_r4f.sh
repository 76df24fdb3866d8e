#!/bin/bash
# Round-4 chip queue, part F (supersedes part E, which was killed while
# still waiting): prioritized remainder of the round. Polls part B's log
# for its part-B-specific completion tag (cannot match `set -x` traces of
# other scripts' polls — the r4c/r4d bug).
#
# Priority: (1) SPMD-crout gap attribution (VERDICT top item), (2) the
# CROUT_BIGK e2e A/B rerun with the pallas-chain breaker (headline
# <=700 ms lever), (3) clean LU-65536 re-archive, (4) crout v-sweep,
# (5) 65536 per-step attribution, (6) windowed-32k bisect.
#
# Run: nohup bash experiments/queue_r4f.sh > /tmp/queue_r4f.log 2>&1 &
set -x
echo $$ > /tmp/queue_r4f.pid
export PYTHONPATH=/root/repo:/root/.axon_site:/root/repo/experiments
cd /root/repo

while ! grep -q "q4b.*ALL.done" /tmp/queue_r4b.log 2>/dev/null; do
  sleep 60
done
echo "[q4f] part B complete, starting $(date)"

echo "[q4f] spmd-crout2 start $(date)"
timeout 7200 python experiments/prof_spmd_crout2.py > /tmp/prof_spmd_crout2.log 2>&1
echo "[q4f] spmd-crout2 done rc=$? $(date)"

echo "[q4f] bigk e2e A/B rerun start $(date)"
timeout 7200 python experiments/prof_bigk_ab.py > /tmp/prof_bigk_ab2.log 2>&1
echo "[q4f] bigk e2e A/B done rc=$? $(date)"

echo "[q4f] lu65536 retime start $(date)"
timeout 10800 python experiments/run_lu65536_retime.py > /tmp/run_lu65536_retime.log 2>&1
echo "[q4f] lu65536 retime done rc=$? $(date)"

echo "[q4f] crout v-sweep start $(date)"
timeout 7200 python experiments/prof_crout_v.py > /tmp/prof_crout_v.log 2>&1
echo "[q4f] crout v-sweep done rc=$? $(date)"

echo "[q4f] 65536 step attribution start $(date)"
timeout 5400 python experiments/prof_65536_steps.py > /tmp/prof_65536_steps.log 2>&1
echo "[q4f] 65536 step attribution done rc=$? $(date)"

echo "[q4f] windowed32k bisect start $(date)"
timeout 7200 python experiments/prof_windowed32k_retry2.py > /tmp/prof_windowed32k_retry2.log 2>&1
echo "[q4f] windowed32k bisect done rc=$? $(date)"

echo "[q4f] COMPLETE-F $(date)"
