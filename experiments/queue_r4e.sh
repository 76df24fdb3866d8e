#!/bin/bash
# Round-4 chip queue, part E (replaces the dead parts C/D — their log-poll
# matched the `set -x` trace of OTHER scripts' `grep 'ALL done'` commands
# and fired early, running two chip jobs concurrently; this poll matches
# the part-B-specific completion tag, which appears in part B's log only
# when its final echo executes).
#
# Jobs: (1) per-step attribution of the degraded N=65536 LU (dus-copy vs
# HBM-pressure discriminator), (2) the clean LU 65536 re-archive A/B,
# (3) the crout v-sweep (killed mid-run when the early-start was caught),
# (4) the windowed-32k bisect.
#
# Run: nohup bash experiments/queue_r4e.sh > /tmp/queue_r4e.log 2>&1 &
set -x
echo $$ > /tmp/queue_r4e.pid
export PYTHONPATH=/root/repo:/root/.axon_site:/root/repo/experiments
cd /root/repo

while ! grep -q "q4b.*ALL.done" /tmp/queue_r4b.log 2>/dev/null; do
  sleep 60
done
echo "[q4e] part B complete, starting $(date)"

echo "[q4e] 65536 step attribution start $(date)"
timeout 5400 python experiments/prof_65536_steps.py > /tmp/prof_65536_steps.log 2>&1
echo "[q4e] 65536 step attribution done rc=$? $(date)"

echo "[q4e] lu65536 retime start $(date)"
timeout 10800 python experiments/run_lu65536_retime.py > /tmp/run_lu65536_retime.log 2>&1
echo "[q4e] lu65536 retime done rc=$? $(date)"

echo "[q4e] crout v-sweep start $(date)"
timeout 7200 python experiments/prof_crout_v.py > /tmp/prof_crout_v.log 2>&1
echo "[q4e] crout v-sweep done rc=$? $(date)"

echo "[q4e] windowed32k bisect start $(date)"
timeout 7200 python experiments/prof_windowed32k_retry2.py > /tmp/prof_windowed32k_retry2.log 2>&1
echo "[q4e] windowed32k bisect done rc=$? $(date)"

echo "[q4e] COMPLETE-E $(date)"
