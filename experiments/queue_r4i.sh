#!/bin/bash
# Round-4 chip queue, part I: after part H completes, classify the
# N=32768 SPMD compile kill and run the crout-gap component ablations.
#
# Run: nohup bash experiments/queue_r4i.sh > /tmp/queue_r4i.log 2>&1 &
set -x
echo $$ > /tmp/queue_r4i.pid
export PYTHONPATH=/root/repo:/root/.axon_site:/root/repo/experiments
cd /root/repo

while ! grep -q "COMPLETE-H" /tmp/queue_r4h.log 2>/dev/null; do
  sleep 60
done
echo "[q4i] part H complete, starting $(date)"

echo "[q4i] win32k class start $(date)"
timeout 5400 python experiments/prof_win32k_class.py > /tmp/prof_win32k_class.log 2>&1
echo "[q4i] win32k class done rc=$? $(date)"

echo "[q4i] spmd ablate start $(date)"
timeout 5400 python experiments/prof_spmd_ablate.py > /tmp/prof_spmd_ablate.log 2>&1
echo "[q4i] spmd ablate done rc=$? $(date)"

echo "[q4i] COMPLETE-I $(date)"
