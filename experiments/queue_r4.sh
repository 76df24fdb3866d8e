#!/bin/bash
# Round-4 serial chip queue, part A (VERDICT items 2/3/4/5): runs each
# experiment to completion IN THIS SHELL — no pid-file gating between
# stages (the round-3 chains waited on pid files nothing wrote, ADVICE r3).
# The shell writes its OWN pid so the operator can kill the whole queue.
#
# Run: nohup bash experiments/queue_r4.sh > /tmp/queue_r4.log 2>&1 &
set -x
echo $$ > /tmp/queue_r4.pid
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

echo "[q4] sub16 kchain start $(date)"
timeout 5400 python experiments/prof_sub16_kchain.py > /tmp/prof_sub16.log 2>&1
echo "[q4] sub16 done rc=$? $(date)"

echo "[q4] bigk A/B start $(date)"
timeout 5400 python experiments/prof_bigk_ab.py > /tmp/prof_bigk_ab.log 2>&1
echo "[q4] bigk done rc=$? $(date)"

echo "[q4] windowed32k start $(date)"
timeout 5400 python experiments/prof_windowed32k.py > /tmp/prof_windowed32k.log 2>&1
echo "[q4] windowed32k done rc=$? $(date)"

echo "[q4] archive65536 start $(date)"
timeout 10800 python experiments/run_archive_65536.py > /tmp/run_archive_65536.log 2>&1
echo "[q4] archive65536 done rc=$? $(date)"

echo "[q4] ALL done $(date)"
