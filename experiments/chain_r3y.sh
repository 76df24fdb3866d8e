#!/bin/bash
# Follow-on chip chain after chain_r3x.sh (reordered: the N=65536 stepped
# per-step attribution outranks the dispatch-CSV regen):
#   1. prof_65536_steps: per-step device time, chunk 8192 vs 4096
#   2. prof_spmd1: 1x1x1 rank-program timing (VERDICT r2 item-4 gate)
#   3. prof_dispatch2: amortized variant-dispatch CSV regeneration
# Usage: nohup bash experiments/chain_r3y.sh > /tmp/chain_r3y.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
PID=$(cat /tmp/chain_r3x.pid 2>/dev/null)
if [ -n "$PID" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 30; done
fi
echo "[chain-y] r3x done $(date)"
timeout 5400 python experiments/prof_65536_steps.py \
  > /tmp/prof_65536_steps.log 2>&1
echo "[chain-y] 65536 steps done $(date)"
timeout 7200 python experiments/prof_spmd1.py > /tmp/prof_spmd1.log 2>&1
echo "[chain-y] spmd1 done $(date)"
timeout 9000 python experiments/prof_dispatch2.py > /tmp/prof_dispatch2.log 2>&1
echo "[chain-y] dispatch2 done $(date)"
echo "[chain-y] ALL done $(date)"
