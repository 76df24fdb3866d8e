#!/bin/bash
# Final round-3 chain link: N=65536 stepped per-step attribution (HBM-cliff
# chunk A/B) — runs after chain_r3z2.
# Usage: nohup bash experiments/chain_r3z3.sh > /tmp/chain_r3z3.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
PID=$(cat /tmp/chain_r3z2.pid 2>/dev/null)
if [ -n "$PID" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 30; done
fi
echo "[chain-z3] r3z2 done $(date)"
timeout 5400 python experiments/prof_65536_steps.py \
  > /tmp/prof_65536_steps.log 2>&1
echo "[chain-z3] 65536 steps done $(date)"
echo "[chain-z3] ALL done $(date)"
