#!/bin/bash
# Follow-on to chain_r3z: the SUB=16 panel-kernel A/B (cheap kchain floor
# first, e2e only on a >10% kernel win).
# Usage: nohup bash experiments/chain_r3z2.sh > /tmp/chain_r3z2.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
PID=$(cat /tmp/chain_r3z.pid 2>/dev/null)
if [ -n "$PID" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 30; done
fi
echo "[chain-z2] r3z done $(date)"
timeout 5400 python experiments/prof_sub16_kchain.py > /tmp/prof_sub16.log 2>&1
echo "[chain-z2] sub16 done $(date)"
echo "[chain-z2] ALL done $(date)"
