#!/bin/bash
# Round-3 chip chain (serialized — one job owns the chip at a time):
#   0. wait for the running prof_65536 flat LU probe (pid file)
#   1. run_archive_head: crout v=1536 headline rows -> benchmarks.csv
#   2. bench.py once (warms the exact driver cache entry + records JSON)
#   3. SUB=16 two-level A/B (kchain + e2e + residual)
#   4. EXTRACT_PREC=high A/B (kchain + e2e + residual)
# Usage: nohup bash experiments/chain_r3x.sh > /tmp/chain_r3x.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
PID=$(cat /tmp/run65536.pid 2>/dev/null)
if [ -n "$PID" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 30; done
fi
echo "[chain-x] 65536 probe done $(date)"
timeout 5400 python experiments/run_archive_head.py \
  > /tmp/run_archive_head.log 2>&1
echo "[chain-x] archive head done $(date)"
timeout 3600 python bench.py > /tmp/bench_r3x.json 2>/tmp/bench_r3x.err
echo "[chain-x] bench done $(date)"
CONFLUX_PANEL_SUB=16 timeout 9000 python experiments/prof_r3v_leaf.py \
  > /tmp/prof_sub16.log 2>&1
echo "[chain-x] sub16 done $(date)"
CONFLUX_EXTRACT_PREC=high timeout 9000 python experiments/prof_r3v_leaf.py \
  > /tmp/prof_xprec.log 2>&1
echo "[chain-x] xprec done $(date)"
echo "[chain-x] ALL done $(date)"
