#!/bin/bash
# Round-3 chip queue r3t: TRSM outer-GEMM precision A/B (waits for r3s).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
CONFLUX_TRSM_OUTER_PREC=high CONFLUX_EXTRACT_PREC=high timeout 5400 \
  python experiments/prof_trsm_prec.py > /tmp/prof_trsm_prec.log 2>&1
echo "[chain-t] trsm high done $(date)" >> /tmp/chain_r3t.log
echo "[chain-t] ALL done $(date)" >> /tmp/chain_r3t.log
