#!/bin/bash
# Round-3 chip queue r3w: N=65536 stepped-driver measurements (waits for
# r3v). LU bf16-STORAGE flat-vs-crout stepped + full blocked residual,
# then the Cholesky bf16s N=65536 probe (retry — first attempt died on a
# remote-compile-helper flake, /tmp/prof_chol65536.log 2026-08-19).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
timeout 9000 python experiments/prof_65536.py > /tmp/prof_65536.log 2>&1
echo "[chain-w] lu65536 done $(date)" >> /tmp/chain_r3w.log
timeout 9000 python experiments/prof_chol65536.py > /tmp/prof_chol65536.log 2>&1
echo "[chain-w] chol65536 done $(date)" >> /tmp/chain_r3w.log
echo "[chain-w] ALL done $(date)" >> /tmp/chain_r3w.log
