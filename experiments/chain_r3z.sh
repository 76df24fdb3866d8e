#!/bin/bash
# Round-3 continuation chain after the machine restart wiped /tmp and the
# compile cache. Serial chip jobs, highest value first:
#   1. run_xla_baseline: fill the missing lu,xla rows at N=16384/32768
#      (VERDICT #2 — the script skips pairs already archived)
#   2. bench.py: repopulate .jax_cache for the driver run + verify the
#      863 ms crout-high headline reproduces (VERDICT #1)
#   3. prof_spmd1: 1x1x1 rank-program timing (VERDICT #4 gate)
#   4. prof_chol65536: bf16-STORAGE N=65536 Cholesky + residual (VERDICT #6)
# Usage: nohup bash experiments/chain_r3z.sh > /tmp/chain_r3z.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
timeout 3600 python experiments/run_xla_baseline.py \
  > /tmp/xla_baseline.log 2>&1
echo "[chain-z] xla baseline done $(date)"
timeout 3600 python bench.py > /tmp/bench_r3.log 2>&1
echo "[chain-z] bench done $(date)"
timeout 5400 python experiments/prof_spmd1.py > /tmp/prof_spmd1.log 2>&1
echo "[chain-z] spmd1 done $(date)"
timeout 5400 python experiments/prof_chol65536.py > /tmp/prof_chol65536.log 2>&1
echo "[chain-z] chol65536 done $(date)"
echo "[chain-z] ALL done $(date)"
