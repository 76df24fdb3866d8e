#!/bin/bash
# Round-3 chip queue (serialized — one job owns the chip at a time):
#  1. verify_stepped_dyn — on-chip smoke of the dynamic-k stepped drivers
#     (Mosaic kernel inside lax.cond is new program shape)
#  2. prof_crout_components — headline time attribution at N=32768
#  3. prof_65536_flat — N=65536 bf16s LU via the dyn stepped driver
#  4. prof_chol65536 — N=65536 bf16s Cholesky via the dyn stepped driver
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
# wait for the dispatch sweep (pid passed as $1, if any) to release the chip
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
timeout 1800 python experiments/verify_stepped_dyn.py > /tmp/verify_stepped_dyn.log 2>&1
echo "[chain-q] verify_stepped_dyn done $(date)" >> /tmp/chain_r3q.log
timeout 3600 python experiments/prof_crout_components.py > /tmp/prof_crout_components.log 2>&1
echo "[chain-q] components done $(date)" >> /tmp/chain_r3q.log
timeout 5400 python experiments/prof_65536_flat.py > /tmp/prof_65536_flat.log 2>&1
echo "[chain-q] 65536 LU done $(date)" >> /tmp/chain_r3q.log
timeout 5400 python experiments/prof_chol65536.py > /tmp/prof_chol65536.log 2>&1
echo "[chain-q] 65536 chol done $(date)" >> /tmp/chain_r3q.log
echo "[chain-q] ALL done $(date)" >> /tmp/chain_r3q.log
