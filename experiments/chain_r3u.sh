#!/bin/bash
# Round-3 chip queue r3u: crout compaction-cadence sweep (waits for r3t).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
timeout 9000 python experiments/prof_r3p_cadence.py > /tmp/prof_r3p.log 2>&1
echo "[chain-u] cadence done $(date)" >> /tmp/chain_r3u.log
echo "[chain-u] ALL done $(date)" >> /tmp/chain_r3u.log
