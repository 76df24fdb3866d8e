#!/bin/bash
# Round-3 chip queue r3v: three-level panel kernel A/B (waits for r3u).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
CONFLUX_PANEL_LEAF=8 timeout 9000 \
  python experiments/prof_r3v_leaf.py > /tmp/prof_r3v_leaf8.log 2>&1
echo "[chain-v] leaf8 done $(date)" >> /tmp/chain_r3v.log
echo "[chain-v] ALL done $(date)" >> /tmp/chain_r3v.log
