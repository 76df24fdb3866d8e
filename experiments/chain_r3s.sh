#!/bin/bash
# Round-3 chip queue r3s: panel merged=False + extraction-precision A/B.
# Waits for the r3r queue (pid $1) to release the chip first.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
CONFLUX_EXTRACT_PREC=highest timeout 5400 python experiments/prof_panel_attr2.py chain > /tmp/prof_panel_attr2_hi.log 2>&1
echo "[chain-s] attr2 highest done $(date)" >> /tmp/chain_r3s.log
CONFLUX_EXTRACT_PREC=high timeout 5400 python experiments/prof_panel_attr2.py > /tmp/prof_panel_attr2_xh.log 2>&1
echo "[chain-s] attr2 high done $(date)" >> /tmp/chain_r3s.log
echo "[chain-s] ALL done $(date)" >> /tmp/chain_r3s.log
