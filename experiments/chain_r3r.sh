#!/bin/bash
# Round-3 chip queue r3r (serialized — one job owns the chip at a time):
#  1. prof_panel_attr       — panel_fac stage attribution at the headline
#  2. prof_crout_components — rerun: pivrows OOM fixed (no 4 GB pre-slice)
#  3. prof_chol65536        — rerun: generator dtype bug fixed
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
timeout 3600 python experiments/prof_panel_attr.py > /tmp/prof_panel_attr.log 2>&1
echo "[chain-r] panel_attr done $(date)" >> /tmp/chain_r3r.log
timeout 3600 python experiments/prof_crout_components.py > /tmp/prof_crout_components.log 2>&1
echo "[chain-r] components done $(date)" >> /tmp/chain_r3r.log
timeout 5400 python experiments/prof_chol65536.py > /tmp/prof_chol65536.log 2>&1
echo "[chain-r] 65536 chol done $(date)" >> /tmp/chain_r3r.log
echo "[chain-r] ALL done $(date)" >> /tmp/chain_r3r.log
