#!/bin/bash
# Round-4 chip queue, part B: waits for part A by polling ITS LOG for the
# completion line (never a pid file nothing writes — ADVICE r3), then runs
# the crout-SPMD proxy, the variant-dispatch regen (now incl. crout), the
# K-amortized pallas_gemm regen, and the weak-scaling sweep.
#
# Run: nohup bash experiments/queue_r4b.sh > /tmp/queue_r4b.log 2>&1 &
set -x
echo $$ > /tmp/queue_r4b.pid
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

while ! grep -q "ALL done" /tmp/queue_r4.log 2>/dev/null; do
  sleep 60
done
echo "[q4b] part A complete, starting $(date)"

echo "[q4b] spmd-crout start $(date)"
timeout 5400 python experiments/prof_spmd_crout.py > /tmp/prof_spmd_crout.log 2>&1
echo "[q4b] spmd-crout done rc=$? $(date)"

echo "[q4b] dispatch regen start $(date)"
timeout 7200 python experiments/prof_dispatch2.py > /tmp/prof_dispatch2_r4.log 2>&1
echo "[q4b] dispatch regen done rc=$? $(date)"

echo "[q4b] pallas_gemm regen start $(date)"
timeout 5400 python experiments/regen_pallas_gemm.py > /tmp/regen_pallas_gemm.log 2>&1
echo "[q4b] pallas_gemm regen done rc=$? $(date)"

echo "[q4b] weak sweep start $(date)"
timeout 5400 python -m conflux_tpu.cli.sweep configs/params_weak.ini > /tmp/weak_sweep.log 2>&1
echo "[q4b] weak sweep done rc=$? $(date)"

echo "[q4b] ALL done $(date)"
