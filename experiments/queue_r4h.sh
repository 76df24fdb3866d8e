#!/bin/bash
# Round-4 chip queue, part H (supersedes G's tail): waits for the
# running prof_spmd_crout2 (its own "done" marker or 15-min staleness),
# then runs the remainder with the NEW bands arm first — it decides the
# default F carry of the crout rank program, the round's top item.
#
# Run: nohup bash experiments/queue_r4h.sh > /tmp/queue_r4h.log 2>&1 &
set -x
echo $$ > /tmp/queue_r4h.pid
export PYTHONPATH=/root/repo:/root/.axon_site:/root/repo/experiments
cd /root/repo

while ! grep -q "^done" /tmp/prof_spmd_crout2.log 2>/dev/null; do
  if [ -f /tmp/prof_spmd_crout2.log ]; then
    age=$(( $(date +%s) - $(stat -c %Y /tmp/prof_spmd_crout2.log) ))
    if [ "$age" -gt 900 ]; then
      echo "[q4h] crout2 log stale ${age}s - proceeding"
      break
    fi
  fi
  sleep 60
done
echo "[q4h] crout2 finished, starting $(date)"

echo "[q4h] bands arm start $(date)"
timeout 5400 python experiments/prof_spmd_bands.py > /tmp/prof_spmd_bands.log 2>&1
echo "[q4h] bands arm done rc=$? $(date)"

echo "[q4h] bigk e2e A/B start $(date)"
timeout 7200 python experiments/prof_bigk_ab.py > /tmp/prof_bigk_ab2.log 2>&1
echo "[q4h] bigk e2e A/B done rc=$? $(date)"

echo "[q4h] crout v-sweep start $(date)"
timeout 5400 python experiments/prof_crout_v.py > /tmp/prof_crout_v.log 2>&1
echo "[q4h] crout v-sweep done rc=$? $(date)"

echo "[q4h] lu65536 retime start $(date)"
timeout 9000 python experiments/run_lu65536_retime.py > /tmp/run_lu65536_retime.log 2>&1
echo "[q4h] lu65536 retime done rc=$? $(date)"

echo "[q4h] 65536 step attribution start $(date)"
timeout 4200 python experiments/prof_65536_steps.py > /tmp/prof_65536_steps.log 2>&1
echo "[q4h] 65536 step attribution done rc=$? $(date)"

echo "[q4h] windowed32k bisect start $(date)"
timeout 5400 python experiments/prof_windowed32k_retry2.py > /tmp/prof_windowed32k_retry2.log 2>&1
echo "[q4h] windowed32k bisect done rc=$? $(date)"

echo "[q4h] pallas_gemm regen start $(date)"
timeout 5400 python experiments/regen_pallas_gemm.py > /tmp/regen_pallas_gemm.log 2>&1
echo "[q4h] pallas_gemm regen done rc=$? $(date)"

echo "[q4h] weak sweep start $(date)"
timeout 5400 python -m conflux_tpu.cli.sweep configs/params_weak.ini > /tmp/weak_sweep.log 2>&1
echo "[q4h] weak sweep done rc=$? $(date)"

echo "[q4h] COMPLETE-H $(date)"
