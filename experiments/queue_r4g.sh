#!/bin/bash
# Round-4 chip queue, part G (MASTER — supersedes killed parts B-tail and
# F): waits for the still-running dispatch regen by polling ITS OWN log
# for the final "done" line, then runs the round's remaining chip work in
# value order. High-value attribution/decision runs first, artifact
# regeneration last, so an end-of-round cutoff costs the least.
#
# Run: nohup bash experiments/queue_r4g.sh > /tmp/queue_r4g.log 2>&1 &
set -x
echo $$ > /tmp/queue_r4g.pid
export PYTHONPATH=/root/repo:/root/.axon_site:/root/repo/experiments
cd /root/repo

while ! grep -q "^done" /tmp/prof_dispatch2_r4.log 2>/dev/null; do
  # the dispatch regen may also die without its marker — bail to the
  # queue when its log stops growing for 15 min
  if [ -f /tmp/prof_dispatch2_r4.log ]; then
    age=$(( $(date +%s) - $(stat -c %Y /tmp/prof_dispatch2_r4.log) ))
    if [ "$age" -gt 900 ]; then
      echo "[q4g] dispatch log stale ${age}s - proceeding"
      break
    fi
  fi
  sleep 60
done
echo "[q4g] dispatch regen finished, starting $(date)"

echo "[q4g] spmd-crout2 start $(date)"
timeout 7200 python experiments/prof_spmd_crout2.py > /tmp/prof_spmd_crout2.log 2>&1
echo "[q4g] spmd-crout2 done rc=$? $(date)"

echo "[q4g] bigk e2e A/B start $(date)"
timeout 7200 python experiments/prof_bigk_ab.py > /tmp/prof_bigk_ab2.log 2>&1
echo "[q4g] bigk e2e A/B done rc=$? $(date)"

echo "[q4g] crout v-sweep start $(date)"
timeout 5400 python experiments/prof_crout_v.py > /tmp/prof_crout_v.log 2>&1
echo "[q4g] crout v-sweep done rc=$? $(date)"

echo "[q4g] lu65536 retime start $(date)"
timeout 9000 python experiments/run_lu65536_retime.py > /tmp/run_lu65536_retime.log 2>&1
echo "[q4g] lu65536 retime done rc=$? $(date)"

echo "[q4g] 65536 step attribution start $(date)"
timeout 4200 python experiments/prof_65536_steps.py > /tmp/prof_65536_steps.log 2>&1
echo "[q4g] 65536 step attribution done rc=$? $(date)"

echo "[q4g] windowed32k bisect start $(date)"
timeout 5400 python experiments/prof_windowed32k_retry2.py > /tmp/prof_windowed32k_retry2.log 2>&1
echo "[q4g] windowed32k bisect done rc=$? $(date)"

echo "[q4g] pallas_gemm regen start $(date)"
timeout 5400 python experiments/regen_pallas_gemm.py > /tmp/regen_pallas_gemm.log 2>&1
echo "[q4g] pallas_gemm regen done rc=$? $(date)"

echo "[q4g] weak sweep start $(date)"
timeout 5400 python -m conflux_tpu.cli.sweep configs/params_weak.ini > /tmp/weak_sweep.log 2>&1
echo "[q4g] weak sweep done rc=$? $(date)"

echo "[q4g] COMPLETE-G $(date)"
