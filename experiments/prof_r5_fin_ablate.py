"""Attribute the remaining SPMD-vs-single-chip crout gap after the
round-5 fusions (fin path: 222.4 ms vs the 177 ms single-chip kernel at
N=16384 v=1024 'high'): component ablations (CONFLUX_CROUT_ABLATE) on the
fused program + a rebalance-cadence sweep (the TRSM drop and the
merged=False finishing changed the per-step cost balance, so r4's
rowpart=2 optimum may have moved).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
    experiments/prof_r5_fin_ablate.py > /tmp/prof_r5_fin_ablate.log 2>&1 &
"""

import os

from experiments.prof_spmd_crout import timing


def main():
    n = 16384
    timing(n, 1024, rowpart=2, label=" base")   # post block=128 baseline
    for ab in ("slab", "corr", "trsm"):
        os.environ["CONFLUX_CROUT_ABLATE"] = ab
        timing(n, 1024, rowpart=2, label=f" ablate={ab}")
    os.environ["CONFLUX_CROUT_ABLATE"] = ""
    for rp in (3, 4, 8):
        timing(n, 1024, rowpart=rp, label=f" cadence")
    print("done", flush=True)


if __name__ == "__main__":
    main()
