"""Round-5 lever-2 measurement: the fused SPMD crout LU rank program
(Px==1 multiplier reuse — no L10 TRSM; identity-reorder elision; emit-once
F write) at the N=16384 1x1x1 'high' proxy. r4 baseline: 273.6 ms
(v=1024 rowpart=2); single-chip crout kernel: 177 ms; VERDICT bar:
<= 195 ms. Also re-times the v=1024 rowpart=1 arm (rebalance cadence may
flip once the TRSM is gone) and the N=32768 f32 crout arm for the
variant_dispatch 32768 row.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
    experiments/prof_r5_spmd_fused.py > /tmp/prof_r5_spmd_fused.log 2>&1 &
"""

from experiments.prof_spmd_crout import timing


def main():
    n = 16384
    timing(n, 1024, rowpart=2)   # r4 best config: 273.6 ms
    timing(n, 1024, rowpart=1)
    timing(n, 1536, rowpart=2)
    print("done", flush=True)


if __name__ == "__main__":
    main()
