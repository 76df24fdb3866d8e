"""Per-component ablation of the SPMD crout LU (N=16384 v=1024
rowpart=2, 1x1x1): the skip arm showed the U12 cone costs ~95 ms of the
279 ms proxy; these arms split that into the step-0 panel-assembly GEMM
('slab'), the steps-2/3 U12 correction GEMM + L-history gather ('corr'),
and the U12 TRSM ('trsm'). Baseline - arm = that component's cost
(factors are wrong in ablation arms; timing-only).

Run: PYTHONPATH=/root/repo:/root/.axon_site:/root/repo/experiments nohup \
  python experiments/prof_spmd_ablate.py > /tmp/prof_spmd_ablate.log 2>&1 &
"""

import os
import subprocess
import sys

sys.path.insert(0, "/root/repo/experiments")
from prof_spmd_crout2 import CODE


def arm(ablate):
    env = dict(os.environ, PYTHONPATH="/root/repo:/root/.axon_site",
               CONFLUX_CROUT_ABLATE=ablate)
    r = subprocess.run([sys.executable, "-c", CODE, "2"], env=env,
                       capture_output=True, text=True, timeout=3600)
    out = [ln for ln in r.stdout.splitlines() if ln.startswith("ARM")]
    if out:
        print(f"ablate={ablate or 'none'}: {out[0]}", flush=True)
    else:
        print(f"ablate={ablate}: FAIL rc={r.returncode}\n{r.stderr[-600:]}",
              flush=True)


def main():
    arm("corr")
    arm("trsm")
    arm("slab")
    print("done", flush=True)


if __name__ == "__main__":
    main()
