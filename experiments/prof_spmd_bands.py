"""The 'bands' F-carry chip arm (follow-up to prof_spmd_crout2's
attribution: monolithic-F row-dus costs ~95 ms of the 279 ms N=16384
proxy; 'skip' floor 184.5 ms; 'col' no help). Bands carries F as a list
of row-block values — if it lands near the skip floor, it becomes the
default and the SPMD crout LU reaches ~184 ms vs the 177 ms single-chip
target (the VERDICT r3 top-item gate is <= ~195 ms).

Run: PYTHONPATH=/root/repo:/root/.axon_site:/root/repo/experiments nohup \
  python experiments/prof_spmd_bands.py > /tmp/prof_spmd_bands.log 2>&1 &
"""

import os
import subprocess
import sys

sys.path.insert(0, "/root/repo/experiments")
from prof_spmd_crout2 import CODE


def arm(fmode, rowpart):
    env = dict(os.environ, PYTHONPATH="/root/repo:/root/.axon_site",
               CONFLUX_CROUT_FMODE=fmode)
    r = subprocess.run([sys.executable, "-c", CODE, str(rowpart)], env=env,
                       capture_output=True, text=True, timeout=3600)
    out = [ln for ln in r.stdout.splitlines() if ln.startswith("ARM")]
    if out:
        print(out[0], flush=True)
    else:
        print(f"arm fmode={fmode} rowpart={rowpart}: FAIL rc={r.returncode}\n"
              f"{r.stderr[-600:]}", flush=True)


def main():
    arm("bands", 2)
    arm("bands", 1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
