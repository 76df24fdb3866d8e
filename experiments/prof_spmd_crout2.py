"""SPMD-crout gap attribution round 2: the best round-1 config
(N=16384 v=1024 rowpart=2) sits at 273.6 ms vs the 177 ms single-chip
crout target (/tmp/prof_spmd_crout.log). Prime suspect: the per-step
F.at[r0f:r0f+v, :].set ROW-offset dus — the exact class CLAUDE.md
documents as de-aliasing (a full [Ml, Nl] copy per step would be
~2.8 ms x 16 steps ~= 45 ms; A's writes would double it).

Arms (subprocess each — CONFLUX_CROUT_FMODE is read at trace time):
  row    — baseline re-measure;
  skip   — F write dropped entirely (factors wrong; isolates write cost);
  col    — F carried transposed: column-offset dus + transposed-contraction
           GEMM reads (schur_dot bt=True), results bit-identical (CPU-mesh
           verified);
  col @ rowpart=1 — if col removes the write cost, per-step rebalance
           (fewer GEMM FLOPs) may flip back to a win.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
    experiments/prof_spmd_crout2.py > /tmp/prof_spmd_crout2.log 2>&1 &
"""

import os
import subprocess
import sys

CODE = r"""
import os, sys, time
from functools import partial
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P
from conflux_tpu.grid import make_grid
from conflux_tpu.layout import BlockCyclic
from conflux_tpu.lu.p25d import _local_lu_25d_crout

n, v = 16384, 1024
rowpart = int(sys.argv[1])
fmode = os.environ.get("CONFLUX_CROUT_FMODE", "row")
grid = make_grid((1, 1, 1))
desc = BlockCyclic.create(n, n, v, grid)
body = partial(_local_lu_25d_crout, desc, "tournament", "high",
               rowpart=rowpart)
fn = shard_map(body, mesh=desc.grid.mesh,
               in_specs=(P("z","x","y"), P("z","x","y"), P("z","x","y",None)),
               out_specs=(P("z","x","y"), P("z","x","y",None)))

@jax.jit
def run(key):
    A = 5.0 + jax.random.uniform(key, (n, n), jnp.float32)
    F, piv = fn(A[None], jnp.zeros((1, n, n), jnp.float32),
                jnp.zeros((1, 1, 1, n), jnp.int32))
    return jnp.sum(F), piv[0, 0, 0, 0]

key = jax.random.key(42)
s, _ = run(key); float(s)
ts = []
for _ in range(3):
    t0 = time.perf_counter(); s, _ = run(key); float(s)
    ts.append(time.perf_counter() - t0)
med = sorted(ts)[len(ts)//2]
print(f"ARM fmode={fmode} rowpart={rowpart}: med {med*1e3:8.1f} ms "
      f"{2*n**3/3/med/1e12:6.1f} TF/s [{min(ts)*1e3:.1f},{max(ts)*1e3:.1f}]",
      flush=True)
"""


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
    arm("row", 2)
    arm("skip", 2)
    arm("col", 2)
    arm("col", 1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
