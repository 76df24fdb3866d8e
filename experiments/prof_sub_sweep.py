"""Sweep the panel-kernel micro-panel width _SUB (CONFLUX_PANEL_SUB) on
the real chip, end-to-end through the flat LU. One subprocess per value —
_SUB is read at import, and jit caches key on traced programs, not module
globals. Includes 0 = the single-level kernel is gone; the smallest
meaningful _SUB is 8 (one sublane tile) and 128 degenerates to "defer
nothing" with one no-op boundary.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_sub_sweep.py > /tmp/sub_sweep.log 2>&1 &
"""

import os
import subprocess
import sys

CHILD = r"""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from conflux_tpu.lu.single import lu_factor
from conflux_tpu.ops.pallas_panel import _SUB

for n in (8192, 16384):
    @jax.jit
    def run(key, n=n):
        A = 5.0 + jax.random.uniform(key, (n, n), jnp.float32)
        F, p = lu_factor(A, v=1024, precision="high", scheme="flat")
        return jnp.sum(F), p[0]
    key = jax.random.key(0)
    float(run(key)[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(run(key)[0])
        ts.append((time.perf_counter() - t0) * 1e3)
    ms = min(ts)
    print(f"SUB={_SUB:3d} N={n:6d}: {ms:8.1f} ms  "
          f"{2/3*n**3/ms/1e6:8.1f} GF/s", flush=True)
"""

if __name__ == "__main__":
    for sub in (8, 16, 32, 64):
        env = dict(os.environ, CONFLUX_PANEL_SUB=str(sub),
                   PYTHONPATH="/root/repo:/root/.axon_site")
        r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                           capture_output=True, text=True)
        out = [l for l in (r.stdout + r.stderr).splitlines()
               if l.startswith("SUB=") or "Error" in l]
        print("\n".join(out) or f"SUB={sub}: no output (rc={r.returncode})",
              flush=True)
    print("done", flush=True)
