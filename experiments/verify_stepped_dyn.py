"""On-chip smoke of the dynamic-k stepped drivers (lu/stepped.py,
cholesky/stepped.py): N=4096 exercises the real Mosaic trailing kernel
INSIDE lax.cond (new in the dynamic-k design — the compile helper has
killed other pallas-adjacent program shapes before, CLAUDE.md) and the
shared-executable property: all 8 steps must dispatch through ONE
compile per driver.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/verify_stepped_dyn.py > /tmp/verify_stepped_dyn.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from conflux_tpu.cholesky.stepped import cholesky_stepped
from conflux_tpu.lu.stepped import lu_factor_stepped
from conflux_tpu.validation import (cholesky_residual_blocked,
                                    lu_residual_blocked)

N, V = 4096, 512


def main():
    rng = np.random.default_rng(7)
    A = (5.0 + rng.random((N, N), dtype=np.float32)).astype(np.float32)

    t0 = time.perf_counter()
    F, perm = lu_factor_stepped(A, v=V, precision="high", out="host")
    t1 = time.perf_counter()
    res = lu_residual_blocked(A, F, perm)
    print(f"[lu] stepped-dyn N={N} v={V} high: {t1-t0:.1f} s total "
          f"(incl ONE compile), residual {res:.3e}", flush=True)
    assert res < 1e-6, res
    # warm pass: per-step cost with the executable cached
    t0 = time.perf_counter()
    F, perm = lu_factor_stepped(A, v=V, precision="high", out="host")
    print(f"[lu] warm rerun: {time.perf_counter()-t0:.2f} s", flush=True)

    S = (A @ A.T / N + N * np.eye(N, dtype=np.float32)).astype(np.float32)
    t0 = time.perf_counter()
    L = cholesky_stepped(S, v=V, precision="high", out="host")
    t1 = time.perf_counter()
    resc = cholesky_residual_blocked(S, L)
    print(f"[chol] stepped-dyn N={N} v={V} high: {t1-t0:.1f} s total, "
          f"residual {resc:.3e}", flush=True)
    assert resc < 1e-6, resc
    t0 = time.perf_counter()
    L = cholesky_stepped(S, v=V, precision="high", out="host")
    print(f"[chol] warm rerun: {time.perf_counter()-t0:.2f} s", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
