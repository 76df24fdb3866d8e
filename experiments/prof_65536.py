"""N=65536 single-chip bf16-STORAGE validation: flat-stepped vs
crout-stepped drivers, wall time + FULL blocked residual
(validation.lu_residual_blocked — streams A through the device, never an
N x N f64 host temp). The reference's second-largest demonstrated config
(README.md:96-106: N=65536 on 64 ranks, 16.25 s).

Expectation: crout-stepped holds a better residual (one rounding per
stored entry vs per-step re-rounding of the whole bf16 trailing matrix).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_65536.py > /tmp/prof_65536.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from conflux_tpu.lu.stepped import lu_factor_stepped
from conflux_tpu.validation import lu_residual_blocked

N, V = 65536, 1024


def run(scheme):
    import ml_dtypes

    rng = np.random.default_rng(42)
    print(f"[{scheme}] generating host matrix...", flush=True)
    A = np.empty((N, N), np.float32)
    Ab = np.empty((N, N), ml_dtypes.bfloat16)
    for r in range(0, N, 4096):
        A[r : r + 4096] = 5.0 + rng.random((4096, N), dtype=np.float32)
        # convert on HOST: a device-side f32->bf16 asarray materializes
        # the 17.2 GB f32 first and OOMs (CLAUDE.md); the stepped driver
        # row-chunk-uploads host arrays into a donated buffer itself
        Ab[r : r + 4096] = A[r : r + 4096].astype(ml_dtypes.bfloat16)
    t0 = time.perf_counter()
    F, perm = lu_factor_stepped(Ab, v=V, precision="high", scheme=scheme,
                                out="host")
    dt = time.perf_counter() - t0
    tf = 2 * N**3 / 3 / dt / 1e12
    print(f"[{scheme}] factor+stream-out: {dt:8.1f} s ({tf:.1f} TF/s "
          f"incl host streaming + per-step dispatch)", flush=True)
    t0 = time.perf_counter()
    res = lu_residual_blocked(A, F, perm)
    print(f"[{scheme}] FULL residual ||PA-LU||/(N||A||) = {res:.3e} "
          f"({time.perf_counter() - t0:.0f} s)", flush=True)


def main():
    # crout-stepped is shape-gated at this size: the shrinking compaction
    # defeats donation, so it transiently needs 2 matrix copies (17.2 GB >
    # HBM) and raises INVALID_SHAPE (verified /tmp/prof_65536.log
    # 2026-08-20); flat is the in-place one-copy driver for N=65536.
    run("flat")
    print("done", flush=True)


if __name__ == "__main__":
    main()
