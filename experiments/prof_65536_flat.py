"""N=65536 single-chip bf16-STORAGE validation, FLAT scheme only: the
in-place right-looking stepped driver keeps R full-size so every step's
donated buffer aliases (one-matrix footprint, 8.6 GB bf16). The crout
flavor currently cannot fit N=65536: its shrinking R defeats donation
(in+out copies at step 0 = 17.2 GB > 15.75 HBM, /tmp/prof_65536.log
2026-08-19) — the tiled-raw-panel redesign tracks that.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_65536_flat.py > /tmp/prof_65536_flat.log 2>&1 &
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


def main():
    import ml_dtypes

    rng = np.random.default_rng(42)
    print("[flat] generating host matrix...", flush=True)
    A = np.empty((N, N), np.float32)
    for r in range(0, N, 4096):
        A[r : r + 4096] = 5.0 + rng.random((4096, N), dtype=np.float32)
    # HOST bf16 copy: the chunked stepped driver uploads a numpy input
    # column-chunk by column-chunk, so the matrix never exists twice on
    # device (a device-array input would be split from a live monolith —
    # transient 17.2 GB > HBM)
    Ab = A.astype(ml_dtypes.bfloat16)
    print("[flat] host bf16 copy done", flush=True)
    t0 = time.perf_counter()
    F, perm = lu_factor_stepped(Ab, v=V, precision="high", scheme="flat",
                                out="host")
    dt = time.perf_counter() - t0
    tf = 2 * N**3 / 3 / dt / 1e12
    print(f"[flat] factor+stream-out: {dt:8.1f} s ({tf:.1f} TF/s "
          f"incl upload + host streaming + per-step dispatch)", flush=True)
    t0 = time.perf_counter()
    res = lu_residual_blocked(A, F, perm)
    print(f"[flat] FULL residual ||PA-LU||/(N||A||) = {res:.3e} "
          f"({time.perf_counter() - t0:.0f} s)", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
