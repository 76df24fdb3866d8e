"""How does the trailing-update GEMM's achieved TF/s scale with K (= the
panel width v)? prof_hbm_mxu.py measured the K=1024 accumulate shape at
24.8 TF/s bf16 vs 137.8 TF/s for a compute-bound square GEMM — if larger K
closes that gap, raising v (with the now-cheap two-level panel kernel) is
the cheapest MFU lever for the flat LU.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_k_sweep.py > /tmp/k_sweep.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from conflux_tpu.ops.tri import schur_dot

REPS = 8


def bench(m, k, n, mode):
    @jax.jit
    def run(key):
        A = jax.random.normal(key, (m, k), jnp.float32)
        B = jax.random.normal(key, (k, n), jnp.float32)
        C = jnp.zeros((m, n), jnp.float32)
        s = jnp.float32(0)
        for _ in range(REPS):
            Ai = A * (1.0 + 1e-30 * s)
            C = C - schur_dot(Ai, B, mode)
            s = s + C[0, 0]
        return s

    key = jax.random.key(0)
    float(run(key))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(key))
        ts.append(time.perf_counter() - t0)
    per = min(ts) / REPS
    tf = 2 * m * k * n / per / 1e12
    print(f"[{m:6d},{k:5d}]x[{k:5d},{n:6d}] {mode:6s}: {per*1e3:8.2f} ms  "
          f"{tf:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    m = n = 16384  # mid-run trailing size, fits with REPS buffers
    for k in (512, 1024, 2048, 4096, 8192):
        for mode in ("bf16", "high"):
            bench(m, k, n, mode)
    print("done", flush=True)
