"""Fused Mosaic trailing-update (schur_update_pallas) vs XLA's
materialize-then-subtract, K-amortized, plus a numerics check vs
Precision.HIGH. Decides whether the flat LU's trailing_add switches to
the Pallas kernel (the 24.8-vs-137.8 TF/s gap of prof_hbm_mxu.py).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_schur_pallas.py > /tmp/schur_pallas.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from conflux_tpu.ops.pallas_gemm import schur_update_pallas
from conflux_tpu.ops.tri import schur_dot

REPS = 8


def numerics(n=2048, k=1024):
    rng = np.random.default_rng(0)
    R = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    A = jnp.asarray(rng.standard_normal((n, k)) / k, jnp.float32)
    B = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
    ref = jax.jit(lambda r, a, b: r.at[:, :].add(-schur_dot(a, b, "high")))(
        R, A, B)
    for mode in ("high", "bf16"):
        got = jax.jit(lambda r, a, b, mo=mode: schur_update_pallas(
            r, a, b, 0, mo, bm=512, bn=512))(R, A, B)
        d = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
        print(f"numerics {mode:5s}: max rel dev vs XLA-HIGH = {d:.2e}",
              flush=True)


def speed(m, k, n, mode, bm, bn):
    @jax.jit
    def run(key):
        A = jax.random.normal(key, (m, k), jnp.float32)
        B = jax.random.normal(key, (k, n), jnp.float32)
        R = jnp.zeros((m, n), jnp.float32)
        s = jnp.float32(0)
        for _ in range(REPS):
            Ai = A * (1.0 + 1e-30 * s)
            R = schur_update_pallas(R, Ai, B, 0, mode, bm=bm, bn=bn)
            s = s + R[0, 0]
        return s

    key = jax.random.key(0)
    try:
        float(run(key))
    except Exception as e:
        print(f"pallas [{m},{k}]x[{k},{n}] {mode} bm={bm} bn={bn}: "
              f"FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
        return
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(key))
        ts.append(time.perf_counter() - t0)
    per = min(ts) / REPS
    tf = 2 * m * k * n / per / 1e12
    print(f"pallas [{m:6d},{k:5d}]x[{k:5d},{n:6d}] {mode:5s} "
          f"bm={bm:5d} bn={bn:5d}: {per*1e3:8.2f} ms  {tf:6.1f} TF/s",
          flush=True)


if __name__ == "__main__":
    numerics()
    for bm, bn in ((512, 512), (512, 1024), (1024, 512), (1024, 1024)):
        speed(16384, 1024, 15360, "high", bm, bn)
    speed(16384, 1024, 15360, "bf16", 512, 1024)
    speed(32768, 1024, 31744, "high", 512, 1024)
    speed(32768, 1024, 31744, "bf16", 512, 1024)
    print("done", flush=True)
