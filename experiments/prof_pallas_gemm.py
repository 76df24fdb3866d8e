"""Pallas trailing-GEMM vs XLA dot_general at the factorization's shapes.
Writes results/pallas_gemm.csv (SURVEY stage 4 deliverable: measured, kept
whichever wins).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_pallas_gemm.py > /tmp/prof_pallas_gemm.log 2>&1 &
"""

import csv
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from conflux_tpu.ops.pallas_gemm import matmul_pallas


def timeit(fn, *args, reps=3):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    rng = np.random.default_rng(0)
    rows = []
    shapes = [
        (16384, 512, 16384),   # trailing update at N=16384, v=512
        (8192, 1024, 8192),    # trailing update at N=8192, v=1024
        (8192, 8192, 8192),    # square reference point
    ]
    for m, k, n in shapes:
        A32 = jnp.asarray(rng.random((m, k), dtype=np.float32))
        B32 = jnp.asarray(rng.random((k, n), dtype=np.float32))
        fl = 2 * m * n * k
        for name, fn in (
            ("xla_high", jax.jit(lambda a, b: jnp.sum(jnp.dot(
                a, b, precision=jax.lax.Precision.HIGH)))),
            ("xla_bf16", jax.jit(lambda a, b: jnp.sum(jnp.dot(
                a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)))),
            ("pallas_f32", jax.jit(lambda a, b: jnp.sum(matmul_pallas(a, b)))),
            ("pallas_bf16", jax.jit(lambda a, b: jnp.sum(matmul_pallas(
                a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))))),
        ):
            try:
                ms = timeit(fn, A32, B32)
                tf = fl / ms / 1e9
                rows.append((m, k, n, name, round(ms, 2), round(tf, 1)))
                print(f"[{m}x{k}x{n}] {name:12s}: {ms:8.2f} ms  {tf:8.1f} GF/s",
                      flush=True)
            except Exception as e:
                print(f"[{m}x{k}x{n}] {name}: FAILED {type(e).__name__}: {e}",
                      flush=True)
                rows.append((m, k, n, name, -1, -1))
    with open("/root/repo/results/pallas_gemm.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["M", "K", "N", "impl", "ms", "tflops"])
        w.writerows(rows)
    print("done", flush=True)


if __name__ == "__main__":
    main()
