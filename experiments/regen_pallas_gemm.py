"""Regenerate results/pallas_gemm.csv under the K-AMORTIZED protocol
(VERDICT r3 Weak #4): the round-2 rows timed one dispatch + scalar fetch
per shape, so at the trailing shapes (26-29 ms) the ~24 ms tunnel latency
WAS the measurement and the per-shape verdicts were wrong (the README and
ops/pallas_gemm.py disavowed them; the real numbers lived in /tmp).

Protocol: a chain of REPS data-dependent kernel executions inside ONE jit
(the prof_k_sweep arrangement); per-execution time = total/REPS, so the
fixed dispatch+fence cost is amortized to noise. Covers the two kernel
families at the shapes the factorizations actually run:

  * trailing update  R[:, :] -= M @ U  at [16384, K] x [K, 16384]
    (schur_update_pallas vs XLA dot + aliased add), K = 512 / 1024 — the
    flat/right-looking hot shape;
  * big-K panel update  P - L @ U  at [16384, K] x [K, 1536]
    (sub_matmul_pallas_bigk vs XLA dot), K = 4096 / 8192 — the crout hot
    shape.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
    experiments/regen_pallas_gemm.py > /tmp/regen_pallas_gemm.log 2>&1 &
"""

import csv
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from conflux_tpu.ops.pallas_gemm import (
    schur_update_pallas,
    sub_matmul_pallas_bigk,
)
from conflux_tpu.ops.tri import schur_dot

REPS = 8
CSV = "/root/repo/results/pallas_gemm.csv"
rows = []


def bench(label, m, k, n, fn, flops):
    @jax.jit
    def run(key):
        A = jax.random.normal(key, (m, k), jnp.float32)
        B = jax.random.normal(jax.random.fold_in(key, 1), (k, n),
                              jnp.float32)
        C = jax.random.normal(jax.random.fold_in(key, 2), (m, n),
                              jnp.float32)
        s = jnp.float32(0)
        for _ in range(REPS):
            Ai = A * (1.0 + 1e-30 * s)
            C = fn(C, Ai, B)
            s = s + C[0, 0]
        return s

    key = jax.random.key(0)
    try:
        float(run(key))
    except Exception as e:
        print(f"{label} [{m},{k}]x[{k},{n}]: FAIL {type(e).__name__} "
              f"{str(e)[:120]}", flush=True)
        return
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(key))
        ts.append(time.perf_counter() - t0)
    per = min(ts) / REPS
    tf = flops / per / 1e12
    rows.append((m, k, n, label, round(per * 1e3, 2), round(tf, 1)))
    print(f"[{m:6d},{k:5d}]x[{k:5d},{n:6d}] {label:16s}: {per*1e3:8.2f} ms "
          f"{tf:6.1f} TF/s", flush=True)


def main():
    m = n = 16384
    for k in (512, 1024):
        fl = 2 * m * k * n
        for mode in ("high", "bf16"):
            bench(f"pallas_{mode}", m, k, n,
                  lambda C, A, B, mode=mode: schur_update_pallas(
                      C, A, B, 0, mode), fl)
            bench(f"xla_{mode}", m, k, n,
                  lambda C, A, B, mode=mode: C - schur_dot(A, B, mode), fl)
    # crout big-K panel shapes ([m, k] x [k, w], w = headline panel width)
    w = 1536
    for k in (4096, 8192):
        fl = 2 * m * k * w
        for mode in ("high", "bf16"):
            bench(f"bigk_pallas_{mode}", m, k, w,
                  lambda C, A, B, mode=mode: sub_matmul_pallas_bigk(
                      C, A, B, mode), fl)
            bench(f"bigk_xla_{mode}", m, k, w,
                  lambda C, A, B, mode=mode: C - schur_dot(A, B, mode), fl)

    with open(CSV, "w", newline="") as f:
        wtr = csv.writer(f)
        wtr.writerow(["M", "K", "N", "impl", "ms", "tflops"])
        wtr.writerows(rows)
    print(f"{len(rows)} rows -> {CSV}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
