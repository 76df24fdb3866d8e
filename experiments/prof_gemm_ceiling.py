"""K-amortized trailing-GEMM ceiling (VERDICT r2 weak #3: the per-shape
Pallas-vs-XLA and variant tables were latency-contaminated — ~24 ms
dispatch floor per jit call swamps sub-50 ms kernels).

Protocol: REPS back-to-back GEMMs of the exact trailing-update shape
INSIDE one jit, each rep's B operand perturbed by a scalar that depends on
the running accumulator (forces re-execution, defeats CSE/hoisting; the
[k, n] elementwise pass it adds is <1% of the GEMM), accumulated into C
with the same aliased .at[].add epilogue the flat LU uses. One scalar
readback; per-rep time = total / REPS. This is the XLA ceiling the flat
kernel's step-6 GEMM (conflux_opt.hpp:1626-1634 analog) can be judged
against.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_gemm_ceiling.py > /tmp/gemm_ceiling.log 2>&1 &
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
        for _ in range(REPS):
            Bi = B * (1.0 + 1e-30 * C[0, 0])
            C = C.at[:, :].add(-schur_dot(A, Bi, mode))
        return C[0, 0] + C[m - 1, n - 1]

    key = jax.random.key(0)
    float(run(key))  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(key))
        ts.append(time.perf_counter() - t0)
    per = min(ts) / REPS
    tf = 2 * m * k * n / per / 1e12
    print(f"[{m:6d},{k:5d}]x[{k:5d},{n:6d}] {mode:8s}: "
          f"{per*1e3:8.2f} ms/GEMM  {tf:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    # step-0 and mid-run shapes of the N=32768 v=1024 flat LU
    for m, k, n in ((32768, 1024, 31744), (16384, 1024, 15360),
                    (8192, 1024, 7168)):
        for mode in ("high", "bf16", "highest"):
            bench(m, k, n, mode)
    print("done", flush=True)
