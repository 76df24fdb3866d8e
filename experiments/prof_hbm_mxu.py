"""Machine-characteristic probes for this axon v5e chip: effective HBM
streaming bandwidth and MXU GEMM throughput at a compute-bound shape.
The trailing-update ceiling (prof_gemm_ceiling.py) implied only
~160-190 GB/s of effective HBM traffic — 4-5x below the v5e spec sheet —
so every data-movement cost model needs these measured numbers, not specs.

All loops K-amortized inside one jit (chained through the data), scalar
readback. Run:
PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_hbm_mxu.py > /tmp/hbm_mxu.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

REPS = 16


def timeit(run, *args):
    float(run(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / REPS


def bw_triad(n_mb):
    """C = a*A + B streamed REPS times: traffic 3 passes/rep."""
    n = n_mb * 1024 * 1024 // 4

    @jax.jit
    def run(key):
        A = jax.random.normal(key, (n,), jnp.float32)
        B = jax.random.normal(key, (n,), jnp.float32)
        for i in range(REPS):
            B = A * (1.0 + 1e-30 * B[0]) + B
        return B[0] + B[n - 1]

    per = timeit(run, jax.random.key(0))
    gb = 3 * n * 4 / 1e9
    print(f"triad {n_mb:5d} MB: {per*1e3:8.2f} ms/pass  "
          f"{gb/per:7.1f} GB/s", flush=True)


def bw_copy2d(rows, cols):
    """row-gather copy (the compaction primitive): B = A[idx]."""
    @jax.jit
    def run(key):
        A = jax.random.normal(key, (rows, cols), jnp.float32)
        idx = jnp.arange(rows - 1, -1, -1, dtype=jnp.int32)
        s = jnp.float32(0)
        for i in range(REPS):
            A = A[idx] * (1.0 + 1e-30 * s)
            s = s + A[0, 0]
        return s

    per = timeit(run, jax.random.key(0))
    gb = 2 * rows * cols * 4 / 1e9
    print(f"gather [{rows},{cols}]: {per*1e3:8.2f} ms/pass  "
          f"{gb/per:7.1f} GB/s", flush=True)


def mxu(n, mode):
    """compute-bound square GEMM chain: C_{i+1} = normalize(C_i) @ B."""
    from conflux_tpu.ops.tri import schur_dot

    @jax.jit
    def run(key):
        B = jax.random.normal(key, (n, n), jnp.float32) / n
        C = jax.random.normal(key, (n, n), jnp.float32)
        for _ in range(REPS):
            C = schur_dot(C, B, mode)
        return C[0, 0] + C[n - 1, n - 1]

    per = timeit(run, jax.random.key(1))
    tf = 2 * n**3 / per / 1e12
    print(f"gemm [{n},{n}]x[{n},{n}] {mode:8s}: {per*1e3:8.2f} ms  "
          f"{tf:6.1f} TF/s", flush=True)


def dot_vs_fused(m, k, n):
    """same trailing shape, three arrangements: fresh-output dot, C-dot
    expression, .at[].add — isolates whether the add epilogue fuses."""
    from conflux_tpu.ops.tri import schur_dot

    def mk(arr_mode):
        @jax.jit
        def run(key):
            A = jax.random.normal(key, (m, k), jnp.float32)
            B = jax.random.normal(key, (k, n), jnp.float32)
            C = jnp.zeros((m, n), jnp.float32)
            s = jnp.float32(0)
            for _ in range(REPS):
                Ai = A * (1.0 + 1e-30 * s)
                if arr_mode == "fresh":
                    C = schur_dot(Ai, B, "bf16")
                elif arr_mode == "expr":
                    C = C - schur_dot(Ai, B, "bf16")
                else:
                    C = C.at[:, :].add(-schur_dot(Ai, B, "bf16"))
                s = s + C[0, 0]
            return s

        return run

    for arr_mode in ("fresh", "expr", "add"):
        per = timeit(mk(arr_mode), jax.random.key(2))
        tf = 2 * m * k * n / per / 1e12
        print(f"dot [{m},{k}]x[{k},{n}] {arr_mode:6s}: {per*1e3:8.2f} ms  "
              f"{tf:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    for mb in (256, 1024, 4096):
        bw_triad(mb)
    bw_copy2d(16384, 16384)
    bw_copy2d(32768, 8192)
    for mode in ("bf16", "high", "highest"):
        mxu(8192, mode)
    mxu(4096, "bf16")
    dot_vs_fused(32768, 1024, 31744)
    print("done", flush=True)
