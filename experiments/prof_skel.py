"""Attribute per-step cost of the flat LU at N=8192, v=512 by building it up
in stages: (a) trailing GEMM skeleton only, (b) +TRSM, (c) +panel
factorization, (d) +row swaps (= the full flat scheme).

Run: PYTHONPATH=/root/repo:$PYTHONPATH nohup python experiments/prof_skel.py > /tmp/prof_skel.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from conflux_tpu.lu.single import _getrf_flat
from conflux_tpu.ops.panel import factor_panel
from conflux_tpu.ops.tri import schur_dot, trsm_left_lower_unit, unit_lower

N, V = 8192, 512
FLOPS = 2 / 3 * N**3


def bench(name, fn, A, reps=3):
    t0 = time.perf_counter()
    out = fn(A)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(A)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"{name:44s} {t*1e3:9.2f} ms  {FLOPS/t/1e12:6.2f} TF/s  (compile {compile_s:.1f}s)",
          flush=True)
    return t


def skel_gemm(A):
    F = A
    for k in range(0, N, V):
        w = min(V, N - k)
        if k + w < N:
            F = F.at[k + w :, k + w :].add(
                -schur_dot(F[k + w :, k : k + w], F[k : k + w, k + w :], "high")
            )
    return jnp.sum(F)


def skel_trsm(A):
    F = A
    for k in range(0, N, V):
        w = min(V, N - k)
        L11 = unit_lower(F[k : k + w, k : k + w])
        if k + w < N:
            U12 = trsm_left_lower_unit(L11, F[k : k + w, k + w :], method="invert")
            F = F.at[k : k + w, k + w :].set(U12)
            F = F.at[k + w :, k + w :].add(
                -schur_dot(F[k + w :, k : k + w], U12, "high")
            )
    return jnp.sum(F)


def skel_panel(A):
    F = A
    for k in range(0, N, V):
        w = min(V, N - k)
        piv, _, M = factor_panel(F[k:, k : k + w], jnp.ones(N - k, bool), w)
        F = F.at[k:, k : k + w].set(M)  # no reordering
        L11 = unit_lower(M[:w, :w])
        if k + w < N:
            U12 = trsm_left_lower_unit(L11, F[k : k + w, k + w :], method="invert")
            F = F.at[k : k + w, k + w :].set(U12)
            F = F.at[k + w :, k + w :].add(
                -schur_dot(F[k + w :, k : k + w], U12, "high")
            )
    return jnp.sum(F)


def full_flat(A):
    F, p = _getrf_flat(A, V, "high")
    return jnp.sum(F), p[0]


def main():
    rng = np.random.default_rng(42)
    A = jnp.asarray(5.0 + rng.random((N, N), dtype=np.float32))
    bench("a) gemm skeleton", jax.jit(skel_gemm), A)
    bench("b) + trsm", jax.jit(skel_trsm), A)
    bench("c) + panel factor", jax.jit(skel_panel), A)
    bench("d) full flat (swaps)", jax.jit(full_flat), A)
    # pure GEMM sequence at the flat scheme's shapes for reference
    def gemms_only(A):
        s = jnp.zeros((), jnp.float32)
        for k in range(0, N, V):
            w = min(V, N - k)
            if k + w < N:
                s = s + jnp.sum(schur_dot(A[k + w :, k : k + w], A[k : k + w, k + w :], "high")[0])
        return s
    bench("e) gemms only (no update)", jax.jit(gemms_only), A)
    print("done", flush=True)


if __name__ == "__main__":
    main()
