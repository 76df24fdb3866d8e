"""Attribute single-chip LU time at N=16384 to components (VERDICT item 1).

Times, on the real TPU chip:
  * the full lu_factor at N=16384 (v sweep: 256/512/1024, precision high)
  * speed-of-light GEMMs at the recursion's top sizes (high + bf16)
  * select_pivots panel cost at the panel sizes the recursion sees
  * TRSM cost (solve vs blocked-substitution)
  * row-gather (A[perm]) and concatenate assembly costs

Run: nohup python experiments/prof_components.py > /tmp/prof_components.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from conflux_tpu.lu.single import lu_factor
from conflux_tpu.ops.panel import select_pivots
from conflux_tpu.ops.tri import trsm_left_lower_unit, trsm_right_upper


def bench(name, fn, *args, reps=3):
    t_compile0 = time.perf_counter()
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    compile_s = time.perf_counter() - t_compile0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        times.append(time.perf_counter() - t0)
    t = min(times)
    print(f"{name:55s} {t*1e3:10.2f} ms   (compile {compile_s:.1f}s)", flush=True)
    return t


def main():
    rng = np.random.default_rng(42)
    N = 16384
    A = jnp.asarray(5.0 + rng.random((N, N), dtype=np.float32))

    print("== full lu_factor (N=16384) ==", flush=True)
    for v in (512, 1024, 256):
        f = jax.jit(lambda A, v=v: (lambda F, p: (jnp.sum(F), p[0]))(
            *lu_factor(A, v=v, precision="high")))
        t = bench(f"lu_factor N={N} v={v} high", f, A)
        print(f"    -> {(2/3*N**3)/t/1e12:.2f} TF/s", flush=True)

    print("== speed-of-light GEMM ==", flush=True)
    for n in (8192, 4096):
        B1 = jnp.asarray(rng.random((N, n), dtype=np.float32))
        B2 = jnp.asarray(rng.random((n, n), dtype=np.float32))
        for mode in ("high", "bf16"):
            if mode == "bf16":
                f = jax.jit(lambda a, b: jnp.sum(jnp.dot(
                    a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)))
            else:
                f = jax.jit(lambda a, b: jnp.sum(jnp.dot(
                    a, b, precision=jax.lax.Precision.HIGH)))
            t = bench(f"gemm [{N}x{n}]x[{n}x{n}] {mode}", f, B1, B2)
            print(f"    -> {2*N*n*n/t/1e12:.2f} TF/s", flush=True)

    print("== panel select_pivots (v=512) ==", flush=True)
    ttot = 0.0
    for m in (16384, 8192, 4096, 2048, 1024):
        P = jnp.asarray(rng.random((m, 512), dtype=np.float32))
        act = jnp.ones(m, bool)
        f = jax.jit(lambda P, act: select_pivots(P, act, 512)[2])
        t = bench(f"select_pivots [{m}, 512]", f, P, act)
        ttot += t
    # recursion sees ~32 panels with m from N down to v; crude estimate:
    print(f"    est panel total over 32 panels ~ {32*ttot/5*1e3:.0f} ms", flush=True)

    print("== TRSM (L [512,512], B [512, 16384]) ==", flush=True)
    L = jnp.asarray(np.tril(rng.random((512, 512), dtype=np.float32), -1) + np.eye(512, dtype=np.float32))
    B = jnp.asarray(rng.random((512, N), dtype=np.float32))
    for method in ("solve", "invert"):
        f = jax.jit(lambda L, B, m=method: trsm_left_lower_unit(L, B, method=m))
        bench(f"trsm_left_lower_unit 512x{N} {method}", f, L, B)
    U = jnp.asarray(np.triu(rng.random((512, 512), dtype=np.float32)) + 512*np.eye(512, dtype=np.float32))
    Bt = jnp.asarray(rng.random((N, 512), dtype=np.float32))
    for method in ("solve", "invert"):
        f = jax.jit(lambda B, U, m=method: trsm_right_upper(B, U, method=m))
        bench(f"trsm_right_upper {N}x512 {method}", f, Bt, U)

    print("== data movement ==", flush=True)
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    f = jax.jit(lambda A, p: jnp.sum(A[p]))
    bench(f"row gather A[perm] [{N},{N}]", f, A, perm)
    H1 = jnp.asarray(rng.random((N, 8192), dtype=np.float32))
    H2 = jnp.asarray(rng.random((N, 8192), dtype=np.float32))
    f = jax.jit(lambda a, b: jnp.sum(jnp.concatenate([a, b], axis=1)))
    bench(f"concat 2x[{N},8192]", f, H1, H2)

    print("done", flush=True)


if __name__ == "__main__":
    main()
