"""Benchmark the stash-based flat LU (trailing-window-as-value) vs the
recursive scheme, plus the flat left-looking Cholesky, on the real chip.
Also pushes N=32768 with a donated input.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_flat3.py > /tmp/prof_flat3.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from conflux_tpu.lu.single import lu_factor, lu_residual


def bench(name, fn, *args, reps=3, flops=None):
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    extra = f"  {flops/t/1e12:6.2f} TF/s" if flops else ""
    print(f"{name:46s} {t*1e3:9.2f} ms{extra}  (compile {compile_s:.1f}s)",
          flush=True)
    return t


def main():
    rng = np.random.default_rng(42)
    for n in (8192, 16384):
        A = jnp.asarray(5.0 + rng.random((n, n), dtype=np.float32))
        fl = 2 / 3 * n**3
        for v in (512, 1024, 256):
            f = jax.jit(lambda A, v=v: (lambda F, p: (jnp.sum(F), p[0]))(
                *lu_factor(A, v=v, precision="high", scheme="flat")))
            bench(f"flat3 N={n} v={v} high", f, A, flops=fl)
        if n == 8192:
            F, p = jax.jit(lambda A: lu_factor(A, v=512, precision="high", scheme="flat"))(A)
            r = float(jax.jit(lu_residual)(A, F, p))
            print(f"    residual N={n}: {r:.2e}", flush=True)
        del A

    n = 32768
    A = jnp.asarray(5.0 + rng.random((n, n), dtype=np.float32))
    f = jax.jit(
        lambda A: (lambda F, p: (jnp.sum(F), p[0]))(
            *lu_factor(A, v=1024, precision="high", scheme="flat")
        ),
        donate_argnums=0,
    )
    try:
        t0 = time.perf_counter()
        out = f(A)
        float(out[0])
        print(f"N=32768 flat3 v=1024 compile+run {time.perf_counter()-t0:.1f}s",
              flush=True)
        A2 = jnp.asarray(5.0 + rng.random((n, n), dtype=np.float32))
        t0 = time.perf_counter()
        out = f(A2)
        float(out[0])
        t = time.perf_counter() - t0
        print(f"N=32768 flat3 v=1024: {t*1e3:.1f} ms  "
              f"{2/3*n**3/t/1e12:.2f} TF/s", flush=True)
    except Exception as e:
        print(f"N=32768 failed: {type(e).__name__}: {e}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
