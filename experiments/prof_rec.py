"""Re-bench the recursive LU and flat Cholesky after the transposed panel
pipeline + LDLT potrf landed.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_rec.py > /tmp/prof_rec.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from conflux_tpu.cholesky.single import cholesky
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
    n = 16384
    A = jnp.asarray(5.0 + rng.random((n, n), dtype=np.float32))
    fl = 2 / 3 * n**3
    for v in (512, 1024):
        f = jax.jit(lambda A, v=v: (lambda F, p: (jnp.sum(F), p[0]))(
            *lu_factor(A, v=v, precision="high", scheme="recursive")))
        bench(f"rec N={n} v={v} high (new panel)", f, A, flops=fl)
    F, p = jax.jit(lambda A: lu_factor(A, v=512, precision="high",
                                       scheme="recursive"))(A)
    r = float(jax.jit(lu_residual)(A, F, p))
    print(f"    rec residual N={n}: {r:.2e}", flush=True)
    S = (A + A.T) / 2 + 2 * n * jnp.eye(n, dtype=jnp.float32)
    del A, F
    for v in (512, 1024):
        f = jax.jit(lambda A, v=v: jnp.sum(
            cholesky(A, v=v, precision="high", scheme="flat")))
        bench(f"chol-flat N={n} v={v} (LDLT potrf)", f, S,
              flops=n**3 / 3)
    print("done", flush=True)


if __name__ == "__main__":
    main()
