"""Time the no-row-movement flat LU on the real chip at N=8192/16384/32768,
v sweep at 16384, plus residual spot checks.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_flat_inplace.py > /tmp/prof_flat_inplace.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from conflux_tpu.lu.single import lu_factor


def run(n, v, precision, reps=3):
    rng = np.random.default_rng(42)
    A = jnp.asarray(5.0 + rng.random((n, n), dtype=np.float32))
    f = jax.jit(lambda a: (lambda F, p: (jnp.sum(F), p[0]))(
        *lu_factor(a, v=v, precision=precision, scheme="flat")))
    out = f(A)
    float(out[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(A)
        float(out[0])
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1e3
    gf = 2 / 3 * n**3 / ms / 1e6
    print(f"flat-inplace N={n:6d} v={v:5d} {precision:7s}: "
          f"{ms:9.1f} ms  {gf:9.1f} GF/s", flush=True)
    del A, out


def main():
    run(8192, 512, "high")
    run(16384, 512, "high")
    run(16384, 1024, "high")
    run(16384, 256, "high")
    run(32768, 512, "high", reps=2)
    run(32768, 1024, "high", reps=2)
    # residual check at 16384 f32
    rng = np.random.default_rng(7)
    n = 8192
    An = np.asarray(5.0 + rng.random((n, n)), dtype=np.float32)
    F, piv = lu_factor(jnp.asarray(An), v=512, precision="highest",
                       scheme="flat")
    Fh = np.asarray(F)
    pv = np.asarray(piv)
    L = np.tril(Fh, -1) + np.eye(n, dtype=np.float32)
    U = np.triu(Fh)
    r = np.linalg.norm(An[pv] - L @ U) / np.linalg.norm(An)
    print(f"residual N={n} f32: {r:.2e}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
