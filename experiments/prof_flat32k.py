"""Isolate the N=32768 flat-LU pathology (117-936 s measured vs ~1.6 s
expected from 8x the N=16384 FLOPs): time each per-step component at
m_k=32768 scale in isolation, plus whole factorizations at v=512/1024.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_flat32k.py > /tmp/prof_flat32k.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from conflux_tpu.ops.panel import factor_panel
from conflux_tpu.ops.tri import schur_dot


def timeit(tag, fn, *args, reps=2):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    print(f"{tag:40s}: {min(ts)*1e3:9.1f} ms", flush=True)
    return min(ts) * 1e3


def main():
    rng = np.random.default_rng(0)
    m, n = 32768, 32768
    for v in (512, 1024):
        k = v  # a representative early step (worst-case sizes)
        Spanel = jnp.asarray(5.0 + rng.random((m, v), dtype=np.float32))
        timeit(
            f"panel factor [{m},{v}]",
            jax.jit(lambda P: factor_panel(P, jnp.ones(P.shape[0], bool),
                                           P.shape[1])[2]),
            Spanel,
        )
        del Spanel

        M = jnp.asarray(rng.random((m, v), dtype=np.float32))
        U12 = jnp.asarray(rng.random((v, n - k - v), dtype=np.float32))
        S = jnp.asarray(rng.random((m, n), dtype=np.float32))

        def upd(S, M, U12, k=k, v=v):
            S = jax.lax.dynamic_update_slice(S, M, (0, k))
            return S.at[:, k + v:].add(-schur_dot(M, U12, "high"))

        timeit(f"in-place trailing update v={v}", jax.jit(upd), S, M, U12)

        rows = jnp.asarray(
            np.sort(rng.choice(m, size=m - v, replace=False)).astype(np.int32))
        timeit(f"row gather [{m-v},{n}]",
               jax.jit(lambda S, r: S[r]), S, rows)

        def upd_gather(S, M, U12, rows, k=k, v=v):
            S = jax.lax.dynamic_update_slice(S, M, (0, k))
            S = S.at[:, k + v:].add(-schur_dot(M, U12, "high"))
            return S[rows]

        timeit(f"update+gather fused v={v}",
               jax.jit(upd_gather), S, M, U12, rows)
        del S, M, U12, rows

    print("done", flush=True)


if __name__ == "__main__":
    main()
