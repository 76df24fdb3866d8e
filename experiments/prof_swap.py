"""Measure LAPACK-style 2w-row SWAP primitives on the chip: a w-row 2-D
scatter into a big [m, n] buffer (S.at[idx].set(rows)) vs the full-buffer
permutation-gather alternative, at the sizes the flat LU would use them.
If the small scatter is fast, physical row swaps beat masked-GEMM overhead.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_swap.py > /tmp/prof_swap.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

REPS = 8


def bench(name, fn, *args, reps=3):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"{name:56s} {t*1e3:9.2f} ms total  {(t*1e3-24)/REPS:7.3f} ms/op",
          flush=True)


def chain(op):
    def f(S, idx, rows):
        for _ in range(REPS):
            S = op(S, idx, rows)
        return S
    return jax.jit(f)


def main():
    rng = np.random.default_rng(0)
    for m, w in ((16384, 1024), (32768, 1024)):
        S = jnp.asarray(rng.random((m, m), dtype=np.float32))
        idx = jnp.asarray(
            np.sort(rng.choice(m, size=w, replace=False)).astype(np.int32))
        rows = jnp.asarray(rng.random((w, m), dtype=np.float32))

        bench(f"scatter set S.at[idx].set(rows) m={m} w={w}",
              chain(lambda S, idx, rows: S.at[idx].set(rows) * 1.0000001),
              S, idx, rows)
        bench(f"row gather S[idx] m={m} w={w}",
              chain(lambda S, idx, rows: S.at[:w].set(S[idx] + rows * 0)),
              S, idx, rows)
        # swap gather: identity permutation except 2w entries
        perm = np.arange(m, dtype=np.int32)
        lo = np.sort(rng.choice(m // 2, size=w, replace=False))
        hi = m // 2 + lo
        perm[lo], perm[hi] = perm[hi], perm[lo]
        permj = jnp.asarray(perm)
        bench(f"full swap-gather S[perm] m={m}",
              chain(lambda S, idx, rows, p=permj: S[p] * 1.0000001),
              S, idx, rows)
        del S, rows
    print("done", flush=True)


if __name__ == "__main__":
    main()
