"""Determine what triggers the fast gather path vs the serial while-loop
expansion on this backend: provably-in-bounds (mod), clipped, raw
(sort-derived) indices; subset gathers of slices; 1-D scatters; searchsorted
and argsort costs.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_gather.py > /tmp/prof_gather.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

N = 8192
REPS = 8


def bench(name, fn, *args, reps=3):
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
    print(f"{name:52s} {t*1e3:9.2f} ms total  {(t*1e3-24)/REPS:7.3f} ms/op  "
          f"(compile {compile_s:.1f}s)", flush=True)
    return t


def chain(op):
    def f(A, aux):
        X = A
        for i in range(REPS):
            X = op(X, aux, i)
        return jnp.sum(X)
    return jax.jit(f)


def main():
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.random((N, N), dtype=np.float32))
    # indices that LOOK like the flat scheme's: data-derived, not provably
    # in bounds
    mask0 = np.ones(N, bool)
    mask0[rng.choice(N, 512, replace=False)] = False

    def rows_next_like(X, _, i):
        # mimic: sort(where(mask, iota, N))[: N-512]
        mask = X[:, 0] > -1e30  # data-dependent all-true
        mask = mask & jnp.asarray(mask0)
        r = jnp.sort(jnp.where(mask, jnp.arange(N), N))[: N - 512]
        return jnp.pad(X[r], ((0, 512), (0, 0))) + i

    bench("gather rows_next (sort-derived, raw)", chain(rows_next_like), A, None)

    def rows_next_clip(X, _, i):
        mask = X[:, 0] > -1e30
        mask = mask & jnp.asarray(mask0)
        r = jnp.sort(jnp.where(mask, jnp.arange(N), N))[: N - 512]
        r = jnp.clip(r, 0, N - 1)
        return jnp.pad(X[r], ((0, 512), (0, 0))) + i

    bench("gather rows_next (clipped)", chain(rows_next_clip), A, None)

    def rows_next_mod(X, _, i):
        mask = X[:, 0] > -1e30
        mask = mask & jnp.asarray(mask0)
        r = jnp.sort(jnp.where(mask, jnp.arange(N), N))[: N - 512] % N
        return jnp.pad(X[r], ((0, 512), (0, 0))) + i

    bench("gather rows_next (mod)", chain(rows_next_mod), A, None)

    def gather_slice(X, _, i):
        mask = X[:, 0] > -1e30
        mask = mask & jnp.asarray(mask0)
        r = jnp.clip(jnp.sort(jnp.where(mask, jnp.arange(N), N))[: N - 512], 0, N - 1)
        G = X[r, 512:]  # subset rows AND column slice, like the flat scheme
        return jnp.pad(G, ((0, 512), (0, 512))) + i

    bench("gather rows+colslice (clipped)", chain(gather_slice), A, None)

    idx = jnp.asarray(rng.permutation(N).astype(np.int32))
    bench("scatter 1-D int .at[idx].set", chain(
        lambda X, ix, i: X.at[:, 0].set(
            jnp.zeros(N, jnp.int32).at[(ix + i) % N].set(
                jnp.arange(N, dtype=jnp.int32)).astype(jnp.float32))), A, idx)
    bench("argsort as inverse perm", chain(
        lambda X, ix, i: X.at[:, 0].add(
            jnp.argsort((ix + i) % N).astype(jnp.float32))), A, idx)
    srt = jnp.sort(idx)
    bench("searchsorted [N] in sorted [N]", chain(
        lambda X, s, i: X.at[:, 0].add(
            jnp.searchsorted(s, (idx + i) % N).astype(jnp.float32))), A, srt)
    # small scatter like mask.at[piv].set(False)
    piv = jnp.asarray(rng.choice(N, 512, replace=False).astype(np.int32))
    bench("bool mask .at[piv(512)].set", chain(
        lambda X, p, i: X.at[:, 0].add(
            jnp.ones(N, bool).at[(p + i) % N].set(False).astype(jnp.float32))),
        A, piv)
    # 512-row gather (pivot rows)
    bench("gather 512 rows (clipped)", chain(
        lambda X, p, i: X.at[:512, :].add(X[jnp.clip((p + i) % N, 0, N - 1)])),
        A, piv)
    print("done", flush=True)


if __name__ == "__main__":
    main()
