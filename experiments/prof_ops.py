"""Primitive-op cost model on the real chip at [8192, 8192] f32: row
gathers, scatters, sorts, DUS band writes, concats, GEMMs. Everything is
chained 8x inside one jit so the ~24 ms dispatch is amortized and nothing
can be dead-code-eliminated.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_ops.py > /tmp/prof_ops.log 2>&1 &
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
    print(f"{name:46s} {t*1e3:9.2f} ms total  {(t*1e3-24)/REPS:7.2f} ms/op  "
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
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    sub = jnp.asarray(np.sort(rng.choice(N, N - 512, replace=False)).astype(np.int32))
    band = jnp.asarray(rng.random((512, N), dtype=np.float32))
    keys = jnp.asarray(rng.permutation(N).astype(np.int32))

    bench("full row gather A[perm]", chain(
        lambda X, p, i: X[(p + i) % N]), A, perm)
    bench("subset row gather A[sub] (N-512 rows)", chain(
        lambda X, s, i: jnp.pad(X[(s + i) % N], ((0, 512), (0, 0))) ), A, sub)
    bench("row scatter .at[perm].set(A)", chain(
        lambda X, p, i: jnp.zeros_like(X).at[(p + i) % N].set(X)), A, perm)
    bench("DUS row band [512, N]", chain(
        lambda X, b, i: jax.lax.dynamic_update_slice(X, b + i, (i * 8, 0))), A, band)
    bench("DUS col band [N, 512]", chain(
        lambda X, b, i: jax.lax.dynamic_update_slice(X, b.T + i, (0, i * 8))), A, band)
    bench("concat halves -> [N, N]", chain(
        lambda X, b, i: jnp.concatenate([X[:, : N // 2] + i, X[:, N // 2 :]], axis=1)), A, band)
    bench("sort [N] i32 keys", chain(
        lambda X, k, i: X.at[0, 0].add(jnp.sort((k + i) % N)[0].astype(jnp.float32))), A, keys)
    bench("argsort [N] i32 keys", chain(
        lambda X, k, i: X.at[0, 0].add(jnp.argsort((k + i) % N)[0].astype(jnp.float32))), A, keys)
    B = jnp.asarray(rng.random((N, 512), dtype=np.float32))
    C = jnp.asarray(rng.random((512, N), dtype=np.float32))
    bench("gemm [N,512]x[512,N] high (DUS add)", chain(
        lambda X, _, i: X.at[:, :].add(-jnp.dot(
            B + i, C, precision=jax.lax.Precision.HIGH))), A, None)
    bench("gemm + fused row gather of A (X[p] @ ...)", chain(
        lambda X, p, i: X[(p + i) % N].at[:, :].add(-jnp.dot(
            B + i, C, precision=jax.lax.Precision.HIGH))), A, perm)
    print("done", flush=True)


if __name__ == "__main__":
    main()
