"""End-to-end validation + timing of the fused Mosaic trailing paths
(lu/single.py trailing_add: whole-R at N=16384, sliced-R at N=32768;
1x1x1-grid shard_map vma path on the real chip).

The full ||PA - LU||_F / (N ||A||_F) residual is computed ON DEVICE inside
one jit: every row of A comes from its own fold_in'd RNG stream, so PA's
rows are regenerated exactly (per pivot index) without the host ever
holding or re-uploading an N x N array. Peak HBM ~= F + U + row-block
temps (~9.5 GB at N=32768, under the ~13 GB degradation cliff).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_fused_e2e.py > /tmp/fused_e2e.log 2>&1 &
"""

import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from conflux_tpu.lu.single import lu_factor

_PREC = jax.lax.Precision.HIGHEST
CHUNK = 2048


def gen_rows(key, idx, n):
    """Rows `idx` of the test matrix (5 + U[0,1)): row r streams from
    fold_in(key, r), so any row subset is regenerable exactly."""
    return jax.vmap(
        lambda r: 5.0 + jax.random.uniform(jax.random.fold_in(key, r), (n,))
    )(idx)


def gen_A(key, m, n):
    return gen_rows(key, jnp.arange(m, dtype=jnp.int32), n)


def timing(n, v, precision, reps=3, scheme="auto"):
    @jax.jit
    def run(key):
        F, perm = lu_factor(gen_A(key, n, n), v=v, precision=precision,
                            scheme=scheme)
        return jnp.sum(F), perm[0]

    key = jax.random.key(42)
    s, _ = run(key); float(s)  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s, _ = run(key); float(s)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    tf = 2 * n**3 / 3 / med / 1e12
    print(f"time  N={n} v={v} {precision:7s}: med {med*1e3:8.1f} ms "
          f"{tf:6.1f} TF/s  spread [{min(ts)*1e3:.1f},{max(ts)*1e3:.1f}]",
          flush=True)
    return med


def residual(n, v, precision, scheme="auto"):
    """Factor + full blocked ||PA-LU|| residual in ONE jit, scalars out."""

    @jax.jit
    def run(key):
        F, perm = lu_factor(gen_A(key, n, n), v=v, precision=precision,
                            scheme=scheme)
        F = F.astype(jnp.float32)
        U = jnp.triu(F[:n])
        nr2 = jnp.float32(0)
        na2 = jnp.float32(0)
        for r in range(0, n, CHUNK):
            rows = min(CHUNK, n - r)
            pb = jax.lax.dynamic_slice(perm, (r,), (rows,))
            PA = gen_rows(key, pb, n)
            Fb = jax.lax.dynamic_slice(F, (r, 0), (rows, n))
            # L rows r..r+rows: strict-lower part of F rows + unit diagonal
            Lb = jnp.where(
                jnp.arange(n)[None, :] < r + jnp.arange(rows)[:, None],
                Fb, 0.0,
            )
            Lb = Lb.at[jnp.arange(rows), r + jnp.arange(rows)].set(1.0)
            Rb = PA - jnp.dot(Lb, U, precision=_PREC)
            nr2 += jnp.sum(Rb * Rb)
            na2 += jnp.sum(PA * PA)
        return jnp.sqrt(nr2) / (n * jnp.sqrt(na2))

    key = jax.random.key(42)
    res = float(run(key))
    gate = "PASS" if res <= 1e-6 else "FAIL"
    print(f"resid N={n} v={v} {precision:7s} {scheme:5s}: {res:.3e}  "
          f"gate(1e-6) {gate}", flush=True)
    return res


def dist_1x1(n=4096, v=512):
    """1x1x1-grid shard_map LU on the REAL chip: exercises the pallas
    vma path (pvary-lifted operands) that the CPU interpreter rejects.
    pivoting='none' because tournament/gather/full short-circuit to the
    single-chip kernel at P=1 (lu_25d dispatch); the trailing updates —
    the fused-kernel site — are variant code shared by all strategies.
    Diagonally-boosted matrix so no-pivoting LU stays stable."""
    from conflux_tpu.grid import make_grid
    from conflux_tpu.layout import BlockCyclic, distribute, undistribute
    from conflux_tpu.lu.p25d import lu_25d

    A = np.asarray(
        5.0 + np.random.default_rng(7).random((n, n)) + n * np.eye(n),
        np.float32)
    grid = make_grid((1, 1, 1))
    desc = BlockCyclic.create(n, n, v, grid)
    G = distribute(jnp.asarray(A), desc)
    for variant in ("unrolled", "lookahead"):
        t0 = time.perf_counter()
        Fd, perm = lu_25d(G, desc, pivoting="none", precision="high",
                          unroll=variant)
        F = np.asarray(undistribute(Fd, desc))
        dt = time.perf_counter() - t0
        perm = np.asarray(perm)
        L = np.tril(F, -1) + np.eye(n)
        U = np.triu(F)
        res = (np.linalg.norm(A[perm] - L @ U)
               / (n * np.linalg.norm(A)))
        print(f"dist 1x1x1 N={n} {variant:9s}: res {res:.3e} "
              f"({dt:.1f} s incl compile)", flush=True)


def main():
    which = os.environ.get("FUSED_E2E", "all")
    if which in ("all", "t16"):
        timing(16384, 1024, "high")
        timing(16384, 1024, "bf16")
    if which in ("all", "r16"):
        residual(16384, 1024, "high")
        residual(16384, 1024, "bf16")
    if which in ("all", "t32"):
        timing(32768, 1024, "high")
        timing(32768, 1024, "bf16")
    if which in ("all", "r32"):
        residual(32768, 1024, "high")
    if which in ("all", "rc"):
        residual(16384, 1024, "high", scheme="crout")
        residual(32768, 1024, "high", scheme="crout")
    if which in ("all", "dist"):
        dist_1x1()
    print("done", flush=True)


if __name__ == "__main__":
    main()
