"""Timed 1-device SPMD rank-program runs at N=32768 f32 'high' — the
crout variants are the only rank programs that compile at this size on
this toolchain (the 2^32-byte fori-carry kill, r4_experiments.md); the
classifier proved compile+run, this records the med-of-3 numbers next to
the single-chip kernels (LU 857 ms crout / Cholesky 332 ms flat).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
    experiments/prof_spmd32k.py > /tmp/prof_spmd32k.log 2>&1 &
"""

import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from conflux_tpu.cholesky.p25d import _local_cholesky_25d_crout
from conflux_tpu.grid import make_grid
from conflux_tpu.layout import BlockCyclic
from conflux_tpu.lu.p25d import _local_lu_25d_crout

N = 32768


def lu_timing(v, rowpart, reps=3):
    grid = make_grid((1, 1, 1))
    desc = BlockCyclic.create(N, N, v, grid)
    body = partial(_local_lu_25d_crout, desc, "tournament", "high",
                   rowpart=rowpart)
    fn = shard_map(
        body, mesh=desc.grid.mesh,
        in_specs=(P("z", "x", "y"), P("z", "x", "y"), P("z", "x", "y", None)),
        out_specs=(P("z", "x", "y"), P("z", "x", "y", None)))

    @jax.jit
    def run(key):
        A = 5.0 + jax.random.uniform(key, (N, N), jnp.float32)
        F, piv = fn(A[None], jnp.zeros((1, N, N), jnp.float32),
                    jnp.zeros((1, 1, 1, N), jnp.int32))
        return jnp.sum(F), piv[0, 0, 0, 0]

    key = jax.random.key(42)
    t0 = time.perf_counter()
    try:
        s, _ = run(key); float(s)
    except Exception as e:
        print(f"spmd32k-lu v={v} rp={rowpart}: FAIL {type(e).__name__} "
              f"{str(e)[:160]}", flush=True)
        return
    print(f"spmd32k-lu v={v} rp={rowpart}: compile+run "
          f"{time.perf_counter()-t0:.0f} s", flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); s, _ = run(key); float(s)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"spmd32k-lu v={v} rp={rowpart}: med {med*1e3:8.1f} ms "
          f"{2*N**3/3/med/1e12:6.1f} TF/s [{min(ts)*1e3:.1f},"
          f"{max(ts)*1e3:.1f}]", flush=True)


def chol_timing(v, reps=3):
    grid = make_grid((1, 1, 1))
    desc = BlockCyclic.create(N, N, v, grid)
    body = partial(_local_cholesky_25d_crout, desc, "high")
    fn = shard_map(body, mesh=desc.grid.mesh,
                   in_specs=P("z", "x", "y"), out_specs=P("z", "x", "y"))

    @jax.jit
    def run(key):
        B = jax.random.uniform(key, (N, N), jnp.float32)
        S = (B + B.T) / 2 + 2 * N * jnp.eye(N, dtype=jnp.float32)
        return jnp.sum(fn(S[None]))

    key = jax.random.key(42)
    t0 = time.perf_counter()
    try:
        float(run(key))
    except Exception as e:
        print(f"spmd32k-chol v={v}: FAIL {type(e).__name__} "
              f"{str(e)[:160]}", flush=True)
        return
    print(f"spmd32k-chol v={v}: compile+run {time.perf_counter()-t0:.0f} s",
          flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(run(key))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"spmd32k-chol v={v}: med {med*1e3:8.1f} ms "
          f"{N**3/3/med/1e12:6.1f} TF/s (N^3/3) [{min(ts)*1e3:.1f},"
          f"{max(ts)*1e3:.1f}]", flush=True)


def main():
    lu_timing(1024, 2)     # the classifier's compiled config (cached)
    chol_timing(512)       # the dispatch-default variant at this size
    print("done", flush=True)


if __name__ == "__main__":
    main()
