"""Chip time of the NEW left-looking (crout) SPMD rank program on a 1x1x1
grid — the multi-chip perf proxy and the VERDICT r3 top item: the
right-looking SPMD variants floor at 281 ms (windowed, /tmp/prof_spmd1.log)
at N=16384 v=1024 'high' vs the single-chip crout kernel's 177 ms, because
their trailing GEMMs are the K=v/Pz operand-re-read-bound shape. The crout
variant converts the same FLOPs into big-K GEMMs; the gate is <= ~195 ms
(within 10% of 177).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
    experiments/prof_spmd_crout.py > /tmp/prof_spmd_crout.log 2>&1 &
"""

import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from conflux_tpu.grid import make_grid
from conflux_tpu.layout import BlockCyclic
from conflux_tpu.lu.p25d import _local_lu_25d_crout


def timing(n, v, precision="high", reps=3, rowpart=None, label=""):
    grid = make_grid((1, 1, 1))
    desc = BlockCyclic.create(n, n, v, grid)
    body = partial(_local_lu_25d_crout, desc, "tournament", precision,
                   rowpart=rowpart)
    fn = shard_map(
        body,
        mesh=desc.grid.mesh,
        in_specs=(P("z", "x", "y"), P("z", "x", "y"), P("z", "x", "y", None)),
        out_specs=(P("z", "x", "y"), P("z", "x", "y", None)),
    )

    @jax.jit
    def run(key):
        A = 5.0 + jax.random.uniform(key, (n, n), jnp.float32)
        F, piv = fn(A[None], jnp.zeros((1, n, n), jnp.float32),
                    jnp.zeros((1, 1, 1, n), jnp.int32))
        return jnp.sum(F), piv[0, 0, 0, 0]

    key = jax.random.key(42)
    t0 = time.perf_counter()
    try:
        s, _ = run(key); float(s)
    except Exception as e:
        print(f"spmd-crout N={n} v={v} rowpart={rowpart}: FAIL "
              f"{type(e).__name__} {str(e)[:200]}", flush=True)
        return
    print(f"spmd-crout N={n} v={v} rowpart={rowpart}: compile+run "
          f"{time.perf_counter()-t0:.0f} s", flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s, _ = run(key); float(s)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"spmd-crout N={n} v={v} rowpart={rowpart}{label}: "
          f"med {med*1e3:8.1f} ms {2*n**3/3/med/1e12:6.1f} TF/s "
          f"[{min(ts)*1e3:.1f},{max(ts)*1e3:.1f}]", flush=True)


def chol_timing(n, v, precision="high", reps=3):
    """Same proxy for the left-looking Cholesky rank program (vs the
    single-chip flat left-looking kernel's 71 ms at N=16384)."""
    from conflux_tpu.cholesky.p25d import _local_cholesky_25d_crout

    grid = make_grid((1, 1, 1))
    desc = BlockCyclic.create(n, n, v, grid)
    body = partial(_local_cholesky_25d_crout, desc, precision)
    fn = shard_map(body, mesh=desc.grid.mesh,
                   in_specs=P("z", "x", "y"), out_specs=P("z", "x", "y"))

    @jax.jit
    def run(key):
        B = jax.random.uniform(key, (n, n), jnp.float32)
        S = (B + B.T) / 2 + 2 * n * jnp.eye(n, dtype=jnp.float32)
        return jnp.sum(fn(S[None]))

    key = jax.random.key(42)
    t0 = time.perf_counter()
    try:
        float(run(key))
    except Exception as e:
        print(f"spmd-crout-chol N={n} v={v}: FAIL {type(e).__name__} "
              f"{str(e)[:200]}", flush=True)
        return
    print(f"spmd-crout-chol N={n} v={v}: compile+run "
          f"{time.perf_counter()-t0:.0f} s", flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(key))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"spmd-crout-chol N={n} v={v}: med {med*1e3:8.1f} ms "
          f"{n**3/3/med/1e12:6.1f} TF/s (N^3/3) "
          f"[{min(ts)*1e3:.1f},{max(ts)*1e3:.1f}]", flush=True)


def main():
    n = 16384
    timing(n, 1024, rowpart=1)   # per-step compaction (single-chip cadence)
    timing(n, 1024, rowpart=2)
    timing(n, 2048, rowpart=1)
    chol_timing(n, 1024)
    chol_timing(n, 2048)
    print("done", flush=True)


if __name__ == "__main__":
    main()
