"""Amortized recalibration of choose_variant's small-N LU rule (VERDICT r2
weak #6): the N=4096 'fori wins' decision came from standalone timings
(45 vs 39 ms) sitting inside the ~24 ms tunnel dispatch floor. Here REPS
independent factorizations run back-to-back INSIDE one jit (per-rep
fold_in keys, results summed — nothing CSEs), so the floor cancels and
the per-run delta is read from the slope. Same rank-program invocation
as experiments/prof_spmd1.py.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_r3j.py > /tmp/prof_r3j.log 2>&1 &
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
from conflux_tpu.lu.p25d import _local_lu_25d, _local_lu_25d_unrolled

REPS = 8


def timing(n, v, variant, precision="high", outer=3):
    grid = make_grid((1, 1, 1))
    desc = BlockCyclic.create(n, n, v, grid)
    if variant == "fori":
        body = partial(_local_lu_25d, desc, "tournament", precision)
    else:
        body = partial(_local_lu_25d_unrolled, desc, "tournament", precision)
    fn = shard_map(
        body,
        mesh=desc.grid.mesh,
        in_specs=(P("z", "x", "y"), P("z", "x", "y"), P("z", "x", "y", None)),
        out_specs=(P("z", "x", "y"), P("z", "x", "y", None)),
    )

    @jax.jit
    def run(key):
        acc = jnp.float32(0)
        pacc = jnp.int32(0)
        for i in range(REPS):
            A = 5.0 + jax.random.uniform(
                jax.random.fold_in(key, i), (n, n), jnp.float32)
            F, piv = fn(A[None], jnp.zeros((1, n, n), jnp.float32),
                        jnp.zeros((1, 1, 1, n), jnp.int32))
            acc += jnp.sum(F)
            pacc += piv[0, 0, 0, 0]
        return acc, pacc

    key = jax.random.key(42)
    try:
        s, _ = run(key); float(s)
    except Exception as e:
        print(f"amort {variant:9s} N={n} v={v}: FAIL {type(e).__name__} "
              f"{str(e)[:140]}", flush=True)
        return None
    ts = []
    for _ in range(outer):
        t0 = time.perf_counter()
        s, _ = run(key); float(s)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    per = med / REPS * 1e3
    print(f"amort {variant:9s} N={n} v={v}: {per:7.2f} ms/run "
          f"(total {med*1e3:.1f} ms, {REPS} in-jit reps)", flush=True)
    return per


def main():
    for variant in ("fori", "unrolled"):
        timing(4096, 512, variant)
    for variant in ("fori", "unrolled"):
        timing(2048, 512, variant)
    print("done", flush=True)


if __name__ == "__main__":
    main()
