"""Time the DISTRIBUTED rank program on a 1x1x1 grid on the real chip —
the VERDICT r2 item-4 gate: with the static row frontier, the SPMD LU at
N=16384 should be within ~15% of the single-chip flat kernel (was 333 ms
vs 190 ms before the frontier landed). Calls the shard_map body directly
(lu_25d's P=1 dispatch legitimately short-circuits to the single-chip
kernel, which is what users get; this probe measures the rank program
itself).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_spmd1.py > /tmp/prof_spmd1.log 2>&1 &
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
from conflux_tpu.lu.p25d import (
    _local_lu_25d,
    _local_lu_25d_unrolled,
    _local_lu_25d_windowed,
)


def timing(n, v, variant, precision="high", reps=3, rowpart=None):
    grid = make_grid((1, 1, 1))
    desc = BlockCyclic.create(n, n, v, grid)
    if variant == "unrolled":
        body = partial(_local_lu_25d_unrolled, desc, "tournament", precision,
                       rowpart=rowpart)
    elif variant == "lookahead":
        body = partial(_local_lu_25d_unrolled, desc, "tournament", precision,
                       lookahead=True, rowpart=rowpart)
    elif variant == "windowed":
        body = partial(_local_lu_25d_windowed, desc, "tournament", precision,
                       8, rowpart=rowpart)
    else:
        body = partial(_local_lu_25d, desc, "tournament", precision)
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
    try:
        s, _ = run(key); float(s)
    except Exception as e:
        print(f"spmd1 N={n} {variant:9s} rowpart={rowpart}: FAIL "
              f"{type(e).__name__} {str(e)[:90]}", flush=True)
        return
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s, _ = run(key); float(s)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    tf = 2 * n**3 / 3 / med / 1e12
    print(f"spmd1 N={n} v={v} {variant:9s} rowpart={rowpart}: "
          f"med {med*1e3:8.1f} ms {tf:6.1f} TF/s "
          f"[{min(ts)*1e3:.1f},{max(ts)*1e3:.1f}]", flush=True)


def main():
    n, v = 16384, 1024
    timing(n, v, "unrolled")            # rowpart=None -> default Px=1 cadence
    timing(n, v, "unrolled", rowpart=0)  # frontier off: the round-2 shape
    timing(n, v, "lookahead")
    timing(n, v, "windowed")
    print("done", flush=True)


if __name__ == "__main__":
    main()
