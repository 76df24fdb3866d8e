"""Windowed rank program at a REAL step count on the chip (VERDICT r3
Missing #2): N=32768, v=512 -> Nt=64 steps in 8 windows — the designated
large-Nt scale path has to survive this platform's remote compile helper
(which dies on very large unrolled programs) and produce a sane time.
Grid 1x1x1 (the multi-chip proxy, same protocol as prof_spmd1.py).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
    experiments/prof_windowed32k.py > /tmp/prof_windowed32k.log 2>&1 &
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
from conflux_tpu.lu.p25d import _local_lu_25d_windowed


def timing(n, v, windows, precision="high", reps=3):
    grid = make_grid((1, 1, 1))
    desc = BlockCyclic.create(n, n, v, grid)
    body = partial(_local_lu_25d_windowed, desc, "tournament", precision,
                   windows)
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
        print(f"win32k N={n} v={v} w={windows}: FAIL {type(e).__name__} "
              f"{str(e)[:300]}", flush=True)
        return
    print(f"win32k N={n} v={v} w={windows}: compile+run "
          f"{time.perf_counter()-t0:.0f} s", flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s, _ = run(key); float(s)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"win32k N={n} v={v} Nt={n//v} w={windows}: med {med*1e3:8.1f} ms "
          f"{2*n**3/3/med/1e12:6.1f} TF/s "
          f"[{min(ts)*1e3:.1f},{max(ts)*1e3:.1f}]", flush=True)


def main():
    timing(32768, 512, 8)
    print("done", flush=True)


if __name__ == "__main__":
    main()
