"""Windowed-SPMD knob sweep at the VERDICT #4 target (1x1x1 grid,
N=16384 v=1024 'high'): windows in {4, 8, 16}. windows == Nt makes every
step its own segment — per-step row shedding + static column frontier,
the exact cadence the flat single-chip kernel measured fastest (193 ms
per-step banding vs 313 no-movement). Compares against the 190 ms flat
kernel and the 289 ms round-2 windowed number (/tmp/prof_spmd1.log).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_spmd_windows.py > /tmp/prof_spmd_windows.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from conflux_tpu.grid import make_grid
from conflux_tpu.layout import BlockCyclic, distribute
from conflux_tpu.lu.p25d import lu_25d

N, V = 16384, 1024


def bench(desc, G, windows, reps=3):
    def run(G):
        F, piv = lu_25d(G, desc, "tournament", "high", "windowed",
                        windows=windows)
        return jnp.sum(F), piv[0]

    try:
        s, _ = run(G)
        float(s)
    except Exception as e:
        print(f"windowed windows={windows}: FAIL {type(e).__name__} "
              f"{str(e)[:120]}", flush=True)
        return
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s, _ = run(G)
        float(s)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    tf = 2 * N**3 / 3 / med / 1e12
    print(f"windowed windows={windows:3d}: med {med*1e3:8.1f} ms "
          f"{tf:6.1f} TF/s [{min(ts)*1e3:.1f},{max(ts)*1e3:.1f}]",
          flush=True)


def main():
    grid = make_grid((1, 1, 1))
    desc = BlockCyclic.create(N, N, V, grid)
    A = jax.jit(lambda key: 5.0 + jax.random.uniform(
        key, (N, N), jnp.float32))(jax.random.key(42))
    G = distribute(A, desc)
    del A
    for w in (4, 8, 16):
        bench(desc, G, w)
    print("done", flush=True)


if __name__ == "__main__":
    main()
