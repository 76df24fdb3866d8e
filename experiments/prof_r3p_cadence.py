"""Crout compaction-cadence sweep at the N=32768 headline (round 3).

The trace budget says the per-step full-width live-row gather costs
~250 ms of the ~860 ms device time (68-90 GB r+w over 21 steps,
experiments/prof_crout_split.py).  `partition=p` fires the gather every p
steps at the price of up to (p-1)*v dead rows riding along in the panel
GEMMs (~+7%/step FLOPs at p=2) and in the rank-1 pivot chain's VPU pass.
Model: p=2 saves ~125 ms of gather for ~+40 ms of GEMM — net ~-85 ms.
This sweep measures it (and whether the v optimum shifts to 2048 once
compaction is cheaper).

Protocol = bench.py exactly: in-jit generation, scalar summary readback,
median of 3 (bench uses 5; 3 per config here — 4 configs x minutes-long
remote compiles).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_r3p_cadence.py > /tmp/prof_r3p.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from conflux_tpu.lu.single import lu_factor

N, REPS = 32768, 3
CONFIGS = [(1536, 1), (1536, 2), (1536, 3), (2048, 2)]


def measure(v, part):
    @jax.jit
    def run(key):
        A = 5.0 + jax.random.uniform(key, (N, N), jnp.float32)
        F, perm = lu_factor(A, v=v, precision="high", partition=part)
        return jnp.sum(F), perm[0]

    key = jax.random.key(42)
    for attempt in (1, 2):
        try:
            s, p0 = run(key)
            float(s)
            break
        except Exception as e:  # flaky remote compile helper: retry once
            print(f"  v={v} part={part} attempt {attempt} failed: "
                  f"{type(e).__name__}: {e}", flush=True)
            if attempt == 2:
                return
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        s, p0 = run(key)
        float(s)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    tf = 2 * N**3 / 3 / med / 1e12
    print(f"crout v={v:5d} part={part}: med {med*1e3:8.1f} ms {tf:6.2f} TF/s"
          f"  [{min(ts)*1e3:.1f},{max(ts)*1e3:.1f}]", flush=True)


def main():
    for v, part in CONFIGS:
        measure(v, part)
    print("done", flush=True)


if __name__ == "__main__":
    main()
