"""Partition-cadence sweep of the gather-compaction crout at N=32768
'high': partition=p compacts every p panels, halving/quartering the
~208 ms of compaction gathers (trace prof_crout_trace, 639 GB/s — the
bytes are the lever, not the rate) at the cost of dead rows riding
through up to p-1 extra panel GEMMs + panel factorizations
(~1 TFLOP ~= 20 ms per extra step at the measured 62 TF/s GEMM rate).

Takes the winning v from prof_r3g as argv[1] (default 1024).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_r3h.py [v] > /tmp/prof_r3h.log 2>&1 &
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from conflux_tpu.lu.single import lu_factor

N = 32768
V = int(sys.argv[1]) if len(sys.argv) > 1 else 1024


def timing(n, v, part, precision="high", reps=3):
    @jax.jit
    def run(key):
        A = 5.0 + jax.random.uniform(key, (n, n), jnp.float32)
        F, perm = lu_factor(A, v=v, precision=precision, scheme="crout",
                            partition=part)
        return jnp.sum(F), perm[0]

    key = jax.random.key(42)
    try:
        s, _ = run(key); float(s)
    except Exception as e:
        print(f"crout N={n} v={v} part={part}: FAIL {type(e).__name__} "
              f"{str(e)[:100]}", flush=True)
        return None
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s, _ = run(key); float(s)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    tf = 2 * n**3 / 3 / med / 1e12
    print(f"crout N={n} v={v} part={part} {precision}: med {med*1e3:8.1f} ms"
          f" {tf:6.1f} TF/s [{min(ts)*1e3:.1f},{max(ts)*1e3:.1f}]",
          flush=True)
    return med


def main():
    timing(N, V, 2)
    timing(N, V, 4)
    print("done", flush=True)


if __name__ == "__main__":
    main()
