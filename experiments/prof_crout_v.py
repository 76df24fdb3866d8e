"""Crout headline tile-width sweep ABOVE the round-3 winner (v=1536):
the cost anatomy (README) says compaction gather traffic scales ~4n^3/v
(~250 ms of the 863 ms at v=1536) while the panel kernel's serial rank-1
call count is n/SUB — INDEPENDENT of v — so larger v should shave the
compaction term at ~0 panel cost. Round-3's sweep picked 1536 before the
two-level TRSM and the fused trailing kernel landed; re-measure upward.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
    experiments/prof_crout_v.py > /tmp/prof_crout_v.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from conflux_tpu.lu.single import lu_factor

N = 32768


def timing(v, reps=3):
    @jax.jit
    def run(key):
        A = 5.0 + jax.random.uniform(key, (N, N), jnp.float32)
        F, perm = lu_factor(A, v=v, precision="high", scheme="crout",
                            partition=1)
        return jnp.sum(F), perm[0]

    key = jax.random.key(42)
    t0 = time.perf_counter()
    try:
        s, _ = run(key); float(s)
    except Exception as e:
        print(f"crout N={N} v={v}: FAIL {type(e).__name__} {str(e)[:150]}",
              flush=True)
        return
    print(f"crout N={N} v={v}: compile+run {time.perf_counter()-t0:.0f} s",
          flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s, _ = run(key); float(s)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"crout N={N} v={v} 'high': med {med*1e3:8.1f} ms "
          f"{2*N**3/3/med/1e12:6.1f} TF/s "
          f"[{min(ts)*1e3:.1f},{max(ts)*1e3:.1f}]", flush=True)


def main():
    for v in (2048, 2560, 3072):
        timing(v)
    print("done", flush=True)


if __name__ == "__main__":
    main()
