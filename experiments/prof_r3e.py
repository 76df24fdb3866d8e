"""Crout compaction-cadence sweep at N=32768 'high' (gather compaction —
the swap scatter measured 1472 ms vs gather's 942, prof_r3d): partition=e
compacts every e steps, so total gather traffic ~ (n^2/2)(32/e) bytes at
the 240 GB/s arbitrary-row rate, while the panel-update GEMM/panel heights
carry up to (e-1)v extra dead rows between compactions.

The big-K Mosaic leg is dropped: prof_r3d measured CONFLUX_CROUT_BIGK
LOSING end-to-end at these shapes (gather: 1084 vs 942 ms; XLA's HIGH dot
is already compute-bound at big K — the 17-25 TF/s ceiling is specific to
the K=v right-looking trailing shape).

part=1 is re-measured first as the reference point WITH the panel
gather-extract change (one-hot contraction -> column gather in
ops/panel._lu_select_loop_t).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_r3e.py > /tmp/prof_r3e.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from conflux_tpu.lu.single import lu_factor

N = 32768


def timing(n, v, precision, part, reps=3, dtype=jnp.float32):
    @jax.jit
    def run(key):
        A = (5.0 + jax.random.uniform(key, (n, n), jnp.float32)).astype(dtype)
        F, perm = lu_factor(A, v=v, precision=precision, scheme="crout",
                            partition=part)
        return jnp.sum(F.astype(jnp.float32)), perm[0]

    key = jax.random.key(42)
    try:
        s, _ = run(key); float(s)
    except Exception as e:
        print(f"crout/part={part} N={n} v={v}: FAIL "
              f"{type(e).__name__} {str(e)[:100]}", flush=True)
        return None
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s, _ = run(key); float(s)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    tf = 2 * n**3 / 3 / med / 1e12
    print(f"crout/part={part} N={n} v={v} "
          f"{precision}/{jnp.dtype(dtype).name}: med {med*1e3:8.1f} ms "
          f"{tf:6.1f} TF/s [{min(ts)*1e3:.1f},{max(ts)*1e3:.1f}]", flush=True)
    return med


def main():
    for part in (1, 2, 4, 8):
        timing(N, 1024, "high", part)
    print("done", flush=True)


if __name__ == "__main__":
    main()
