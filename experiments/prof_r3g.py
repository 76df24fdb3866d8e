"""v-sweep of the gather-compaction crout at N=32768 'high' (the trace
prof_crout_trace attributes ~163 ms to the 27 compaction gathers and
~33 ms to pivot-row gathers — both halve at v=2048; the TRSM/U12 work
doubles and the update GEMMs get fewer/bigger).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_r3g.py > /tmp/prof_r3g.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from conflux_tpu.lu.single import lu_factor

N = 32768


def timing(n, v, precision, reps=3, dtype=jnp.float32):
    @jax.jit
    def run(key):
        A = (5.0 + jax.random.uniform(key, (n, n), jnp.float32)).astype(dtype)
        F, perm = lu_factor(A, v=v, precision=precision, scheme="crout")
        return jnp.sum(F.astype(jnp.float32)), perm[0]

    key = jax.random.key(42)
    try:
        s, _ = run(key); float(s)
    except Exception as e:
        print(f"crout/gather N={n} v={v} {precision}/{jnp.dtype(dtype).name}:"
              f" FAIL {type(e).__name__} {str(e)[:100]}", flush=True)
        return None
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s, _ = run(key); float(s)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    tf = 2 * n**3 / 3 / med / 1e12
    print(f"crout/gather N={n} v={v} {precision}/{jnp.dtype(dtype).name}: "
          f"med {med*1e3:8.1f} ms {tf:6.1f} TF/s "
          f"[{min(ts)*1e3:.1f},{max(ts)*1e3:.1f}]", flush=True)
    return med


def main():
    timing(N, 2048, "high")
    timing(N, 1536, "high")
    timing(N, 2048, "high", dtype=jnp.bfloat16)
    print("done", flush=True)


if __name__ == "__main__":
    main()
