"""E2E chip timing of the TWO-LEVEL TRSM (ops/tri.py _TRSM_OUTER=256) at
the crout headline: the single-level substitution's long-K dots had 32
output rows (25% MXU sublane fill, 15.7 TF/s — trace tri.py:149) and the
TRSM total grows ~linearly in v, which is what flattened the v-sweep
(914.5 ms at v=1536 / 931.2 at v=2048, prof_r3g). With the long-K GEMMs
at 256-row blocks the v=2048 point should reorder.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_r3k.py > /tmp/prof_r3k.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from conflux_tpu.lu.single import lu_factor

N = 32768


def timing(n, v, precision="high", impl="threefry2x32", reps=3,
           dtype=jnp.float32):
    @jax.jit
    def run(key):
        A = (5.0 + jax.random.uniform(key, (n, n), jnp.float32)).astype(dtype)
        F, perm = lu_factor(A, v=v, precision=precision, scheme="crout")
        return jnp.sum(F.astype(jnp.float32)), perm[0]

    key = jax.random.key(42, impl=impl)
    try:
        s, _ = run(key); float(s)
    except Exception as e:
        print(f"trsm2 v={v} {impl} {precision}: FAIL {type(e).__name__} "
              f"{str(e)[:120]}", flush=True)
        return None
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s, _ = run(key); float(s)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    tf = 2 * n**3 / 3 / med / 1e12
    print(f"trsm2 v={v} {impl:12s} {precision}: med {med*1e3:8.1f} ms "
          f"{tf:6.1f} TF/s [{min(ts)*1e3:.1f},{max(ts)*1e3:.1f}]",
          flush=True)
    return med


def main():
    timing(N, 1536)
    timing(N, 2048)
    timing(N, 2048, dtype=jnp.bfloat16)
    print("done", flush=True)


if __name__ == "__main__":
    main()
