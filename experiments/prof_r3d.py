"""Round-3 headline matrix at N=32768 'high': {gather, swap} compaction x
{XLA, big-K Mosaic} update GEMMs. The prof_crout_split attribution (dispatch
floor subtracted, integrated over 32 steps) at the 949 ms gather+XLA config:

  A panel-update GEMM ~176 ms   B row-block GEMM ~170 ms
  C factor_panel     ~208 ms   D compaction gather ~250 ms
  E pivot-row gather  ~60 ms   F TRSM+band          ~40 ms

swap targets D (<= v-row swap instead of whole-live-region gather);
CONFLUX_CROUT_BIGK targets A+B (XLA's subtract-dot measured 17-25 TF/s at
these shapes vs the kernel's 36.5).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_r3d.py > /tmp/prof_r3d.log 2>&1 &
"""

import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from conflux_tpu.lu.single import lu_factor

N = 32768


def timing(n, v, precision, compaction, reps=3, dtype=jnp.float32):
    @jax.jit
    def run(key):
        A = (5.0 + jax.random.uniform(key, (n, n), jnp.float32)).astype(dtype)
        F, perm = lu_factor(A, v=v, precision=precision, scheme="crout",
                            compaction=compaction)
        return jnp.sum(F.astype(jnp.float32)), perm[0]

    key = jax.random.key(42)
    bigk = "bigk" if os.environ.get("CONFLUX_CROUT_BIGK") else "xla "
    try:
        s, _ = run(key); float(s)
    except Exception as e:
        print(f"crout/{compaction:6s}/{bigk} N={n} v={v} "
              f"{precision}/{jnp.dtype(dtype).name}: FAIL "
              f"{type(e).__name__} {str(e)[:100]}", flush=True)
        return None
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s, _ = run(key); float(s)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    tf = 2 * n**3 / 3 / med / 1e12
    print(f"crout/{compaction:6s}/{bigk} N={n} v={v} "
          f"{precision}/{jnp.dtype(dtype).name}: med {med*1e3:8.1f} ms "
          f"{tf:6.1f} TF/s [{min(ts)*1e3:.1f},{max(ts)*1e3:.1f}]", flush=True)
    return med


def main():
    timing(N, 1024, "high", "gather")            # the 949 ms reference point
    timing(N, 1024, "high", "swap")
    os.environ["CONFLUX_CROUT_BIGK"] = "1"
    jax.clear_caches()
    timing(N, 1024, "high", "swap")
    timing(N, 1024, "high", "gather")
    timing(N, 2048, "high", "swap")              # K-granularity with bigk
    timing(N, 1024, "high", "swap", dtype=jnp.bfloat16)
    del os.environ["CONFLUX_CROUT_BIGK"]
    print("done", flush=True)


if __name__ == "__main__":
    main()
