"""Split-compaction crout at the N=32768 headline: the raw matrix T is
never moved; only the multiplier buffer Lbuf compacts (~1/3 the monolithic
gather traffic; see lu/single._getrf_crout_split). Bit-identical pivots to
'gather' (tests/test_single_device.py::test_lu_crout_split_compaction).

Configs: gather vs split 'high' f32, split bf16-STORAGE, split v=2048.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_r3f.py > /tmp/prof_r3f.log 2>&1 &
"""

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
    try:
        s, _ = run(key); float(s)
    except Exception as e:
        print(f"crout/{compaction:6s} N={n} v={v} "
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
    print(f"crout/{compaction:6s} N={n} v={v} "
          f"{precision}/{jnp.dtype(dtype).name}: med {med*1e3:8.1f} ms "
          f"{tf:6.1f} TF/s [{min(ts)*1e3:.1f},{max(ts)*1e3:.1f}]", flush=True)
    return med


def main():
    timing(N, 1024, "high", "gather")      # reference (one-hot panel back)
    timing(N, 1024, "high", "split")
    timing(N, 2048, "high", "split")
    timing(N, 1024, "high", "split", dtype=jnp.bfloat16)
    print("done", flush=True)


if __name__ == "__main__":
    main()
