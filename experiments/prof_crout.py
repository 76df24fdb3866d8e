"""A/B the Crout (left-looking) LU against the right-looking flat scheme
on the real chip: N=16384 and N=32768, 'high' + bf16-STORAGE.

Hypothesis (see lu/single._getrf_crout): eliminating the per-step
whole-trailing-region read+write (~0.36 s at N=32768) and replacing the
K=v re-read-bound trailing dot with big-K compute-bound GEMMs moves the
LU toward the left-looking Cholesky's measured 35.3 TF/s.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_crout.py > /tmp/prof_crout.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from conflux_tpu.lu.single import lu_factor


def timing(n, v, precision, scheme, dtype=jnp.float32, reps=3, part=1):
    @jax.jit
    def run(key):
        A = (5.0 + jax.random.uniform(key, (n, n), jnp.float32)).astype(dtype)
        F, perm = lu_factor(A, v=v, precision=precision, scheme=scheme,
                            partition=part)
        return jnp.sum(F.astype(jnp.float32)), perm[0]

    key = jax.random.key(42)
    try:
        s, _ = run(key); float(s)
    except Exception as e:
        print(f"{scheme:6s} N={n} v={v} {precision}/{jnp.dtype(dtype).name} "
              f"part={part}: FAIL {type(e).__name__} {str(e)[:100]}",
              flush=True)
        return None
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s, _ = run(key); float(s)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    tf = 2 * n**3 / 3 / med / 1e12
    print(f"{scheme:6s} N={n} v={v} {precision}/{jnp.dtype(dtype).name} "
          f"part={part}: med {med*1e3:8.1f} ms {tf:6.1f} TF/s "
          f"[{min(ts)*1e3:.1f},{max(ts)*1e3:.1f}]", flush=True)
    return med


def bigk_ab(m, k, w, mode, reps=5):
    """Left-looking update shape [m, k] x [k, w]: big-K Mosaic kernel vs
    XLA dot, amortized by chaining `reps` dependent calls in one jit."""
    import numpy as np

    from conflux_tpu.ops.pallas_gemm import sub_matmul_pallas_bigk
    from conflux_tpu.ops.tri import schur_dot

    key = jax.random.key(0)
    A = jax.random.normal(key, (m, k), jnp.float32) / np.sqrt(k)
    B = jax.random.normal(jax.random.fold_in(key, 1), (k, w), jnp.float32)
    R0 = jax.random.normal(jax.random.fold_in(key, 2), (m, w), jnp.float32)

    def chain(fn):
        @jax.jit
        def run(R, A, B):
            for _ in range(reps):
                R = fn(R, A, B)
                A = A + R[:, :1] * 0  # dependency, no reuse of one buffer
            return jnp.sum(R)
        return run

    for label, fn in (
        ("pallas-bigk", lambda R, A, B: sub_matmul_pallas_bigk(R, A, B, mode)),
        ("xla", lambda R, A, B: R - schur_dot(A, B, mode)),
    ):
        try:
            run = chain(fn)
            float(run(R0, A, B))
            t0 = time.perf_counter()
            float(run(R0, A, B))
            dt = (time.perf_counter() - t0) / reps
            tf = 2 * m * k * w / dt / 1e12
            print(f"bigk [{m},{k},{w}] {mode:5s} {label:11s}: "
                  f"{dt*1e3:7.2f} ms {tf:6.1f} TF/s", flush=True)
        except Exception as e:
            print(f"bigk [{m},{k},{w}] {mode:5s} {label:11s}: FAIL "
                  f"{type(e).__name__} {str(e)[:90]}", flush=True)


def main():
    for scheme in ("crout", "flat"):
        timing(16384, 1024, "high", scheme)
    for part in (1, 2, 4):
        timing(16384, 1024, "high", "crout", part=part)
    for v in (512, 2048):
        timing(16384, v, "high", "crout")
    for mode in ("high", "bf16"):
        for k in (4096, 8192, 16384):
            bigk_ab(16384, k, 1024, mode)
    # crout end-to-end with the big-K Mosaic kernel on both update GEMMs
    import os

    os.environ["CONFLUX_CROUT_BIGK"] = "1"
    jax.clear_caches()
    timing(16384, 1024, "high", "crout")
    timing(32768, 1024, "high", "crout")
    timing(32768, 1024, "high", "crout", dtype=jnp.bfloat16)
    del os.environ["CONFLUX_CROUT_BIGK"]
    jax.clear_caches()
    for scheme in ("crout", "flat"):
        timing(32768, 1024, "high", scheme)
        timing(32768, 1024, "high", scheme, dtype=jnp.bfloat16)
    # isolate the fused Mosaic trailing path: flat with it disabled
    # (same plain-uniform generator as the archive protocol)
    os.environ["CONFLUX_NO_PALLAS_TRAILING"] = "1"
    jax.clear_caches()
    timing(16384, 1024, "high", "flat")
    timing(32768, 1024, "high", "flat")
    del os.environ["CONFLUX_NO_PALLAS_TRAILING"]
    print("done", flush=True)


if __name__ == "__main__":
    main()
