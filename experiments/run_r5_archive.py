"""Round-5 archive re-measures for README rows whose CSV provenance was
stale (VERDICT r4 item 3):

  * bf16-STORAGE LU N=32768 — the README's "643 ms / 36.5 TF/s" row was
    measured in round 2 on the FLAT scheme; the bf16s default is now the
    crout kernel, so the row must be re-measured on today's code path.
  * single-chip crout LU N=16384 'high' — README quotes 177 ms with no
    benchmarks.csv row behind it.

Prints ready-to-append benchmarks.csv rows (3 reps each) + residuals.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
    experiments/run_r5_archive.py > /tmp/run_r5_archive.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from conflux_tpu.lu.single import lu_factor


def measure(n, v, dtype, precision, tag, reps=3):
    @jax.jit
    def run(key):
        A = 5.0 + jax.random.uniform(key, (n, n), jnp.float32)
        F, piv = lu_factor(A.astype(dtype), v=v, precision=precision,
                           scheme="crout")
        return jnp.sum(F.astype(jnp.float32)), piv[0]

    key = jax.random.key(42)
    t0 = time.perf_counter()
    try:
        s, _ = run(key)
        float(s)
    except Exception as e:
        print(f"{tag} N={n}: FAIL {type(e).__name__} {str(e)[:200]}",
              flush=True)
        return
    print(f"{tag} N={n} v={v}: compile+run {time.perf_counter()-t0:.0f} s",
          flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s, _ = run(key)
        float(s)
        ts.append(time.perf_counter() - t0)
    for t in ts:
        print(f"_row_ lu,conflux-tpu,{n},{n},1,1x1x1,time,strong,"
              f"{t*1e3:.1f},{v},{tag}", flush=True)
    med = sorted(ts)[len(ts) // 2]
    print(f"{tag} N={n} v={v}: med {med*1e3:.1f} ms "
          f"{2*n**3/3/med/1e12:.1f} TF/s", flush=True)


def main():
    measure(32768, 1536, jnp.bfloat16, "high", "bf16s")
    measure(16384, 1024, jnp.float32, "high", "high")
    print("done", flush=True)


if __name__ == "__main__":
    main()
