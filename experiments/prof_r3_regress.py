"""Round-3 regression probe: time the current flat LU at N=16384/8192 'high'
(archive claims 190-193 ms / 63 ms) and per-cadence, to localize the
1.8 s-vs-954 ms N=32768 discrepancy. Scalar-readback timing."""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from conflux_tpu.lu.single import lu_factor

def timed(f, *a, reps=3):
    float(f(*a)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(f(*a)[0]); ts.append((time.perf_counter()-t0)*1e3)
    return min(ts)

for n in (8192, 16384):
    for part in (1, 0):
        @jax.jit
        def run(key, n=n, part=part):
            A = 5.0 + jax.random.uniform(key, (n, n), jnp.float32)
            F, p = lu_factor(A, v=1024, precision="high", scheme="flat", partition=part)
            return jnp.sum(F), p[0]
        ms = timed(run, jax.random.key(0))
        print(f"N={n} partition={part}: {ms:8.1f} ms  {2/3*n**3/ms/1e6:8.1f} GF/s", flush=True)
