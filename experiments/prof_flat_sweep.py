"""Sweep the flat-LU knobs on the real chip at N=16384: partition cadence
`part` (dead >= max(v, live // part)), panel width v, and TRSM method.
Then trace the best config (device-op attribution via prof_trace3 infra).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_flat_sweep.py > /tmp/prof_flat_sweep.log 2>&1 &
"""

import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from conflux_tpu.lu.single import _getrf_flat


def timeit(f, A, reps=3):
    out = f(A)
    float(out[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(A)
        float(out[0])
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    rng = np.random.default_rng(42)
    n = 16384
    A = jnp.asarray(5.0 + rng.random((n, n), dtype=np.float32))
    for v, part in ((512, 1), (512, 2), (512, 3), (512, 6), (512, 1_000_000),
                    (1024, 2), (1024, 6), (768, 3)):
        f = jax.jit(partial(
            lambda a, v, part: (lambda F, p: (jnp.sum(F), p[0]))(
                *_getrf_flat(a, v, "high", part)), v=v, part=part))
        ms = timeit(f, A)
        gf = 2 / 3 * n**3 / ms / 1e6
        print(f"flat N={n} v={v:5d} part={part:8d}: {ms:8.1f} ms "
              f"{gf:9.1f} GF/s", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
