"""Classify the N=32768 SPMD compile kill (all windowed arms die in
~15-20 s, prof_windowed32k_retry2.log — including w=1 fori-shaped and
with the Mosaic panel kernel off; the single-chip kernels at the same
size compile fine). Hypothesis: a [32768, 32768] f32 per-device array is
EXACTLY 2^32 bytes and some TPU-backend pass in the shard_map path dies
on it (int32 byte-size overflow class).

Arms (each fails in seconds or compiles in minutes):
  1. fori variant, N=32768 f32        — confirm the class beyond windowed
  2. crout variant, N=32768 f32       — Python-loop program, same bytes
  3. fori, N=32768 bf16 STORAGE       — 2^31 bytes/array: compiles => the
                                        threshold is bytes, not shape
  4. fori, N=31744 f32 (62 tiles)     — just under 2^32: compiles => the
                                        threshold is exactly 2^32 bytes
On a real multi-chip mesh per-device blocks are N/Px x N/Py — far below
the threshold at every reference config — so this classifies a
single-device-proxy limit, not a scale limit; still worth pinning.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
    experiments/prof_win32k_class.py > /tmp/prof_win32k_class.log 2>&1 &
"""

import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from conflux_tpu.grid import make_grid
from conflux_tpu.layout import BlockCyclic
from conflux_tpu.lu.p25d import _local_lu_25d, _local_lu_25d_crout


def arm(label, n, v, variant, dtype):
    grid = make_grid((1, 1, 1))
    desc = BlockCyclic.create(n, n, v, grid)
    body = (partial(_local_lu_25d_crout, desc, "tournament", "high",
                    rowpart=2)
            if variant == "crout"
            else partial(_local_lu_25d, desc, "tournament", "high"))
    fn = shard_map(
        body, mesh=desc.grid.mesh,
        in_specs=(P("z", "x", "y"), P("z", "x", "y"), P("z", "x", "y", None)),
        out_specs=(P("z", "x", "y"), P("z", "x", "y", None)))

    @jax.jit
    def run(key):
        A = (5.0 + jax.random.uniform(key, (n, n), jnp.float32)).astype(dtype)
        F, piv = fn(A[None], jnp.zeros((1, n, n), dtype),
                    jnp.zeros((1, 1, 1, n), jnp.int32))
        return jnp.sum(F.astype(jnp.float32)), piv[0, 0, 0, 0]

    t0 = time.perf_counter()
    try:
        s, _ = run(jax.random.key(42)); float(s)
        print(f"{label}: OK compile+run {time.perf_counter()-t0:.0f} s",
              flush=True)
    except Exception as e:
        print(f"{label}: FAIL after {time.perf_counter()-t0:.0f} s "
              f"{type(e).__name__} {str(e)[:160]}", flush=True)


def main():
    arm("fori   N=32768 f32 ", 32768, 512, "fori", jnp.float32)
    arm("crout  N=32768 f32 ", 32768, 1024, "crout", jnp.float32)
    arm("fori   N=32768 bf16", 32768, 512, "fori", jnp.bfloat16)
    arm("fori   N=31744 f32 ", 31744, 512, "fori", jnp.float32)
    print("done", flush=True)


if __name__ == "__main__":
    main()
