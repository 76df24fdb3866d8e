"""Per-step device-time attribution for the N=65536 flat-stepped LU.

The full run measured 1541.7 s wall including host streaming
(/tmp/prof_65536.log 2026-08-20); upload+download through the ~50 MB/s
tunnel accounts for ~350 s and the GEMM work at the bf16out rate for
~10-15 s, leaving ~1100 s unexplained — the signature of the documented
~100x HBM-pressure degradation (CLAUDE.md: working sets near 13 GB
run 100x slow with huge variance; this driver peaks at ~12.4 GB:
R 8.6 GB donated + ~1.6 GB of f32 panel temps + 2 x 1.07 GB trailing
chunk slice/output at chunk=8192).

Measures single steps (k = 0, v, 2v, 3v) with a scalar fence between,
across (v, chunk) arms chosen to DISCRIMINATE the two hypotheses:

  * per-chunk dus copies (XLA in-place analysis giving up on the
    slice/update chain, CLAUDE.md): per-step time scales with the NUMBER
    of chunks — chunk=16384 (4 copies) beats 8192 beats 4096;
  * HBM-pressure cliff (peak ~12.5-13 GB at v=2048/chunk=8192): time
    drops with SMALLER temps — chunk=4096 and v=1024 win, 16384 loses.

The archive run's config is (v=2048, chunk=8192): 57.46 s median,
3.3 TF/s, 44% rep-to-rep variance (/tmp/run_archive_65536.log) vs the
~1.4 s GEMM envelope — ~40x degraded.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_65536_steps.py > /tmp/prof_65536_steps.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from conflux_tpu.lu.stepped import _make_step_dyn

N = 65536


def device_bf16_matrix():
    """Generate the 8.6 GB bf16 matrix on device in 4096-row chunks (an
    f32 whole-matrix temp would be 17 GB; CLAUDE.md upload rules)."""
    R = jnp.zeros((N, N), jnp.bfloat16)
    gen = jax.jit(
        lambda buf, key, r0: jax.lax.dynamic_update_slice(
            buf,
            (5.0 + jax.random.uniform(key, (4096, N), jnp.float32)
             ).astype(jnp.bfloat16),
            (r0, 0)),
        donate_argnums=(0,))
    for i, r0 in enumerate(range(0, N, 4096)):
        R = gen(R, jax.random.key(i), np.int32(r0))
    float(R[0, 0].astype(jnp.float32))
    return R


def probe(V, chunk):
    R = device_bf16_matrix()
    avail = jnp.ones(N, bool)
    porder = jnp.zeros(N, jnp.int32)
    step = _make_step_dyn(V, N, N, "high", chunk, True)
    # compile (not timed)
    t0 = time.perf_counter()
    R, avail, porder = step(np.int32(0), R, avail, porder)
    float(porder[0])
    print(f"[v={V} chunk={chunk}] step k=0 incl compile: "
          f"{time.perf_counter() - t0:8.1f} s", flush=True)
    for k in (V, 2 * V, 3 * V):
        t0 = time.perf_counter()
        R, avail, porder = step(np.int32(k), R, avail, porder)
        float(porder[0])
        print(f"[v={V} chunk={chunk}] step k={k}: "
              f"{time.perf_counter() - t0:8.2f} s", flush=True)
    del R, avail, porder


def main():
    probe(2048, 8192)    # the archive config (57 s/run observed)
    probe(2048, 16384)   # fewer chunk dus, bigger temps
    probe(2048, 4096)    # more chunk dus, smaller temps
    probe(1024, 8192)    # halved panel temps
    print("done", flush=True)


if __name__ == "__main__":
    main()
