"""Numerics of the Pallas f32 matmul vs XLA precision modes: error vs a
float64 reference on ill-ish-conditioned operands. Decides whether
matmul_pallas can serve as the trailing-update GEMM.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_pallas_prec.py > /tmp/prof_pallas_prec.log 2>&1 &
"""

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from conflux_tpu.ops.pallas_gemm import matmul_pallas


def main():
    rng = np.random.default_rng(0)
    m = k = n = 2048
    A = (rng.standard_normal((m, k)) * (1 + 10 * rng.random((m, k)))).astype(np.float32)
    B = (rng.standard_normal((k, n)) * (1 + 10 * rng.random((k, n)))).astype(np.float32)
    ref = np.asarray(A, np.float64) @ np.asarray(B, np.float64)
    Aj, Bj = jnp.asarray(A), jnp.asarray(B)
    outs = {
        "xla_highest": jax.jit(lambda a, b: jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST))(Aj, Bj),
        "xla_high": jax.jit(lambda a, b: jnp.dot(a, b, precision=jax.lax.Precision.HIGH))(Aj, Bj),
        "xla_bf16": jax.jit(lambda a, b: jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), preferred_element_type=jnp.float32))(Aj, Bj),
        "pallas_f32": jax.jit(lambda a, b: matmul_pallas(a, b))(Aj, Bj),
    }
    scale = np.abs(ref).max()
    for name, C in outs.items():
        err = np.abs(np.asarray(C, np.float64) - ref).max() / scale
        print(f"{name:14s} max rel err {err:.3e}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
