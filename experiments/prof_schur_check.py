"""On-chip CORRECTNESS check of the fused Mosaic update kernels against
schur_dot (the XLA reference): max relative error at representative
shapes, all modes, both the whole-R (c0 offset) and bigk kernels.

Interpret-mode parity passes on CPU (tests/test_single_device.py), but the
real Mosaic lowering was never validated on this chip — the 'high'-mode
kernel did not even compile before the pre-split fix (scoped-VMEM OOM),
and the first e2e residual run FAILed its gate with a mode-independent
3e-6, so the failure must be localized kernel-first.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_schur_check.py > /tmp/schur_check.log 2>&1 &
"""

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from conflux_tpu.ops.pallas_gemm import (
    schur_update_pallas,
    sub_matmul_pallas_bigk,
)
from conflux_tpu.ops.tri import schur_dot

_PREC = jax.lax.Precision.HIGHEST


def check_schur(m, ncols, k, c0, mode):
    key = jax.random.key(0)
    R = jax.random.normal(key, (m, ncols), jnp.float32)
    A = jax.random.normal(jax.random.fold_in(key, 1), (m, k), jnp.float32)
    B = jax.random.normal(jax.random.fold_in(key, 2), (k, ncols - c0),
                          jnp.float32) / np.sqrt(k)

    @jax.jit
    def kern(R, A, B):
        return schur_update_pallas(R, A, B, c0, mode)

    @jax.jit
    def ref(R, A, B):
        exact = R.at[:, c0:].add(
            -jnp.dot(A, B, precision=_PREC))
        approx = R.at[:, c0:].add(-schur_dot(A, B, mode))
        return exact, approx

    out = np.asarray(kern(R, A, B))
    exact, approx = (np.asarray(x) for x in ref(R, A, B))
    scale = np.abs(exact).max()
    err_k = np.abs(out - exact).max() / scale
    err_x = np.abs(approx - exact).max() / scale  # schur_dot same mode
    pfx_ok = np.array_equal(out[:, :c0], np.asarray(R)[:, :c0])
    print(f"schur m={m} ncols={ncols} k={k} c0={c0} {mode:6s}: "
          f"kernel relerr {err_k:.3e}  xla-{mode} relerr {err_x:.3e}  "
          f"prefix-untouched {pfx_ok}", flush=True)


def check_bigk(m, n, k, mode):
    key = jax.random.key(3)
    R = jax.random.normal(key, (m, n), jnp.float32)
    A = jax.random.normal(jax.random.fold_in(key, 1), (m, k), jnp.float32)
    B = jax.random.normal(jax.random.fold_in(key, 2), (k, n),
                          jnp.float32) / np.sqrt(k)

    @jax.jit
    def kern(R, A, B):
        return sub_matmul_pallas_bigk(R, A, B, mode)

    @jax.jit
    def ref(R, A, B):
        exact = R - jnp.dot(A, B, precision=_PREC)
        approx = R - schur_dot(A, B, mode)
        return exact, approx

    out = np.asarray(kern(R, A, B))
    exact, approx = (np.asarray(x) for x in ref(R, A, B))
    scale = np.abs(exact).max()
    err_k = np.abs(out - exact).max() / scale
    err_x = np.abs(approx - exact).max() / scale
    print(f"bigk  m={m} n={n} k={k} {mode:6s}: "
          f"kernel relerr {err_k:.3e}  xla-{mode} relerr {err_x:.3e}",
          flush=True)


def main():
    for mode in ("high", "bf16"):
        check_schur(2048, 4096, 1024, 1024, mode)
        check_schur(2048, 4096, 1024, 0, mode)
        check_schur(2048, 4096, 512, 512, mode)
    for mode in ("high", "bf16"):
        check_bigk(2048, 1024, 4096, mode)
    print("done", flush=True)


if __name__ == "__main__":
    main()
