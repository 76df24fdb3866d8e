"""Single-device Cholesky, MXU-first.

Analog of the reference's per-rank Cholesky step kernels (`choleskyA00` /
`updateA10` / `computeA11`, src/conflux/cholesky/Cholesky.cpp:188-378) fused
into one device: recursive splitting so every TRSM and SYRK runs at its true
size — exactly N^3/3 FLOPs in large static-shape matmuls.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from conflux_tpu.ops.tri import potrf_tile, schur_dot, trsm_right_lower_t

_PREC = jax.lax.Precision.HIGHEST


def _potrf_rec(A: jnp.ndarray, v: int, precision: str = "highest") -> jnp.ndarray:
    n = A.shape[0]
    if n <= v:
        return potrf_tile(A)
    n1 = max(v, (n // 2 // v) * v)
    L11 = _potrf_rec(A[:n1, :n1], v, precision)
    L21 = trsm_right_lower_t(A[n1:, :n1], L11)
    S = A[n1:, n1:] - schur_dot(L21, L21.T, precision)
    L22 = _potrf_rec(S, v, precision)
    top = jnp.concatenate([L11, jnp.zeros((n1, n - n1), A.dtype)], axis=1)
    bot = jnp.concatenate([L21, L22], axis=1)
    return jnp.concatenate([top, bot], axis=0)


@partial(jax.jit, static_argnames=("v", "precision"))
def cholesky(A: jnp.ndarray, v: int = 128, precision: str = "highest") -> jnp.ndarray:
    """Lower Cholesky factor of an SPD matrix (blocked, recursive)."""
    return _potrf_rec(A, v, precision)


def cholesky_residual(A, L) -> jnp.ndarray:
    """||A - L L^T||_F / (N ||A||_F) — the gate matching the reference's
    file-based compare (examples/cholesky_helper.cpp --compare)."""
    n = L.shape[0]
    R = jnp.asarray(A) - jnp.dot(L, L.T, precision=_PREC)
    return jnp.linalg.norm(R) / (n * jnp.linalg.norm(jnp.asarray(A)))
