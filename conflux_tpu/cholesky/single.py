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


def _potrf_flat(A: jnp.ndarray, v: int, precision: str = "highest") -> jnp.ndarray:
    """LEFT-looking blocked Cholesky, in place: each column panel is updated
    by one [m_k, k] x [k, w] GEMM against all previous panels, then factored
    (v x v potrf + TRSM). Exactly N^3/3 GEMM FLOPs — a right-looking
    full-square trailing SYRK would do 2x (XLA has no triangular-update
    primitive), and the recursive scheme adds ~N^3/6 FLOPs of large
    TriangularSolves plus O(N^2 log N) concatenate traffic.

    bf16 STORAGE mode (A arrives as bfloat16, same recipe as the LU flat
    kernel, lu/single.py): the buffer and the factor stay bf16 while the
    panel potrf and TRSM run in f32; the left-looking update GEMM reads
    bf16 operands with f32 accumulation, so each stored entry is rounded
    once. Halves HBM: N=65536 (8.6 GB factor) fits a single chip. No
    pivot-cancellation hazard exists here (Cholesky is unpivoted and SPD),
    so the residual plateaus at bf16 representation error only."""
    n = A.shape[0]
    bf16s = A.dtype == jnp.bfloat16
    f32 = jnp.float64 if A.dtype == jnp.float64 else jnp.float32
    F = A
    for k in range(0, n, v):
        w = min(v, n - k)
        col = F[k:, k : k + w]
        if bf16s:
            col = col.astype(f32)
        if k > 0:
            mode = "bf16" if bf16s else precision
            # dot_general won the bigk e2e A/B (lu/single._getrf_crout)
            col = col - schur_dot(F[k:, :k], F[k : k + w, :k].T, mode)
        L11 = potrf_tile(col[:w])
        F = F.at[k : k + w, k : k + w].set(L11.astype(F.dtype))
        if k + w < n:
            L21 = trsm_right_lower_t(col[w:], L11, method="invert")
            F = F.at[k + w :, k : k + w].set(L21.astype(F.dtype))
    return jnp.tril(F)


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


@partial(jax.jit, static_argnames=("v", "precision", "scheme"))
def cholesky(A: jnp.ndarray, v: int = 128, precision: str = "highest",
             scheme: str = "flat") -> jnp.ndarray:
    """Lower Cholesky factor of an SPD matrix.

    scheme: 'flat' (left-looking in-place — the fast path, exact N^3/3
    FLOPs) or 'recursive' (kept for A/B benchmarking). A bfloat16 input
    selects the halved-HBM STORAGE mode (flat scheme only; f32 panel
    potrf/TRSM, bf16 buffer — see _potrf_flat)."""
    if A.dtype == jnp.bfloat16:
        scheme = "flat"
    if scheme == "recursive":
        return _potrf_rec(A, v, precision)
    return _potrf_flat(A, v, precision)


def cholesky_residual(A, L) -> jnp.ndarray:
    """||A - L L^T||_F / (N ||A||_F) — the gate matching the reference's
    file-based compare (examples/cholesky_helper.cpp --compare)."""
    n = L.shape[0]
    R = jnp.asarray(A) - jnp.dot(L, L.T, precision=_PREC)
    return jnp.linalg.norm(R) / (n * jnp.linalg.norm(jnp.asarray(A)))
