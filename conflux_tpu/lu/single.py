"""Single-device LU with partial pivoting, MXU-first.

The single-device analog of the reference's Python executable spec
(python/reference_lu.py `LUP`/`LUPv2`) and its per-rank hot loop
(LAPACKE_dgetrf panel + cblas_dtrsm + cblas_dgemm,
src/conflux/lu/conflux_opt.hpp:727,1347,1626-1634).

Two schemes:

  * "flat" (default): unrolled right-looking blocked LU operating IN PLACE
    on one [m, n] buffer with LAPACK-style minimal row interchanges — per
    step only the 2v affected rows move (pivot rows to the top of the
    window, displaced rows into the vacated slots), every TRSM is against a
    v x v triangle, and every trailing GEMM runs at exactly its true size.
    Measured on v5e: the v x v TRSMs and the absence of factor-assembly
    copies are worth >1.5x over the recursive scheme at N=16384.
  * "recursive": balanced panel splitting. Its big TRSMs (~N^3/6 FLOPs
    through solve_triangular at half-size triangles) and per-level
    concatenate assembly (O(N^2 log N) copies) dominate beyond N~8192, and
    the ~N^2-sized temporaries OOM at N=32768; kept for A/B benchmarking.

Pivoting happens only in the v-wide panel (masked-argmax elimination,
ops/panel.py, fused Pallas kernel on TPU) and never creates a
data-dependent shape.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from conflux_tpu.ops.panel import factor_panel, select_pivots
from conflux_tpu.ops.tri import (
    schur_dot,
    trsm_left_lower_unit,
    trsm_right_upper,
    unit_lower,
    upper,
)

_PREC = jax.lax.Precision.HIGHEST


# ----------------------------------------------------------------------------
# Flat in-place scheme
# ----------------------------------------------------------------------------

def _swap_rows(F, perm, k: int, w: int, piv):
    """Apply the minimal row interchange for step k: pivot rows (window
    indices `piv`, distinct) move to window slots 0..w-1 in pivot order, the
    displaced non-pivot top rows move into the slots the pivots vacated
    (ascending to ascending). Only <= 2w full rows are touched — the analog
    of LAPACK laswp / the reference's push_pivots_up row compaction
    (conflux_opt.hpp:176-218) without any data-dependent shapes."""
    m_k = F.shape[0] - k
    # indices >= w are out of bounds and dropped, so only true in-window
    # pivots mark their slot (a clip here would smear writes onto slot w-1)
    inpiv = jnp.zeros(w, bool).at[piv].set(True, mode="drop")
    # displaced top rows and vacated slots, both ascending, padded with m_k
    disp = jnp.sort(jnp.where(~inpiv, jnp.arange(w), m_k))
    holes = jnp.sort(jnp.where(piv >= w, piv, m_k))
    rows_top = F[k + piv]                                   # [w, N] gather
    rows_disp = F[k + jnp.clip(disp, 0, m_k - 1)]           # [w, N] gather
    F = F.at[k + holes].set(rows_disp, mode="drop")
    F = F.at[k : k + w].set(rows_top)
    p_top = perm[k + piv]
    p_disp = perm[k + jnp.clip(disp, 0, m_k - 1)]
    perm = perm.at[k + holes].set(p_disp, mode="drop")
    perm = perm.at[k : k + w].set(p_top)
    return F, perm


def _getrf_flat(
    A: jnp.ndarray, v: int, precision: str = "highest"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    m, n = A.shape
    F = A
    perm = jnp.arange(m, dtype=jnp.int32)
    for k in range(0, n, v):
        w = min(v, n - k)
        panel = F[k:, k : k + w]                            # [m_k, w]
        piv, _, M = factor_panel(panel, jnp.ones(m - k, bool), w)
        F, perm = _swap_rows(F, perm, k, w, piv)
        # panel columns: merged L\U on top, multipliers below — M rows move
        # under the same interchange
        m_k = m - k
        inpiv = jnp.zeros(w, bool).at[piv].set(True, mode="drop")
        disp = jnp.sort(jnp.where(~inpiv, jnp.arange(w), m_k))
        holes = jnp.sort(jnp.where(piv >= w, piv, m_k))
        Mw = M.at[holes].set(M[jnp.clip(disp, 0, m_k - 1)], mode="drop")
        Mw = Mw.at[:w].set(M[piv])
        F = F.at[k:, k : k + w].set(Mw)
        if k + w < n:
            L11 = unit_lower(Mw[:w, :w])
            U12 = trsm_left_lower_unit(L11, F[k : k + w, k + w :],
                                       method="invert")
            F = F.at[k : k + w, k + w :].set(U12)
            F = F.at[k + w :, k + w :].add(
                -schur_dot(F[k + w :, k : k + w], U12, precision)
            )
    return F, perm


# ----------------------------------------------------------------------------
# Recursive scheme (kept for A/B benchmarking; see module docstring)
# ----------------------------------------------------------------------------

def _getrf_base(A: jnp.ndarray, n: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Base case: [m, n] tall panel, n <= v. Returns (F, perm) with
    A[perm] = unit_lower(F) @ upper(F) and the n pivot rows moved to the top
    in pivot order."""
    m = A.shape[0]
    piv, _, lu_top = select_pivots(A, jnp.ones(m, bool), n)
    # permutation: pivot rows first (in pivot order), others keep their order
    rank = jnp.full(m, n, jnp.int32).at[piv].set(jnp.arange(n, dtype=jnp.int32))
    key = jnp.where(rank < n, rank, n + jnp.arange(m, dtype=jnp.int32))
    perm = jnp.argsort(key).astype(jnp.int32)
    Ap = A[perm]
    U = upper(lu_top)
    # multipliers of the non-pivot rows: X U = Ap[n:]  =>  X = Ap[n:] U^{-1}.
    # Exactly-zero pivots (structurally singular input) are replaced by 1 for
    # the solve so the factor stays finite, matching LAPACK getrf's
    # skip-scaling-on-zero-pivot behaviour instead of emitting NaN.
    dU = jnp.diagonal(U)
    Usafe = U + jnp.diag(jnp.where(dU == 0, 1, 0).astype(U.dtype))
    Lbot = trsm_right_upper(Ap[n:], Usafe)
    F = jnp.concatenate([lu_top, Lbot], axis=0)
    return F, perm


def _getrf_rec(
    A: jnp.ndarray, v: int, precision: str = "highest"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Recursive right-looking LU of a tall [m, n] block (m >= n)."""
    m, n = A.shape
    if n <= v:
        return _getrf_base(A, n)
    n1 = max(v, (n // 2 // v) * v)
    F1, p1 = _getrf_rec(A[:, :n1], v, precision)
    A2 = A[p1][:, n1:]
    L11 = unit_lower(F1[:n1, :n1])
    U12 = trsm_left_lower_unit(L11, A2[:n1])
    S = A2[n1:] - schur_dot(F1[n1:, :n1], U12, precision)
    F2, p2 = _getrf_rec(S, v, precision)
    L21 = F1[n1:, :n1][p2]
    top = jnp.concatenate([F1[:n1], U12], axis=1)
    bot = jnp.concatenate([L21, F2], axis=1)
    F = jnp.concatenate([top, bot], axis=0)
    perm = p1[jnp.concatenate([jnp.arange(n1, dtype=p2.dtype), n1 + p2])]
    return F, perm


@partial(jax.jit, static_argnames=("v", "precision", "scheme"))
def lu_factor(
    A: jnp.ndarray, v: int = 128, precision: str = "highest",
    scheme: str = "flat",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LU with partial pivoting: returns (F, perm) with
    A[perm] = unit_lower(F) @ upper(F).  `perm` maps factor row -> original
    row (the reference's `pivotIndsBuff`, conflux_opt.hpp:497-503).
    precision: 'highest' (f32), 'high' (bf16x3), 'bf16' (bf16 trailing
    GEMMs with f32 accumulation; panels stay f32).
    scheme: 'flat' (in-place, minimal row swaps — the fast path) or
    'recursive' (kept for A/B benchmarks; OOMs beyond N~16384)."""
    from conflux_tpu.errors import ConfluxError, ErrorCode

    m, n = A.shape
    if m < n:
        raise ConfluxError(ErrorCode.INVALID_SHAPE, "lu_factor expects m >= n")
    if scheme == "recursive":
        return _getrf_rec(A, v, precision)
    return _getrf_flat(A, v, precision)


def _split_factors(F: jnp.ndarray):
    """Merged [m, n] trapezoid -> (L [m, n] unit-lower, U [n, n] upper)."""
    m, n = F.shape
    L = jnp.tril(F, -1) + jnp.eye(m, n, dtype=F.dtype)
    U = jnp.triu(F[:n])
    return L, U


@partial(jax.jit, static_argnames=("v",))
def lu(A: jnp.ndarray, v: int = 128):
    """Convenience wrapper returning (L, U, perm)."""
    F, perm = lu_factor(A, v)
    L, U = _split_factors(F)
    return L, U, perm


def lu_residual(A, F, perm) -> jnp.ndarray:
    """The reference's correctness gate: ||PA - LU||_F / (N ||A||_F)
    (examples/conflux_miniapp.cpp:480-499)."""
    n = F.shape[1]
    L, U = _split_factors(F)
    PA = jnp.asarray(A)[perm]
    R = PA - jnp.dot(L, U, precision=_PREC)
    return jnp.linalg.norm(R) / (n * jnp.linalg.norm(jnp.asarray(A)))
