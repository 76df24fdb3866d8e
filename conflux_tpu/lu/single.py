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

def _getrf_flat(
    A: jnp.ndarray, v: int, precision: str = "highest"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Blocked right-looking LU that EMITS FINISHED ROW BANDS: the working
    set S stays full width [m_k, n]; at step k the w pivot rows leave S as a
    completed factor band [dead L prefix | merged lu_top | U12] and the
    continuing rows are re-gathered (relative order kept) with the panel
    multipliers written in and the trailing GEMM applied. F is one
    concatenation of the bands at the end.

    The data-movement vocabulary is chosen from measured v5e costs
    (experiments/prof_gather.py): full-width ROW GATHERS and 1-D index
    scatters are fast; 2-D row scatters and especially mixed
    advanced-index+slice expressions (X[rows, w:]) lower to SERIAL while
    loops (one row per iteration) and are avoided entirely. The window
    bookkeeping (`origin`) replaces the reference's physical row compaction
    (push_pivots_up / first_non_pivot_row, conflux_opt.hpp:176-218)."""
    m, n = A.shape
    S = A                                      # [m_k, n], rows shrink
    origin = jnp.arange(m, dtype=jnp.int32)    # original A-row per S row
    # bands are written straight into the output with dynamic-update-slice
    # (fast + aliased in place) — a final concat of all bands costs an extra
    # full-matrix buffer, the difference between fitting N=32768 in HBM or
    # not
    F = jnp.zeros((m, n), A.dtype)
    perm_parts = []
    for k in range(0, n, v):
        w = min(v, n - k)
        m_k = S.shape[0]
        piv, _, M = factor_panel(S[:, k : k + w], jnp.ones(m_k, bool), w)
        Spiv = S[piv]                          # [w, n] row gather (fast)
        lu_top = M[piv]
        # emit the finished band as three direct writes (a concatenated
        # [w, n] temp was the 46 MB that kept N=32768 out of HBM)
        if k > 0:
            F = jax.lax.dynamic_update_slice(
                F, jax.lax.slice(Spiv, (0, 0), (w, k)), (k, 0)
            )
        F = jax.lax.dynamic_update_slice(F, lu_top, (k, k))
        if k + w < n:
            L11 = unit_lower(lu_top[:, :w])
            U12 = trsm_left_lower_unit(L11, Spiv[:, k + w :],
                                       method="invert")
            F = jax.lax.dynamic_update_slice(F, U12, (k, k + w))
        perm_parts.append(origin[piv])
        if m_k > w:
            # continuing rows: everything except the pivots, order kept
            mask = jnp.ones(m_k, bool).at[piv].set(False)
            rows_next = jnp.sort(jnp.where(mask, jnp.arange(m_k), m_k))[
                : m_k - w
            ]
            # update IN PLACE first (multiplier write + trailing add are
            # aliasing-friendly column-slice ops), THEN one plain full-width
            # row gather. Gathering first forced three ~S-sized temps (the
            # gather result, an XLA layout copy of it, and a scatter-add
            # copy) — the difference between N=32768 compiling or OOMing.
            # The w pivot rows ride along in the update (w*Nl wasted FLOPs,
            # negligible) and are dropped by the gather.
            S = jax.lax.dynamic_update_slice(S, M, (0, k))
            if k + w < n:
                S = S.at[:, k + w :].add(-schur_dot(M, U12, precision))
            S = S[rows_next]                   # full-width row gather (fast)
            origin = origin[rows_next]
    if m > n:
        # tail rows: completed L rows, order kept
        F = jax.lax.dynamic_update_slice(F, S, (n, 0))
        perm_parts.append(origin)
    perm = jnp.concatenate(perm_parts)
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
    scheme: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LU with partial pivoting: returns (F, perm) with
    A[perm] = unit_lower(F) @ upper(F).  `perm` maps factor row -> original
    row (the reference's `pivotIndsBuff`, conflux_opt.hpp:497-503).
    precision: 'highest' (f32), 'high' (bf16x3), 'bf16' (bf16 trailing
    GEMMs with f32 accumulation; panels stay f32).
    scheme: 'auto' picks by measured dispatch (v5e, experiments/prof_*):
    'recursive' is ~15% faster up to N=16384 but its ~N^2 assembly
    temporaries OOM at N=32768; 'flat' (band-emitting, minimal working set)
    is the only scheme that fits N=32768 in 16 GB HBM."""
    from conflux_tpu.errors import ConfluxError, ErrorCode

    m, n = A.shape
    if m < n:
        raise ConfluxError(ErrorCode.INVALID_SHAPE, "lu_factor expects m >= n")
    if scheme == "auto":
        scheme = "recursive" if m <= 16384 else "flat"
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
