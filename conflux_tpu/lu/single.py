"""Single-device LU with partial pivoting, MXU-first.

The single-device analog of the reference's Python executable spec
(python/reference_lu.py `LUP`/`LUPv2`) — but instead of a step loop with
masked full-width updates, we use *recursive* panel splitting: every TRSM and
Schur-complement GEMM runs at exactly its true size, so the factorization does
precisely 2N^3/3 FLOPs in large, static-shape `dot_general` calls that XLA
tiles straight onto the MXU.  Pivoting happens only in the v-wide base case
(masked-argmax elimination, ops/panel.py) and is realized as an explicit row
permutation (a gather), never a data-dependent shape.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from conflux_tpu.ops.panel import select_pivots
from conflux_tpu.ops.tri import (
    schur_dot,
    trsm_left_lower_unit,
    trsm_right_upper,
    unit_lower,
    upper,
)

_PREC = jax.lax.Precision.HIGHEST


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
    """Recursive right-looking LU of a tall [m, n] block (m >= n).

    `precision` selects the Schur-complement GEMM mode (ops/tri.schur_dot);
    panel selection and TRSMs always stay f32 — the reference's
    bf16-trailing / f32-panel split (BASELINE config 5)."""
    m, n = A.shape
    if n <= v:
        return _getrf_base(A, n)
    # balanced halves: biggest GEMMs, log-depth recursion (verified stable
    # at all precision modes once TRSMs use blocked substitution)
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


@partial(jax.jit, static_argnames=("v", "precision"))
def lu_factor(
    A: jnp.ndarray, v: int = 128, precision: str = "highest"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LU with partial pivoting: returns (F, perm) with
    A[perm] = unit_lower(F) @ upper(F).  `perm` maps factor row -> original
    row (the reference's `pivotIndsBuff`, conflux_opt.hpp:497-503).
    precision: 'highest' (f32), 'high' (bf16x3), 'bf16' (bf16 trailing
    GEMMs with f32 accumulation; panels stay f32)."""
    from conflux_tpu.errors import ConfluxError, ErrorCode

    m, n = A.shape
    if m < n:
        raise ConfluxError(ErrorCode.INVALID_SHAPE, "lu_factor expects m >= n")
    return _getrf_rec(A, v, precision)


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
