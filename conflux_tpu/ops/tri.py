"""Triangular kernels: TRSM variants, triangular inversion, tile Cholesky.

The reference calls `cblas_dtrsm` (src/conflux/lu/conflux_opt.hpp:1347,1539;
src/conflux/cholesky/Cholesky.cpp:450) and `LAPACKE_dpotrf`
(Cholesky.cpp:188-194).  On TPU the panel TRSMs are the second-hottest op after
the trailing GEMM, so alongside the substitution-based
`jax.scipy.linalg.solve_triangular` we provide an *inverse-multiply* path: the
v x v triangle is inverted once (recursive block inversion, all matmuls) and
the panel solve becomes a single MXU GEMM — the standard HPL-on-accelerator
formulation.  `trsm_method` selects per call; benchmarks pick the winner.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

_PREC = jax.lax.Precision.HIGHEST


def unit_lower(lu: jnp.ndarray) -> jnp.ndarray:
    """Extract the unit lower-triangular factor from merged L\\U."""
    n = lu.shape[0]
    return jnp.tril(lu[:, :n], -1) + jnp.eye(n, dtype=lu.dtype)


def upper(lu: jnp.ndarray) -> jnp.ndarray:
    """Extract the upper-triangular factor from merged L\\U (square part)."""
    return jnp.triu(lu[:, : lu.shape[0]])


def _inv_unit_lower_small(L: jnp.ndarray) -> jnp.ndarray:
    """Unit-lower inverse by nilpotent squaring: with M = I - L strictly
    lower, (I - M)^{-1} = (I+M)(I+M^2)(I+M^4)... — ceil(log2 n) matmuls, no
    TriangularSolve (which lowers to a slow substitution sweep on TPU)."""
    n = L.shape[0]
    eye = jnp.eye(n, dtype=L.dtype)
    M = eye - L
    acc = eye + M
    span = 2
    while span < n:
        M = jnp.dot(M, M, precision=_PREC)
        acc = acc + jnp.dot(acc, M, precision=_PREC)
        span *= 2
    return acc


def _inv_lower_rec(L: jnp.ndarray, unit: bool, base: int = 128) -> jnp.ndarray:
    """inv([[A,0],[B,C]]) = [[iA,0],[-iC @ B @ iA, iC]] — log-depth recursion,
    all the work in matmuls (MXU) instead of substitution sweeps."""
    n = L.shape[0]
    if n <= base:
        if unit:
            return _inv_unit_lower_small(L)
        d = jnp.diagonal(L)
        d = jnp.where(d == 0, jnp.ones((), L.dtype), d)
        # L = D Lu  =>  inv(L) = inv(Lu) D^{-1}
        return _inv_unit_lower_small(L / d[:, None]) / d[None, :]
    n1 = n // 2
    iA = _inv_lower_rec(L[:n1, :n1], unit, base)
    iC = _inv_lower_rec(L[n1:, n1:], unit, base)
    B = L[n1:, :n1]
    low = -jnp.dot(iC, jnp.dot(B, iA, precision=_PREC), precision=_PREC)
    top = jnp.concatenate([iA, jnp.zeros((n1, n - n1), L.dtype)], axis=1)
    bot = jnp.concatenate([low, iC], axis=1)
    return jnp.concatenate([top, bot], axis=0)


@jax.jit
def inv_lower(L: jnp.ndarray) -> jnp.ndarray:
    return _inv_lower_rec(L, unit=False)


@jax.jit
def inv_unit_lower(L: jnp.ndarray) -> jnp.ndarray:
    return _inv_lower_rec(L, unit=True)


@jax.jit
def inv_upper(U: jnp.ndarray) -> jnp.ndarray:
    return _inv_lower_rec(U.T, unit=False).T


@partial(jax.jit, static_argnames=("method",))
def trsm_left_lower_unit(L: jnp.ndarray, B: jnp.ndarray, method: str = "solve"):
    """X = L^{-1} B with L unit lower (the A01 update,
    conflux_opt.hpp:1539)."""
    if method == "invert":
        return jnp.dot(inv_unit_lower(L), B, precision=_PREC)
    return jsl.solve_triangular(L, B, lower=True, unit_diagonal=True)


@partial(jax.jit, static_argnames=("method",))
def trsm_right_upper(B: jnp.ndarray, U: jnp.ndarray, method: str = "solve"):
    """X = B U^{-1} with U upper (the A10 update, conflux_opt.hpp:1347)."""
    if method == "invert":
        return jnp.dot(B, inv_upper(U), precision=_PREC)
    return jsl.solve_triangular(U.T, B.T, lower=True).T


@partial(jax.jit, static_argnames=("method",))
def trsm_right_lower_t(B: jnp.ndarray, L: jnp.ndarray, method: str = "solve"):
    """X = B L^{-T} with L lower (the Cholesky A10 update,
    Cholesky.cpp:450)."""
    if method == "invert":
        return jnp.dot(B, inv_lower(L).T, precision=_PREC)
    return jsl.solve_triangular(L, B.T, lower=True).T


@jax.jit
def potrf_tile(A: jnp.ndarray) -> jnp.ndarray:
    """Blocked lower Cholesky of a v x v tile.

    Our own replacement for `LAPACKE_dpotrf` (Cholesky.cpp:188-194).
    Recursive splitting keeps the sequential unblocked loop at <=64 columns
    (per-iteration launch latency dominates larger loops on TPU); the rest is
    TRSM + SYRK matmuls."""
    n = A.shape[0]
    if n > 64:
        n1 = max(64, (n // 2 // 64) * 64)
        L11 = potrf_tile(A[:n1, :n1])
        L21 = trsm_right_lower_t(A[n1:, :n1], L11, method="invert")
        S = A[n1:, n1:] - jnp.dot(L21, L21.T, precision=_PREC)
        L22 = potrf_tile(S)
        top = jnp.concatenate([L11, jnp.zeros((n1, n - n1), A.dtype)], axis=1)
        return jnp.concatenate([top, jnp.concatenate([L21, L22], axis=1)], axis=0)
    idx = jnp.arange(n)

    def body(j, L):
        col = jax.lax.dynamic_slice(L, (0, j), (n, 1))[:, 0]
        djj = jnp.sqrt(jnp.maximum(col[j], jnp.zeros((), L.dtype)))
        safe = jnp.where(djj == 0, jnp.ones((), L.dtype), djj)
        newcol = jnp.where(idx > j, col / safe, jnp.where(idx == j, djj, col))
        L = jax.lax.dynamic_update_slice(L, newcol[:, None], (0, j))
        # trailing rank-1 update of columns > j
        l = jnp.where(idx > j, newcol, 0)
        L = L - jnp.where(
            (idx[:, None] > j) & (idx[None, :] > j), jnp.outer(l, l), 0
        )
        return L

    L = jax.lax.fori_loop(0, n, body, A)
    return jnp.tril(L)
