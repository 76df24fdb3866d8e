"""Single-device COMPLEX (c64) LU with partial pivoting.

The c64 instantiation of the factorization stack — capability parity with
the reference's complex template instantiations (blas.cpp:15-122,
layout.cpp:138-192 instantiate the shim and layout for std::complex).
Structure is the crout (left-looking) scheme of lu/single._getrf_crout:
each panel updated ONCE by a big-K complex GEMM (cschur_dot -> real f32
MXU GEMMs), each step's winners get their full U row at selection time,
live rows compact per step. Pivot scoring is LAPACK cgetrf's
cabs1 = |re| + |im| (ops/cplx.py).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from conflux_tpu.ops.cplx import (
    cpanel_factor,
    cschur_dot,
    ctrsm_left_lower_unit,
)


def _unit_lower_c(lu: jnp.ndarray) -> jnp.ndarray:
    n = lu.shape[0]
    return jnp.tril(lu, -1) + jnp.eye(n, dtype=lu.dtype)


@partial(jax.jit, static_argnames=("v", "method"))
def clu_factor(
    A: jnp.ndarray, v: int = 128, method: str = "4m"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Complex LU with partial pivoting: (F, perm) with
    A[perm] = unit_lower(F) @ triu(F) — the same contract as lu_factor.
    `method` selects the complex-GEMM decomposition ('4m' or the
    cgemm3m-style '3m', ops/cplx.cschur_dot)."""
    from conflux_tpu.errors import ConfluxError, ErrorCode

    m, n = A.shape
    if m < n:
        raise ConfluxError(ErrorCode.INVALID_SHAPE,
                           "clu_factor expects m >= n")
    if not jnp.issubdtype(A.dtype, jnp.complexfloating):
        raise ConfluxError(ErrorCode.INVALID_TYPE,
                           f"complex input expected, got {A.dtype}")
    dot = partial(cschur_dot, method=method)
    R = A
    origin = jnp.arange(m, dtype=jnp.int32)
    F = jnp.zeros((m, n), A.dtype)
    perm = jnp.zeros(m, jnp.int32)
    for k in range(0, n, v):
        w = min(v, n - k)
        m_r = R.shape[0]
        panel = jax.lax.slice(R, (0, k), (m_r, k + w))
        if k > 0:
            Utop = jax.lax.slice(F, (0, k), (k, k + w))
            Lleft = jax.lax.slice(R, (0, 0), (m_r, k))
            panel = panel - dot(Lleft, Utop)
        piv, _, M = cpanel_factor(panel, jnp.ones(m_r, bool), w)
        lu_top = M[piv]
        R = jax.lax.dynamic_update_slice(R, M, (0, k))
        Rpiv = R[piv]
        if k > 0:
            F = jax.lax.dynamic_update_slice(F, Rpiv[:, :k], (k, 0))
        F = jax.lax.dynamic_update_slice(F, lu_top, (k, k))
        if k + w < n:
            rhs = Rpiv[:, k + w :]
            if k > 0:
                Ut = jax.lax.slice(F, (0, k + w), (k, n))
                rhs = rhs - dot(Rpiv[:, :k], Ut)
            U12 = ctrsm_left_lower_unit(_unit_lower_c(lu_top), rhs)
            F = jax.lax.dynamic_update_slice(F, U12, (k, k + w))
        perm = jax.lax.dynamic_update_slice(perm, origin[piv], (k,))
        if m_r > w:
            rows = jnp.arange(m_r, dtype=jnp.int32)
            mask = jnp.ones(m_r, bool).at[piv].set(False)
            live_idx = jnp.sort(jnp.where(mask, rows, m_r))[: m_r - w]
            R = R[live_idx]
            origin = origin[live_idx]
    if m > n:
        F = jax.lax.dynamic_update_slice(F, R, (n, 0))
        perm = jax.lax.dynamic_update_slice(perm, origin, (n,))
    return F, perm


def clu_residual(A, F, perm) -> float:
    """||PA - LU||_F / (N ||A||_F) in complex128 on host."""
    import numpy as np

    A = np.asarray(A, np.complex128)
    F = np.asarray(F, np.complex128)
    perm = np.asarray(perm)
    m, n = F.shape
    L = np.tril(F, -1) + np.eye(m, n)
    U = np.triu(F[:n])
    R = A[perm] - L @ U
    return float(np.linalg.norm(R) / (n * np.linalg.norm(A)))
