"""Correctness gates — the TPU-native replacement of the reference's
ScaLAPACK/BLACS validation harness (examples/conflux_miniapp.cpp:169-507).

The reference redistributes factors to a BLACS grid via COSTA and computes
||PA - LU||_F with two pdgemm_ calls; here the reconstruction is a plain
distributed matmul (XLA partitions it from the shardings) and the norms are
psum reductions — no external library.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from conflux_tpu.layout import BlockCyclic, undistribute

_PREC = jax.lax.Precision.HIGHEST


def lu_residual_dense(A, F, perm) -> float:
    """||PA - LU||_F / (N ||A||_F) on host arrays (miniapp gate,
    conflux_miniapp.cpp:480-499)."""
    A = np.asarray(A, np.float64)
    F = np.asarray(F, np.float64)
    perm = np.asarray(perm)
    m, n = F.shape
    L = np.tril(F, -1) + np.eye(m, n)
    U = np.triu(F[:n])
    R = A[perm] - L @ U
    return float(np.linalg.norm(R) / (n * np.linalg.norm(A)))


def cholesky_residual_dense(A, L) -> float:
    A = np.asarray(A, np.float64)
    L = np.asarray(L, np.float64)
    n = A.shape[0]
    return float(np.linalg.norm(A - L @ L.T) / (n * np.linalg.norm(A)))


def lu_residual_dist(G, F, perm, desc: BlockCyclic) -> float:
    """Distributed-input residual: reconstructs on host for now (the
    all-device-side SUMMA variant lands with the benchmark harness)."""
    A = undistribute(G, desc)
    Fh = undistribute(F, desc)
    return lu_residual_dense(A, Fh, perm)


def cholesky_residual_dist(G, Lg, desc: BlockCyclic) -> float:
    A = undistribute(G, desc)
    Lh = undistribute(Lg, desc)
    return cholesky_residual_dense(A, Lh)


def growth_factor(A, F) -> float:
    """Pivot growth ||U||_max / ||A||_max — the CALU stability diagnostic."""
    A = np.asarray(A)
    U = np.triu(np.asarray(F))
    return float(np.abs(U).max() / max(np.abs(A).max(), 1e-30))
