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

from conflux_tpu.layout import BlockCyclic

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
    """Distributed-input residual, computed entirely device-side (SUMMA
    plane, pgemm.plu_residual_25d) — only the final scalar reaches the host.
    The earlier host-gather implementation is gone: it silently moved
    O(N^2) over the device link and duplicated the SUMMA entry point."""
    from conflux_tpu.pgemm import plu_residual_25d

    return float(plu_residual_25d(G, F, perm, desc))


def cholesky_residual_dist(G, Lg, desc: BlockCyclic) -> float:
    """Distributed ||A - L L^T||_F / (N ||A||_F), device-side (SUMMA)."""
    from conflux_tpu.pgemm import pchol_residual_25d

    return float(pchol_residual_25d(G, Lg, desc))


def lu_residual_blocked(A, F, perm, block: int = 4096) -> float:
    """FULL ||PA - LU||_F / (N ||A||_F) for factors too large to validate
    with a dense host reconstruction: U = triu(F[:n]) is masked in place
    on the DEVICE (donated, so the upload is the only full-size copy), and
    A / L stream through in `block`-row slices — the device never holds
    more than U plus two row blocks, and the host never forms an N x N
    f64 temporary. Reconstruction runs in f32 with HIGHEST-precision
    accumulation: its noise contribution at N=65536 is ~1e-10 normalized,
    far below the 1e-6 gate it guards (same gate as lu_residual_dense /
    conflux_miniapp.cpp:480-499).

    A, F: host or device arrays (f32 or the bf16 STORAGE factor); perm the
    factor-order pivot vector from lu_factor / lu_factor_stepped."""
    A = np.asarray(A)
    F = np.asarray(F)
    perm = np.asarray(perm)
    m, n = F.shape

    U = jax.jit(jnp.triu, donate_argnums=0)(jnp.asarray(F[:n]))

    bf16 = U.dtype == jnp.bfloat16

    @jax.jit
    def block_sq(U, Lb, Arows, r0):
        # U MUST be an argument, not a closure: a jit closing over the
        # 8.6 GB device factor captures it as a lowering CONSTANT
        # (observed: "8.59GB of constants" warning + the whole factor
        # shipped through the remote compile helper at N=65536).
        # unit-lower mask of the factor rows r0..r0+b: col < r strict-lower
        # entries kept, unit diagonal, zeros above
        r = r0 + jnp.arange(Lb.shape[0])[:, None]
        c = jnp.arange(n)[None, :]
        Lmask = jnp.where(c < r, Lb, 0).astype(U.dtype) + (
            (c == r) & (r < n)
        ).astype(U.dtype)
        # bf16 factor: keep BOTH operands bf16 (the stored values carry no
        # more precision; an f32 upcast of U would double its footprint to
        # 17 GB at N=65536) with f32 MXU accumulation
        if bf16:
            recon = jnp.dot(Lmask, U, preferred_element_type=jnp.float32)
        else:
            recon = jnp.dot(Lmask, U, precision=_PREC)
        Rb = Arows.astype(jnp.float32) - recon
        return jnp.sum(Rb * Rb), jnp.sum(
            Arows.astype(jnp.float32) ** 2)

    r2 = a2 = 0.0
    for r0 in range(0, m, block):
        r1 = min(r0 + block, m)
        s, a = block_sq(U, jnp.asarray(F[r0:r1]),
                        jnp.asarray(A[perm[r0:r1]]), r0)
        r2 += float(s)
        a2 += float(a)
    return float(np.sqrt(r2) / (n * np.sqrt(a2)))


def cholesky_residual_blocked(A, L, block: int = 4096) -> float:
    """FULL ||A - L L^T||_F / (N ||A||_F) for factors too large for a dense
    host reconstruction (the Cholesky analog of lu_residual_blocked): the
    factor L stays resident on the DEVICE (bf16 STORAGE factors stay bf16 —
    an f32 upcast would double the footprint) and A streams through in
    `block`-row slices. L must already be lower-triangular (both `cholesky`
    and `cholesky_stepped` return tril factors). Row block r of the
    reconstruction is L[r0:r1, :] @ L^T, sliced from the resident factor
    inside the jit so only A's rows cross the host link."""
    A = np.asarray(A)
    Ld = jnp.asarray(L)
    n = Ld.shape[0]
    bf16 = Ld.dtype == jnp.bfloat16

    @jax.jit
    def block_sq(Lfull, Arows, r0):
        Lb = jax.lax.dynamic_slice(Lfull, (r0, 0), (Arows.shape[0], n))
        if bf16:
            recon = jnp.dot(Lb, Lfull.T, preferred_element_type=jnp.float32)
        else:
            recon = jnp.dot(Lb, Lfull.T, precision=_PREC)
        Rb = Arows.astype(jnp.float32) - recon
        return jnp.sum(Rb * Rb), jnp.sum(Arows.astype(jnp.float32) ** 2)

    r2 = a2 = 0.0
    for r0 in range(0, n, block):
        r1 = min(r0 + block, n)
        s, a = block_sq(Ld, jnp.asarray(A[r0:r1]), r0)
        r2 += float(s)
        a2 += float(a)
    return float(np.sqrt(r2) / (n * np.sqrt(a2)))


def growth_factor(A, F) -> float:
    """Pivot growth ||U||_max / ||A||_max — the CALU stability diagnostic."""
    A = np.asarray(A)
    U = np.triu(np.asarray(F))
    return float(np.abs(U).max() / max(np.abs(A).max(), 1e-30))
