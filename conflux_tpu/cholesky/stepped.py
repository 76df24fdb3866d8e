"""Stepped (per-panel dispatch) Cholesky driver for beyond-single-jit sizes.

The Cholesky analog of lu/stepped.py: ONE SMALL JIT PER PANEL STEP with the
step index k static and the factor buffer DONATED, so the left-looking
factorization proceeds in place. This sidesteps the remote compile helper's
failure mode on very large unrolled single-jit programs (observed on
~64-step traces with many distinct per-epoch shapes; CLAUDE.md) and keeps
peak HBM at one factor buffer plus one [m_k, v] panel temp. bf16 STORAGE
mode (pass a bfloat16 array) halves HBM and fits N=65536 (8.6 GB) on one
chip — the reference demonstrates N=65536 Cholesky via its disk-backed
CholeskyIO path (src/conflux/cholesky/CholeskyIO.cpp:100-172); here the
whole factor stays resident.

Each step is exactly the flat kernel's panel step (cholesky/single.py
_potrf_flat): one [m_k, k] x [k, w] left-looking update GEMM against all
previous panels, a v x v potrf, and a TRSM — f32 panel math, storage-dtype
buffer. No pivoting, so steps are independent of data and the factor needs
no reordering.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from conflux_tpu.ops.tri import potrf_tile, schur_dot, trsm_right_lower_t


@lru_cache(maxsize=None)
def _make_step(k: int, w: int, n: int, precision: str, bf16s: bool):
    """One donated, k-static panel step: F -> F with columns k..k+w
    factored. Cached so repeated same-shape factorizations reuse the
    in-process executable."""
    f32 = jnp.float32

    def step(F):
        col = jax.lax.slice(F, (k, k), (n, k + w))
        if bf16s:
            col = col.astype(f32)
        if k > 0:
            left = jax.lax.slice(F, (k, 0), (n, k))
            top = jax.lax.slice(F, (k, 0), (k + w, k))
            col = col - schur_dot(left, top.T, "bf16" if bf16s else precision)
        L11 = potrf_tile(col[:w])
        out = L11
        if k + w < n:
            L21 = trsm_right_lower_t(col[w:], L11, method="invert")
            out = jnp.concatenate([L11, L21], axis=0)
        # zero this panel's upper part in the same write: rows above k keep
        # their (already final) values, columns right of the panel are
        # zeroed later rows' writes / the final tril chunks
        return jax.lax.dynamic_update_slice(F, out.astype(F.dtype), (k, k))

    return jax.jit(step, donate_argnums=(0,))


@lru_cache(maxsize=None)
def _tril_chunk(r0: int, r1: int, n: int, dtype_name: str):
    """Donation-free device tril of one row chunk (for streaming out)."""

    def f(F):
        rows = jax.lax.slice(F, (r0, 0), (r1, n))
        c = jnp.arange(n)[None, :]
        r = r0 + jnp.arange(r1 - r0)[:, None]
        return jnp.where(c <= r, rows, 0)

    return jax.jit(f)


@lru_cache(maxsize=None)
def _tril_inplace_chunk(r0: int, r1: int, n: int):
    """Zero the upper triangle of rows r0:r1 IN PLACE (donated buffer,
    one dus per call): `jnp.tril(F)` holds input + output — 17.2 GB at
    N=65536 bf16 — while this keeps the peak at F + one row chunk."""

    def f(F):
        rows = jax.lax.slice(F, (r0, 0), (r1, n))
        c = jnp.arange(n)[None, :]
        r = r0 + jnp.arange(r1 - r0)[:, None]
        rows = jnp.where(c <= r, rows, jnp.zeros_like(rows))
        return jax.lax.dynamic_update_slice(F, rows, (r0, 0))

    return jax.jit(f, donate_argnums=(0,))


def cholesky_stepped(A, v: int = 1024, precision: str = "highest",
                     out: str = "auto", chunk: int = 8192):
    """Lower Cholesky factor via per-step dispatch — same contract as
    `cholesky` (cholesky/single.py). A: [n, n] SPD, float32 or bfloat16
    (STORAGE mode). A DEVICE-array input is CONSUMED (donated into step 0);
    a host array is uploaded and the host copy untouched.
    out: "device" (tril'd factor on device), "host" (streams tril row
    chunks into numpy), "auto" (host above the ~11 GB device budget)."""
    from conflux_tpu.errors import ConfluxError, ErrorCode

    n, n2 = A.shape
    if n != n2:
        raise ConfluxError(ErrorCode.INVALID_SHAPE,
                           "cholesky_stepped expects a square matrix")
    in_dtype = jnp.dtype(A.dtype)
    if in_dtype not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        raise ConfluxError(ErrorCode.INVALID_TYPE,
                           f"float32 or bfloat16 input, got {in_dtype}")
    F = jnp.asarray(A)
    bf16s = F.dtype == jnp.bfloat16
    for k in range(0, n, v):
        w = min(v, n - k)
        F = _make_step(k, w, n, precision, bf16s)(F)
    if out == "auto":
        # the in-place tril needs only F + one row chunk on device
        out = ("device"
               if F.nbytes + 8 * n * chunk < 11_000_000_000 else "host")
    if out == "device":
        for r0 in range(0, n, chunk):
            F = _tril_inplace_chunk(r0, min(r0 + chunk, n), n)(F)
        return F
    L = np.empty((n, n), dtype=np.asarray(F[:1, :1]).dtype)
    for r0 in range(0, n, chunk):
        r1 = min(r0 + chunk, n)
        L[r0:r1] = np.asarray(_tril_chunk(r0, r1, n, str(F.dtype))(F))
    return L
