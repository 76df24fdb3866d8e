"""Stepped (per-panel dispatch) Cholesky driver for beyond-single-jit sizes.

The Cholesky analog of lu/stepped.py: ONE SMALL JIT PER PANEL STEP with the
step index k a DYNAMIC operand (all full-width steps share one executable —
per-step recompiles cost ~65 s each through this platform's remote compile
helper) and the factor buffer DONATED, so the left-looking factorization
proceeds in place. This sidesteps the remote compile helper's
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
def _make_step_dyn(w: int, n: int, precision: str, chunk: int,
                   bf16s: bool):
    """One donated panel step with a DYNAMIC step offset k: every
    full-width step shares ONE executable (the k-static first design paid
    one ~65 s remote compile PER STEP — ~4200 s of a 64-step N=65536
    run's wall time; see lu/stepped._make_step_dyn).

    Static shapes force full-height/full-width operands, so the
    left-looking update `strip[k:] -= F[k:, :k] @ F[k:k+w, :k]^T` runs on
    an (n-row x n-col) operand grid of `chunk`-sized blocks, each wrapped
    in `lax.cond`: a block computes only if it holds factored columns
    (c0 < k) AND rows the panel still needs (r1 > k) — everything else
    passes through as zeros. Executed GEMM work therefore tracks the
    ideal n^3/3 to block granularity instead of the 3x a purely masked
    full-shape program would burn. The straddling column block is masked
    on the small [w, cols] operand (columns >= k contribute zero).

    Returns a jitted fn (k:int32, F) -> F with F donated (one executable
    => every step aliases in place)."""
    f32 = jnp.float32
    gmode = "bf16" if bf16s else precision

    def step(k, F):
        strip0 = jax.lax.dynamic_slice(F, (0, k), (n, w))
        strip = strip0.astype(f32)
        # rows k..k+w of F, all columns (the transposed-panel operand)
        top = jax.lax.dynamic_slice(F, (k, 0), (w, n))
        tops = []
        for c0 in range(0, n, chunk):
            c1 = min(c0 + chunk, n)
            Tc = jax.lax.slice(top, (0, c0), (w, c1))
            mask = (c0 + jnp.arange(c1 - c0, dtype=jnp.int32))[None, :] < k
            tops.append(jnp.where(mask, Tc, jnp.zeros_like(Tc)))
        parts = []
        for r0 in range(0, n, chunk):
            r1 = min(r0 + chunk, n)
            accr = jnp.zeros((r1 - r0, w), f32)
            for ci, c0 in enumerate(range(0, n, chunk)):
                c1 = min(c0 + chunk, n)
                Lrc = jax.lax.slice(F, (r0, c0), (r1, c1))

                def gemm(Lrc, Tcm):
                    return schur_dot(Lrc, Tcm.T, gmode)

                accr = accr + jax.lax.cond(
                    (k > c0) & (r1 > k),
                    gemm,
                    lambda Lrc, Tcm: jnp.zeros(
                        (Lrc.shape[0], w), f32),
                    Lrc, tops[ci])
            parts.append(accr)
        strip = strip - jnp.concatenate(parts, axis=0)
        diag = jax.lax.dynamic_slice(strip, (k, 0), (w, w))
        L11 = potrf_tile(diag)
        # TRSM over the full strip (rows < k+w produce garbage that the
        # row mask below discards; n*w^2 extra flops — negligible)
        T = trsm_right_lower_t(strip, L11, method="invert")
        rows = jnp.arange(n, dtype=jnp.int32)[:, None]
        # rows < k revert to the ORIGINAL strip values: the straddling
        # row block's cond fires for its whole block, so acc rows < k
        # hold garbage partial sums that must not leak into F
        out = jnp.where(rows >= k, T, strip0.astype(f32))
        out = jax.lax.dynamic_update_slice(out, L11, (k, 0))
        # rows above k keep their (already final) values via the row mask;
        # the stale upper triangle right of the panel is zeroed by the
        # final tril chunks
        return jax.lax.dynamic_update_slice(F, out.astype(F.dtype), (0, k))

    return jax.jit(step, donate_argnums=(1,))


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
    if isinstance(A, np.ndarray):
        from conflux_tpu.lu.stepped import _upload_rowchunks

        F = _upload_rowchunks(A)
    else:
        F = jnp.asarray(A)
    bf16s = F.dtype == jnp.bfloat16
    for k in range(0, n, v):
        w = min(v, n - k)
        F = _make_step_dyn(w, n, precision, chunk, bf16s)(np.int32(k), F)
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
