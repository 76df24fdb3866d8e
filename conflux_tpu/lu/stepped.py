"""Stepped (per-panel dispatch) LU driver for beyond-single-jit sizes.

The flat single-jit kernel (lu/single.py) tops out near N=32768 on this
class of hardware: (a) the remote compile helper dies on the very large
unrolled programs a 64-step N=65536 trace produces, and (b) holding the
working region AND a factor-order output together doubles the footprint.
This driver runs ONE SMALL JIT PER PANEL STEP with the step index k
static and the working buffer DONATED, so the factorization proceeds
in place in original row order — the single-chip analog of the
reference's out-of-loop orchestration (the `for k in 0..Nt` driver of
src/conflux/lu/conflux_opt.hpp:535 with rank-local storage), scaled to
matrices whose factor cannot coexist with a second copy in HBM.

Each step is exactly the flat kernel's masked (non-splice) panel step:
masked-argmax panel factorization over the still-live rows, panel-column
write, then one chunked trailing GEMM whose A-operand rows are
multipliers for live rows, zeros for dead rows, and strict(L11) for this
step's pivots — the onehot product turns their raw trailing content into
U12 in place (see _getrf_flat, lu/single.py). bf16 STORAGE mode (pass a
bfloat16 array) halves HBM and fits N=65536 (8.6 GB) on one chip — the
reference's second-largest demonstrated config (README.md:96-106,
N=65536 on 64 ranks).

Factor assembly honors the standard (F, perm) contract: F in factor order
with A[perm] = unit_lower(F) @ upper(F). `out` picks where F lands —
"device" gathers on-device (needs ~2x the buffer), "host" streams
factor-order row chunks to a numpy array (the only option when two
copies exceed HBM), "auto" decides by size. Full-residual validation for
these sizes lives in validation.lu_residual_blocked (streams A through
the device, never forms an N x N host temporary in f64).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from conflux_tpu.ops.panel import factor_panel
from conflux_tpu.ops.tri import (
    schur_dot,
    trsm_left_lower_unit,
    unit_lower,
)

_PREC = jax.lax.Precision.HIGHEST

# device buffer budget for choosing out="device" vs "host": two copies of
# the factor plus per-step temps must clear the ~13 GB HBM degradation
# cliff documented in CLAUDE.md, not just the 15.75 GB capacity
_DEVICE_OUT_BUDGET = 11_000_000_000


@lru_cache(maxsize=None)
def _make_step(k: int, w: int, m: int, n: int, precision: str,
               chunk: int, bf16s: bool):
    """One donated, k-static panel step (the flat kernel's masked path,
    lu/single.py _getrf_flat). Returns a jitted fn (R, avail) ->
    (R, avail, piv). Cached so repeated same-shape factorizations reuse
    the in-process executable."""
    f32 = jnp.float32

    def step(R, avail):
        panel = jax.lax.slice(R, (0, k), (m, k + w))
        if bf16s:
            panel = panel.astype(f32)
        piv, _, M = factor_panel(panel, avail, w, block=128)
        lu_top = M[piv]
        R = jax.lax.dynamic_update_slice(
            R, jnp.where(avail[:, None], M, panel).astype(R.dtype), (0, k)
        )
        avail = avail.at[piv].set(False)
        if k + w < n:
            Rpiv = R[piv]
            L11 = unit_lower(lu_top)
            U12 = trsm_left_lower_unit(L11, Rpiv[:, k + w :].astype(f32),
                                       method="invert")
            # avail already flipped: pivots get strict(L11) rows via the
            # onehot product so the single GEMM writes U12 into them in
            # place; dead rows contribute zeros (frozen U values)
            onehot = (
                jnp.arange(m, dtype=jnp.int32)[:, None] == piv[None, :]
            ).astype(f32)
            Mgemm = jnp.where(avail[:, None], M, 0.0) + jnp.dot(
                onehot, jnp.tril(lu_top, -1), precision=_PREC
            )
            mode = "bf16out" if bf16s else precision
            from conflux_tpu.lu.single import _pallas_mode_ok

            for c0 in range(k + w, n, chunk):
                c1 = min(c0 + chunk, n)
                Uc = U12[:, c0 - k - w : c1 - k - w]
                if _pallas_mode_ok(R, mode, c0, n) and (c1 - c0) % 512 == 0:
                    # sliced fused Mosaic update (the whole R exceeds the
                    # Mosaic operand ceiling at stepped sizes by design)
                    from conflux_tpu.ops.pallas_gemm import \
                        schur_update_pallas

                    Rt = jax.lax.slice(R, (0, c0), (m, c1))
                    Rt = schur_update_pallas(Rt, Mgemm, Uc, 0, mode)
                    R = jax.lax.dynamic_update_slice(R, Rt, (0, c0))
                else:
                    R = R.at[:, c0:c1].add(-schur_dot(Mgemm, Uc, mode))
        return R, avail, piv

    return jax.jit(step, donate_argnums=(0,))


@lru_cache(maxsize=None)
def _make_step_chunked(k: int, w: int, m: int, n: int, precision: str,
                       cw: int, bf16s: bool, nchunks: int):
    """One donated k-static panel step over COLUMN-CHUNKED storage: the
    working matrix is carried as `nchunks` separate [m, <=cw] arrays
    instead of one monolith. Why: at N=65536 bf16 the monolithic step's
    slice -> kernel -> dus write-back chain made XLA copy the 8.6 GB
    buffer repeatedly and pushed the working set onto the documented
    HBM-pressure cliff (~100x degradation: 5246 s measured vs a ~10 s
    floor, /tmp/prof_65536_flat2.log). With chunk-granular arrays every
    trailing update consumes a WHOLE chunk and produces a whole chunk —
    in+out donation aliases each one (same shape/dtype), each Mosaic
    operand stays under the ~3.7e9-byte compile-helper ceiling, and the
    peak footprint is one matrix + one chunk temp.

    Math is bit-identical to _make_step: each trailing column receives
    one f32-accumulated K=w update regardless of the column tiling.
    Returns a jitted fn (avail, *chunks) -> (avail, piv, *chunks)."""
    f32 = jnp.float32
    ci = k // cw      # chunk holding the panel
    off = k - ci * cw

    def step(avail, *chunks):
        from conflux_tpu.lu.single import _pallas_mode_ok

        chunks = list(chunks)
        panel = jax.lax.slice(chunks[ci], (0, off), (m, off + w))
        panel = panel.astype(f32)
        piv, _, M = factor_panel(panel, avail, w, block=128)
        lu_top = M[piv]
        chunks[ci] = jax.lax.dynamic_update_slice(
            chunks[ci],
            jnp.where(avail[:, None], M, panel).astype(chunks[ci].dtype),
            (0, off))
        avail2 = avail.at[piv].set(False)
        if k + w < n:
            # pivot rows' raw trailing content, gathered per chunk
            rhs_parts = []
            if off + w < chunks[ci].shape[1]:
                rhs_parts.append(chunks[ci][piv][:, off + w :])
            for j in range(ci + 1, nchunks):
                rhs_parts.append(chunks[j][piv])
            rhs = jnp.concatenate(
                [p.astype(f32) for p in rhs_parts], axis=1)
            U12 = trsm_left_lower_unit(unit_lower(lu_top), rhs,
                                       method="invert")
            onehot = (
                jnp.arange(m, dtype=jnp.int32)[:, None] == piv[None, :]
            ).astype(f32)
            Mgemm = jnp.where(avail2[:, None], M, 0.0) + jnp.dot(
                onehot, jnp.tril(lu_top, -1), precision=_PREC)
            mode = "bf16out" if bf16s else precision
            u0 = 0
            for j in range(ci, nchunks):
                ncols = chunks[j].shape[1]
                c0 = off + w if j == ci else 0
                if c0 >= ncols:
                    continue
                Uc = U12[:, u0 : u0 + ncols - c0]
                u0 += ncols - c0
                if (_pallas_mode_ok(chunks[j], mode, 512, 1024)
                        and ncols % 512 == 0 and c0 % 512 == 0
                        and m % 512 == 0 and w <= 4096):
                    from conflux_tpu.ops.pallas_gemm import \
                        schur_update_pallas

                    chunks[j] = schur_update_pallas(
                        chunks[j], Mgemm, Uc, c0, mode)
                elif c0 == 0:
                    chunks[j] = chunks[j] + (
                        -schur_dot(Mgemm, Uc, mode)).astype(chunks[j].dtype)
                else:
                    chunks[j] = chunks[j].at[:, c0:].add(
                        (-schur_dot(Mgemm, Uc, mode)
                         ).astype(chunks[j].dtype))
        return (avail2, piv, *chunks)

    return jax.jit(step, donate_argnums=tuple(
        range(1, 1 + nchunks)))


def _flat_stepped_chunked(A, v: int, precision: str, cw: int, out: str):
    """Stepped flat driver over column-chunked storage (see
    _make_step_chunked). A host-array input uploads chunk by chunk so the
    full matrix never exists twice on device; a device-array input is
    split (transient 2x footprint — pass numpy at sizes near HBM)."""
    m, n = A.shape
    cw = max(v, cw // v * v)          # panel must never straddle a chunk
    bounds = [(j, min(j + cw, n)) for j in range(0, n, cw)]
    nchunks = len(bounds)
    if isinstance(A, np.ndarray):
        chunks = tuple(jnp.asarray(A[:, j0:j1]) for j0, j1 in bounds)
    else:
        chunks = tuple(A[:, j0:j1] for j0, j1 in bounds)
    bf16s = chunks[0].dtype == jnp.bfloat16
    avail = jnp.ones(m, bool)
    pivs = []
    for k in range(0, n, v):
        w = min(v, n - k)
        outs = _make_step_chunked(k, w, m, n, precision, cw, bf16s,
                                  nchunks)(avail, *chunks)
        avail, piv, chunks = outs[0], outs[1], outs[2:]
        pivs.append(np.asarray(piv))
    perm = np.concatenate(pivs)
    if m > n:
        perm = np.concatenate([perm, np.flatnonzero(np.asarray(avail))])
    perm = perm.astype(np.int32)
    if out == "auto":
        nbytes = sum(c.nbytes for c in chunks)
        out = "device" if 2 * nbytes < _DEVICE_OUT_BUDGET else "host"
    if out == "device":
        F = jnp.concatenate(chunks, axis=1)
        return F[jnp.asarray(perm)], jnp.asarray(perm)
    # host: factor-order row blocks per column chunk (each device->host
    # fetch is [<=cw, <=cw])
    F = np.empty((m, n), dtype=np.asarray(chunks[0][:1, :1]).dtype)
    pj = jnp.asarray(perm)
    for (j0, j1), c in zip(bounds, chunks):
        for r0 in range(0, m, cw):
            r1 = min(r0 + cw, m)
            F[r0:r1, j0:j1] = np.asarray(c[pj[r0:r1]])
    return F, perm


@lru_cache(maxsize=None)
def _make_crout_step(k: int, w: int, m_r: int, n: int, precision: str,
                     nbands: int, bf16s: bool):
    """One donated k-static CROUT step (see lu/single._getrf_crout): panel
    updated by ONE big-K GEMM against the previous bands, the step's pivot
    rows' full factor row finished immediately, live rows compacted.
    Returns (R' [m_r - w, n], origin', band [w, n], bperm [w])."""
    f32 = jnp.float32
    gmode = "bf16" if bf16s else precision

    def step(R, origin, bands):
        panel = jax.lax.slice(R, (0, k), (m_r, k + w)).astype(f32)
        if bands:
            Utop = jnp.concatenate([b[:, k : k + w] for b in bands])
            panel = panel - schur_dot(
                jax.lax.slice(R, (0, 0), (m_r, k)), Utop, gmode)
        avail = jnp.ones(m_r, bool)
        piv, _, M = factor_panel(panel, avail, w, block=128)
        lu_top = M[piv]
        R = jax.lax.dynamic_update_slice(R, M.astype(R.dtype), (0, k))
        Rpiv = R[piv]
        parts = [Rpiv[:, :k], lu_top.astype(R.dtype)]
        if k + w < n:
            rhs = Rpiv[:, k + w :].astype(f32)
            if bands:
                Ut = jnp.concatenate([b[:, k + w :] for b in bands])
                rhs = rhs - schur_dot(Rpiv[:, :k].astype(f32), Ut, gmode)
            U12 = trsm_left_lower_unit(unit_lower(lu_top), rhs,
                                       method="invert")
            parts.append(U12.astype(R.dtype))
        band = jnp.concatenate(parts, axis=1)
        # compact: the w pivot rows leave (their factor row is the band)
        sel = jnp.ones(m_r, bool).at[piv].set(False)
        rows = jnp.arange(m_r, dtype=jnp.int32)
        live_idx = jnp.sort(jnp.where(sel, rows, m_r))[: m_r - w]
        return R[live_idx], origin[live_idx], band, origin[piv]

    return jax.jit(step, donate_argnums=(0,))


def _crout_stepped(A, v: int, precision: str, out: str):
    """Stepped driver, CROUT flavor: R shrinks exactly as the band list
    grows, so the STEADY-STATE device footprint stays ~= one matrix — but
    the per-step compaction R -> R[live] changes the buffer shape, which
    DEFEATS DONATION (XLA aliases only shape-identical donations), so each
    early step transiently holds R in + R out ~= 2x the matrix. At
    N=65536 bf16 that is 17.2 GB > 15.75 HBM (measured OOM,
    /tmp/prof_65536.log 2026-08-19); `scheme='flat'` keeps R full-size and
    aliases in place, so it is the beyond-~N=45000 path. Sizes whose 2x
    fits get crout's one-rounding-per-entry factors (each stored entry is
    rounded ONCE after an f32-accumulated GEMM vs the right-looking
    driver's per-step re-rounding of the whole bf16 trailing matrix)."""
    m, n = A.shape
    itemsize = 2 if jnp.dtype(A.dtype) == jnp.dtype(jnp.bfloat16) else 4
    if 2 * m * n * itemsize > 14_500_000_000:
        from conflux_tpu.errors import ConfluxError, ErrorCode

        raise ConfluxError(
            ErrorCode.INVALID_SHAPE,
            f"crout-stepped transiently needs 2 matrix copies "
            f"({2 * m * n * itemsize / 1e9:.1f} GB > HBM) because the "
            f"shrinking compaction defeats donation; use scheme='flat' "
            f"(in-place, one copy) at this size")
    R = jnp.asarray(A)
    bf16s = R.dtype == jnp.bfloat16
    origin = jnp.arange(m, dtype=jnp.int32)
    bands = []
    perms = []
    for k in range(0, n, v):
        w = min(v, n - k)
        R, origin, band, bperm = _make_crout_step(
            k, w, R.shape[0], n, precision, len(bands), bf16s)(
            R, origin, tuple(bands))
        bands.append(band)
        perms.append(np.asarray(bperm))
    if m > n:
        bands.append(R)
        perms.append(np.asarray(origin))
    perm = np.concatenate(perms).astype(np.int32)
    nbytes = sum(b.nbytes for b in bands)
    if out == "auto":
        out = "device" if 2 * nbytes < _DEVICE_OUT_BUDGET else "host"
    if out == "device":
        return jnp.concatenate(bands), jnp.asarray(perm)
    F = np.empty((m, n), dtype=np.asarray(bands[0][:1, :1]).dtype)
    r = 0
    for b in bands:
        F[r : r + b.shape[0]] = np.asarray(b)
        r += b.shape[0]
    return F, perm


def lu_factor_stepped(
    A, v: int = 1024, precision: str = "highest", chunk: int = 8192,
    out: str = "auto", scheme: str = "flat",
) -> Tuple[np.ndarray, np.ndarray]:
    """LU with partial pivoting via per-step dispatch: (F, perm) with
    A[perm] = unit_lower(F) @ upper(F) — the same contract as lu_factor.

    A: [m, n] (m >= n) numpy or jax array; float32, or bfloat16 for the
    halved-HBM STORAGE mode (f32 panels/pivoting/TRSMs, bf16 buffer).
    A DEVICE-array input is CONSUMED (donated into step 0, like LAPACK's
    overwrite_a); a host array is uploaded and the host copy untouched.
    out: "device" (factor-order gather on device; needs ~2x buffer),
    "host" (streams factor-order chunks into numpy — the only option when
    2x exceeds HBM), "auto" (by size).
    scheme: 'flat' (right-looking, in place, pivot-for-pivot identical to
    lu_factor's flat kernel) or 'crout' (left-looking — R shrinks as the
    band list grows, one big-K GEMM per panel, each stored entry rounded
    once; the better bf16-STORAGE recipe, see _crout_stepped)."""
    from conflux_tpu.errors import ConfluxError, ErrorCode

    m, n = A.shape
    if m < n:
        raise ConfluxError(ErrorCode.INVALID_SHAPE,
                           "lu_factor_stepped expects m >= n")
    # check the INPUT dtype, not the device array's: jnp.asarray silently
    # downcasts f64 -> f32 under the default x64-disabled config
    in_dtype = jnp.dtype(A.dtype)
    if in_dtype not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        raise ConfluxError(ErrorCode.INVALID_TYPE,
                           f"float32 or bfloat16 input, got {in_dtype}")
    if scheme == "crout":
        return _crout_stepped(A, v, precision, out)
    return _flat_stepped_chunked(A, v, precision, chunk, out)
