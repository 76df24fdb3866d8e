"""Stepped (per-panel dispatch) LU driver for beyond-single-jit sizes.

The flat single-jit kernel (lu/single.py) tops out near N=32768 on this
class of hardware: (a) the remote compile helper dies on the very large
unrolled programs a 64-step N=65536 trace produces, and (b) holding the
working region AND a factor-order output together doubles the footprint.
This driver runs ONE SMALL JIT PER PANEL STEP with the step index k a
DYNAMIC operand (all full-width steps share one executable — per-step
recompiles cost ~65 s each through this platform's remote compile
helper and dominated the first design's wall time) and the working
buffer DONATED, so the factorization proceeds in place in original row
order — the single-chip analog of the reference's out-of-loop
orchestration (the `for k in 0..Nt` driver of
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
def _make_step_dyn(w: int, m: int, n: int, precision: str,
                   chunk: int, bf16s: bool):
    """One donated panel step with a DYNAMIC step offset k: every
    full-width step of a factorization shares ONE executable. This is the
    load-bearing property of the stepped driver on this platform — with k
    baked in statically (the first design), a 64-step N=65536 run paid 64
    remote compiles at ~65 s each (~4200 s of a 5246 s wall,
    /tmp/prof_65536_diag.log: first run per k 64-80 s, warm rerun 183 ms).

    Same math as the flat kernel's masked (non-splice) step: the panel is
    cut with `dynamic_slice` at (0, k); U12 is computed for the FULL row
    width with columns < k+w zeroed BEFORE the TRSM (blocked substitution
    is columnwise-linear, so zero columns stay exactly zero and live
    columns match the sliced computation); the trailing update runs over
    static column chunks, each wrapped in `lax.cond` that passes the
    chunk through untouched when it lies entirely left of the trailing
    region (c1 <= k+w) — so the executed GEMM work still shrinks as k
    grows, to chunk granularity. Pivot indices are spliced into a carried
    factor-order `porder` vector at offset k, so the step needs NO host
    readback and the Python driver loop can run fully async.

    Returns a jitted fn (k:int32, R, avail, porder) -> (R, avail, porder)
    with R/avail/porder donated (same shapes every step => all alias)."""
    f32 = jnp.float32

    def step(k, R, avail, porder):
        panel = jax.lax.dynamic_slice(R, (0, k), (m, w))
        if bf16s:
            panel = panel.astype(f32)
        piv, _, M = factor_panel(panel, avail, w, block=128)
        lu_top = M[piv]
        R = jax.lax.dynamic_update_slice(
            R, jnp.where(avail[:, None], M, panel).astype(R.dtype), (0, k)
        )
        avail = avail.at[piv].set(False)
        porder = jax.lax.dynamic_update_slice(porder, piv, (k,))
        cols = jnp.arange(n, dtype=jnp.int32)[None, :]
        # pivot rows' raw trailing content; columns < k+w zeroed so the
        # TRSM emits exact zeros there (masked-out of the update)
        rhs = jnp.where(cols >= k + w, R[piv].astype(f32), 0.0)
        U12 = trsm_left_lower_unit(unit_lower(lu_top), rhs,
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

        for c0 in range(0, n, chunk):
            c1 = min(c0 + chunk, n)
            Uc = jax.lax.slice(U12, (0, c0), (w, c1))
            Rt = jax.lax.slice(R, (0, c0), (m, c1))
            if (_pallas_mode_ok(Rt, mode, 0, c1 - c0)
                    and (c1 - c0) % 512 == 0 and w <= 4096):
                # sliced fused Mosaic update (the whole R exceeds the
                # Mosaic operand ceiling at stepped sizes by design)
                from conflux_tpu.ops.pallas_gemm import schur_update_pallas

                def upd(Rt, Uc):
                    return schur_update_pallas(Rt, Mgemm, Uc, 0, mode)
            else:
                def upd(Rt, Uc):
                    return Rt + (-schur_dot(Mgemm, Uc, mode)).astype(
                        Rt.dtype)
            Rt = jax.lax.cond(k + w >= c1, lambda Rt, Uc: Rt, upd, Rt, Uc)
            R = jax.lax.dynamic_update_slice(R, Rt, (0, c0))
        return R, avail, porder

    return jax.jit(step, donate_argnums=(1, 2, 3))


def _upload_rowchunks(A: np.ndarray, rows: int = 4096):
    """Host -> device upload through row-block dus into a donated buffer:
    the full matrix never exists twice on device (jnp.asarray of a host
    array materializes a second full-size copy — 17.2 GB at N=65536 bf16,
    CLAUDE.md)."""
    m, n = A.shape
    R = jnp.zeros((m, n), jnp.dtype(A.dtype))
    put = jax.jit(
        lambda buf, blk, r0: jax.lax.dynamic_update_slice(buf, blk, (r0, 0)),
        donate_argnums=(0,))
    for r0 in range(0, m, rows):
        R = put(R, jnp.asarray(A[r0 : r0 + rows]), np.int32(r0))
    return R


@lru_cache(maxsize=None)
def _row_gather(m: int, n: int, rows: int, dtype_name: str):
    """Cached factor-order row-block gather (for streaming F to host)."""
    return jax.jit(lambda R, idx: R[idx])


def _flat_stepped(A, v: int, precision: str, chunk: int, out: str):
    """Stepped flat driver over one monolithic donated buffer (see
    _make_step_dyn): all full-width steps share one executable and
    dispatch without host readbacks; only the final perm fetch and the
    factor-order output synchronize."""
    m, n = A.shape
    if isinstance(A, np.ndarray):
        R = _upload_rowchunks(A)
    else:
        R = jnp.asarray(A)
    bf16s = R.dtype == jnp.bfloat16
    avail = jnp.ones(m, bool)
    porder = jnp.zeros(m, jnp.int32)
    for k in range(0, n, v):
        w = min(v, n - k)
        step = _make_step_dyn(w, m, n, precision, chunk, bf16s)
        R, avail, porder = step(np.int32(k), R, avail, porder)
    perm = np.asarray(porder)[:n]
    if m > n:
        perm = np.concatenate([perm, np.flatnonzero(np.asarray(avail))])
    perm = perm.astype(np.int32)
    if out == "auto":
        out = "device" if 2 * R.nbytes < _DEVICE_OUT_BUDGET else "host"
    if out == "device":
        return R[jnp.asarray(perm)], jnp.asarray(perm)
    # host: stream factor-order row blocks (wide-row gathers are the fast
    # gather regime on this chip; the device never holds a second copy)
    rows = max(v, 4096 // max(1, n // 16384))
    F = np.empty((m, n), dtype=np.asarray(R[:1, :1]).dtype)
    gather = _row_gather(m, n, rows, str(R.dtype))
    for r0 in range(0, m, rows):
        r1 = min(r0 + rows, m)
        F[r0:r1] = np.asarray(gather(R, jnp.asarray(perm[r0:r1])))
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
    return _flat_stepped(A, v, precision, chunk, out)
