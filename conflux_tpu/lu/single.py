"""Single-device LU with partial pivoting, MXU-first.

The single-device analog of the reference's Python executable spec
(python/reference_lu.py `LUP`/`LUPv2`) and its per-rank hot loop
(LAPACKE_dgetrf panel + cblas_dtrsm + cblas_dgemm,
src/conflux/lu/conflux_opt.hpp:727,1347,1626-1634).

Two schemes:

  * "flat" (default): right-looking blocked LU on a working region R that
    SHRINKS by one band per partition event. At a partition the finished
    rows leave R as one [*, n] band (in factor order) and the live rows
    compact (order kept), so panel heights and trailing-GEMM heights
    shrink; between partitions, pivoted ("dead") rows freeze in place
    behind a mask. The partition CADENCE is the `partition` knob
    (default 1 = every step). The round-2 v5e cadence sweep
    (experiments/prof_flat_sweep.py, N=16384 v=512, bf16x3) measured:
    per-step partitioning 193 ms < rare partitioning (dead >= live-ish
    thresholds) 237-252 ms < no row movement at all 313 ms
    (experiments/prof_flat_inplace.py) — on the MXU the masked-FLOP
    overhead of frozen rows costs more than the compaction gathers' HBM
    traffic, so the fastest cadence is the most eager one. (NOTE: round-2
    docs briefly claimed the opposite — "no movement wins" — by
    misreading the sweep's part=1_000_000 sentinel as "never"; its actual
    semantics under the old `dead >= max(v, live // part)` trigger was
    "every step". The knob is now spelled so the code can't contradict
    the docs: partition=e partitions every e steps, 0 = never.)
    The step pipeline is UPDATE-IN-PLACE-THEN-GATHER: panel write + one
    trailing GEMM aliasing R in place, then the partition moves rows with
    two plain row gathers (band out, live compact). A round-3 variant that
    compacted FIRST and rebuilt R column-chunk-wise (gather-subtract +
    concatenate) measured 294 ms vs this flow's 190 ms at N=16384 v=1024
    'high' (experiments/prof_r3_regress.py vs /tmp/meas5.log): the rebuild
    costs one extra full-R traversal per step that the in-place add avoids.
    At cadence 1 the outgoing band still gets the EXACT TRSM U12 spliced
    into its trailing columns (a [w, n-k-w] dus on the small band — not the
    raw - strict(L11)@U12 cancellation, which injects GEMM-mode rounding
    into stored U rows under 'bf16'), and the trailing GEMM drops the
    onehot operand construction entirely.
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

from conflux_tpu.ops.panel import factor_panel, factor_panel_raw, select_pivots
from conflux_tpu.ops.tri import (
    schur_dot,
    trsm_left_lower_unit,
    trsm_right_upper,
    unit_lower,
    upper,
)

_PREC = jax.lax.Precision.HIGHEST

# the remote compile helper dies on Mosaic calls whose operands/outputs
# exceed ~3.7e9 bytes (bisected: 3.64e9 OK / 3.76e9 FAIL); gate the fused
# trailing kernel on both R and each per-call output staying under this
_PALLAS_R_LIMIT = 3_600_000_000
_PALLAS_COL_LIMIT = 1_200_000_000


def _pallas_mode_ok(R, mode: str, c0: int, n: int) -> bool:
    """Shared gate: real TPU backend, 1- or 3-pass precision (6-pass
    'highest' stays on dot_general), 512-divisible heights/offsets."""
    import os

    if mode not in ("high", "bf16", "bf16out"):
        return False
    if os.environ.get("CONFLUX_NO_PALLAS_TRAILING"):
        # escape hatch for toolchains whose compile helper rejects the
        # Mosaic trailing kernel (bench.py's retry path sets this)
        return False
    if jax.default_backend() == "cpu":
        return False
    return (R.shape[0] % 512 == 0 and c0 % 512 == 0
            and (n - c0) % 512 == 0)


def _pallas_trailing_ok(R, mode: str, c0: int, n: int) -> bool:
    """Whole-R fused Mosaic trailing update: R itself must stay under the
    compile-helper operand ceiling."""
    itemsize = 2 if R.dtype == jnp.bfloat16 else 4
    return (_pallas_mode_ok(R, mode, c0, n)
            and R.shape[0] * n * itemsize <= _PALLAS_R_LIMIT)


# ----------------------------------------------------------------------------
# Flat in-place scheme
# ----------------------------------------------------------------------------

def _partition_now(dead: int, v: int, k: int, w: int, n: int,
                   partition: int) -> bool:
    """STATIC partition predicate (shared with the cadence test so the
    schedule is asserted, not just described): emit a band + compact when
    `partition` steps' worth of rows have died (partition=1: every step —
    the measured v5e winner; 0/None: only at the very end)."""
    return bool(partition) and dead >= partition * v or k + w >= n


def _getrf_flat(
    A: jnp.ndarray, v: int, precision: str = "highest",
    partition: int = 1, chunk: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Blocked right-looking LU with banded row movement (see module
    docstring). Per step k (panel width w):

      * the masked panel factorization selects w pivots among the still-live
        region rows (`avail`) — dead rows can never win the masked argmax;
      * the panel-column write stores merged L\\U rows on the pivots and
        multipliers on live rows; dead rows keep their finished U values
        (their factor content in these columns was written when THEY
        pivoted);
      * ONE trailing GEMM aliases R in place. When the step's pivot rows
        leave R this very step (cadence 1, the default), they contribute
        zero rows to the GEMM and the outgoing band receives the exact TRSM
        U12 via a [w, n-k-w] dus instead; at other cadences pivot rows stay
        in R and get strict(L11) rows through a onehot product, which turns
        their raw trailing content into U12 in place
        (raw - strict(L11)@U12 = U12 + O(eps));
      * at a partition the finished rows leave R as one [dead, n] band in
        factor order and the live rows compact (order kept) — two plain row
        gathers producing fresh buffers, so the per-step dus/add chain
        keeps aliasing R in place (offset sub-slicing of one big buffer
        defeated XLA's in-place analysis: +120 ms of copies at N=16384,
        experiments/prof_trace5.py). The schedule is static, so every shape
        stays compile-time known.

    `chunk` > 0 splits the trailing add over `chunk`-wide column blocks so
    the GEMM temp never exceeds [m_r, chunk]; bf16 STORAGE mode forces it
    (8192) so no f32 temp doubles the halved footprint. The f32 default is
    unchunked — the archive's 954 ms N=32768 configuration (/tmp/meas5.log).

    Data-movement vocabulary per measured v5e costs
    (experiments/prof_gather.py): full-width row gathers and 1-D index
    scatters are fast; 2-D row scatters lower to SERIAL loops and are
    avoided (banding IS the row-scatter workaround).
    Replaces the reference's physical row compaction (push_pivots_up /
    first_non_pivot_row, conflux_opt.hpp:176-218)."""
    m, n = A.shape
    # bf16 STORAGE mode (A arrives as bfloat16): the buffer, the factor, and
    # the trailing updates stay bf16 (f32 MXU accumulation, one rounding per
    # step) while panels, pivot selection, and TRSMs run in f32. Halves HBM:
    # N=65536 (8.6 GB) fits a single chip — the reference's second-largest
    # demonstrated config (README.md:96-106).
    bf16s = A.dtype == jnp.bfloat16
    if bf16s and not chunk:
        chunk = 8192
    f32 = jnp.float64 if A.dtype == jnp.float64 else jnp.float32
    R = A                            # working region, shrinks per partition
    origin = jnp.arange(m, dtype=jnp.int32)   # original A-row per R row
    avail = jnp.ones(m, bool)        # live mask over R rows
    dead = 0                         # static: finished rows still in R
    pend = []                        # per-step piv since last partition
    bands = []                       # finished [*, n] bands, factor order
    perm_parts = []

    def trailing_add(R, Mgemm, U12, k, w):
        mode = "bf16out" if bf16s else precision
        c0 = k + w
        if _pallas_trailing_ok(R, mode, c0, n):
            # fused Mosaic accumulate: measured 2.1x over XLA's
            # materialize-then-subtract at the trailing shapes (36.5 vs
            # 17.3 TF/s 'high' at N=16384, /tmp/schur_speed.log) — the
            # XLA dot is operand-re-read-bound at K = v (prof_k_sweep)
            from conflux_tpu.ops.pallas_gemm import schur_update_pallas

            step = max(512, min(chunk or n, _PALLAS_COL_LIMIT
                                // (4 * R.shape[0]) // 512 * 512))
            for cc0 in range(c0, n, step):
                cc1 = min(cc0 + step, n)
                R = schur_update_pallas(
                    R, Mgemm, U12[:, cc0 - c0 : cc1 - c0], cc0,
                    mode, c1=cc1)
            return R
        if _pallas_mode_ok(R, mode, c0, n):
            # R itself exceeds the Mosaic operand ceiling (early steps of
            # N>=32768): run the fused kernel on column-chunk VALUES and
            # dus them back. The slice+dus add ~2 extra passes over the
            # trailing region but the kernel's 2.1x on the dot dominates.
            # The slice between consecutive calls also breaks the direct
            # custom-call chain the compile helper cannot digest.
            from conflux_tpu.ops.pallas_gemm import schur_update_pallas

            itemsize = 2 if bf16s else 4
            step = max(512, min(chunk or n, _PALLAS_COL_LIMIT
                                // (itemsize * R.shape[0]) // 512 * 512))
            for cc0 in range(c0, n, step):
                cc1 = min(cc0 + step, n)
                Rt = jax.lax.slice(R, (0, cc0), (R.shape[0], cc1))
                Rt = schur_update_pallas(
                    Rt, Mgemm, U12[:, cc0 - c0 : cc1 - c0], 0, mode)
                R = jax.lax.dynamic_update_slice(R, Rt, (0, cc0))
            return R
        if not chunk:
            return R.at[:, c0:].add(-schur_dot(Mgemm, U12, mode))
        # chunked updates: each [m_r, <=chunk] GEMM result dies into the
        # aliased .at[].add immediately (bf16s: 2 bytes/elt tiles)
        for cc0 in range(c0, n, chunk):
            cc1 = min(cc0 + chunk, n)
            S = schur_dot(Mgemm, U12[:, cc0 - c0 : cc1 - c0], mode)
            R = R.at[:, cc0:cc1].add(-S)
        return R

    for k in range(0, n, v):
        w = min(v, n - k)
        m_r = R.shape[0]
        panel = jax.lax.slice(R, (0, k), (m_r, k + w))
        if bf16s:
            panel = panel.astype(f32)
        # block=128: at the flat scheme's full panel heights, wider rank-1
        # blocks amortize per-block dispatch (measured 182 vs 193 ms at
        # N=16384 v=1024, experiments/prof_flat_trace6.py)
        piv, _, M = factor_panel(panel, avail, w, block=128)
        lu_top = M[piv]              # [w, w] merged factors
        dead += w
        live = m_r - dead
        part_now = _partition_now(dead, v, k, w, n, partition)
        # band leaves NOW and holds only this step's pivots -> its U12 can
        # be spliced in exactly and the trailing GEMM skips the onehot
        splice = part_now and not pend and k + w < n
        pend.append(piv)
        # panel-column write: pivot rows get lu_top (M carries it there),
        # live rows their multipliers, dead rows keep their U values
        R = jax.lax.dynamic_update_slice(
            R, jnp.where(avail[:, None], M, panel).astype(R.dtype), (0, k)
        )
        avail = avail.at[piv].set(False)       # 1-D scatter (fast)
        U12 = None
        if k + w < n:
            Rpiv = R[piv]                      # [w, n] row gather (fast)
            L11 = unit_lower(lu_top)
            U12 = trsm_left_lower_unit(L11, Rpiv[:, k + w :].astype(f32),
                                       method="invert")
            if splice:
                # pivot rows contribute zeros; their trailing columns keep
                # raw values that the band dus below overwrites with the
                # exact U12 (no raw - strict(L11)@U12 cancellation, which
                # injects GEMM-mode rounding into stored U rows under
                # 'bf16'; no onehot operand construction either)
                Mgemm = jnp.where(avail[:, None], M, 0.0)
            else:
                # one GEMM updates live rows AND writes U12 into pivot rows
                # via their strict(L11) multiplier row. Full f32 precision
                # on the onehot product: it flows into U12 through a
                # cancellation (raw - L11 @ U12), so lowering it to bf16x3
                # injects ~1e-5-level absolute error into U.
                onehot = (
                    jnp.arange(m_r, dtype=jnp.int32)[:, None] == piv[None, :]
                ).astype(f32)
                Mgemm = jnp.where(avail[:, None], M, 0.0) + jnp.dot(
                    onehot, jnp.tril(lu_top, -1), precision=_PREC
                )
            R = trailing_add(R, Mgemm, U12, k, w)
        if part_now:
            done_idx = jnp.concatenate(pend) if len(pend) > 1 else pend[0]
            band = R[done_idx]                 # [dead, n] row gather (fast)
            if splice:
                band = jax.lax.dynamic_update_slice(
                    band, U12.astype(R.dtype), (0, k + w))
            bands.append(band)
            perm_parts.append(origin[done_idx])
            if live > 0:
                rows = jnp.arange(m_r, dtype=jnp.int32)
                live_idx = jnp.sort(jnp.where(avail, rows, m_r))[:live]
                R = R[live_idx]
                origin = origin[live_idx]
                avail = jnp.ones(live, bool)
            dead = 0
            pend = []
    if m > n:
        # tail: never-pivoted rows, original order (completed L rows)
        bands.append(R)
        perm_parts.append(origin)
    return jnp.concatenate(bands), jnp.concatenate(perm_parts)


# ----------------------------------------------------------------------------
# Crout (left-looking) scheme
# ----------------------------------------------------------------------------

def _getrf_crout(
    A: jnp.ndarray, v: int, precision: str = "highest", partition: int = 1,
    compaction: str = "gather",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Blocked CROUT (left-looking) LU with partial pivoting: each panel is
    updated ONCE by a single big-K GEMM against all previous factors, and
    each step's pivot rows get their full U row computed at selection time —
    nothing else is ever touched, so the whole-trailing-region
    read+write of the right-looking flat scheme (~4n^3/v bytes of HBM
    traffic — ~0.36 s at N=32768, a third of its runtime) disappears.
    The structural sibling of cholesky/single._potrf_flat (left-looking,
    measured 35.3 TF/s vs the right-looking LU's 24.6 on this chip) and of
    the reference's lazy per-rank panel reductions
    (src/conflux/lu/conflux_opt.hpp:618-648 reduce only the step column).

    Per step k (width w):

      * panel update: P = R[:, k:k+w] - R[:, :k] @ F[:k, k:k+w] — one
        [m_r, k] x [k, w] MXU GEMM (K grows with k: compute-bound shape,
        unlike the right-looking K=v re-read-bound trailing update);
      * masked-argmax panel factorization over live rows (shared machinery);
      * the panel-column write stores multipliers on live rows (the frozen
        L columns that feed future panel updates);
      * row block: the w winners' U row is finished NOW —
        U12 = L11^{-1} (raw - L_piv @ F[:k, k+w:]) via one [w, k] x
        [k, n-k-w] GEMM + TRSM — and the complete band
        [L_piv | lu_top | U12] lands in F at static row offset k;
      * live rows compact every `partition` steps (two row gathers, same
        vocabulary as the flat scheme; the raw trailing columns ride along
        unchanged).

    compaction selects HOW live rows stay contiguous:

      * 'gather' (default, the measured winner) — re-gather all live rows
        of the monolithic R into a fresh shrinking buffer every
        `partition` steps. The sorted full-width row gather runs near
        streaming rate (~550 GB/s effective: ~250 ms for ~68 GB r+w at
        N=32768, experiments/prof_crout_split.py) — only ~70 ms above
        the pure-memcpy floor.
      * 'split' — exploit that a crout R's trailing columns are NEVER
        WRITTEN (they hold raw A values until their panel or pivot step):
        carry the raw matrix T untouched at its original row positions
        plus a separately-compacted multiplier buffer Lbuf [m_live, k+w],
        so compaction moves ~1/3 the bytes and each panel is one
        [m_live, w] gather from T. Pivot-for-pivot AND bit-for-bit
        identical to 'gather'. MEASURED LOSER (2175 vs 943 ms at N=32768
        'high', experiments/prof_r3f.py): the per-panel [m_live, v]
        column-sliced gathers read 4 KB per row — narrow-slice gathers
        are descriptor-bound on this backend, while the monolithic
        full-row gather it replaces was already near streaming rate.
        Kept for A/B and as the bit-exactness witness of the state split.
      * 'swap' — the reference's `first_non_pivot_row` push-up
        (src/conflux/lu/conflux_opt.hpp:176-218) re-expressed with static
        shapes: R stays full-size with the live rows as a PREFIX whose
        length m-k is a Python int per step; each step the <= w live rows
        still parked in the outgoing tail segment are moved into the
        pivot slots vacated in the kept prefix (one w-row gather + one
        w-row scatter). MEASURED LOSER on this backend (1472 vs 942 ms at
        N=32768, experiments/prof_r3d.py): the w-row 2-D scatter into the
        full-size buffer defeats XLA's in-place analysis. Kept for A/B.
        `partition` is ignored (the frontier shrinks every step). Row
        order inside the live prefix differs from 'gather', so fp-tie
        pivots may legally differ (tests gate residuals, not pivot
        equality).

    Numerics: every stored value passes through ONE f32-accumulated GEMM
    instead of the right-looking scheme's Nt sequential rounded updates —
    strictly fewer roundings per entry (the win is largest for bf16
    STORAGE, where right-looking re-rounds the whole trailing matrix to
    bf16 every step).

    F is carried separately from R (factor order, returned directly); peak
    HBM = F + shrinking R + one [k, n-k-w] U-slice temp — ~8.5 GB at
    N=32768 f32, under the ~13 GB degradation cliff."""
    if compaction == "swap":
        return _getrf_crout_swap(A, v, precision)
    if compaction == "split":
        return _getrf_crout_split(A, v, precision)
    m, n = A.shape
    bf16s = A.dtype == jnp.bfloat16
    f32 = jnp.float64 if A.dtype == jnp.float64 else jnp.float32
    gmode = "bf16" if bf16s else precision   # f32-accumulated GEMM reads
    R = A
    origin = jnp.arange(m, dtype=jnp.int32)
    avail = jnp.ones(m, bool)
    F = jnp.zeros((m, n), A.dtype)
    perm = jnp.zeros(m, jnp.int32)
    dead = 0
    for k in range(0, n, v):
        w = min(v, n - k)
        m_r = R.shape[0]
        panel = jax.lax.slice(R, (0, k), (m_r, k + w)).astype(f32)
        if k > 0:
            # operands pass raw (f32 in f32 storage; bf16 under bf16s —
            # both the kernel and schur_dot cast single-pass modes)
            Utop = jax.lax.slice(F, (0, k), (k, k + w))
            Lleft = jax.lax.slice(R, (0, 0), (m_r, k))
            # DECIDED (r4 e2e A/B, results/r4_experiments.md): XLA's
            # dot_general wins the crout big-K shapes — 856.9 ms vs
            # 975.6 with ops/pallas_gemm.sub_matmul_pallas_bigk routed
            # here (measured with the pallas-chain breaker in place, so
            # the comparison is real, not a compile failure). The Mosaic
            # kernel stays available for kernel-level A/B only.
            panel = panel - schur_dot(Lleft, Utop, gmode)
        # raw variant: the [w, n] pivot-row refresh scatter is skipped —
        # the pivot rows' panel columns in R are never consumed raw
        # (dead-row slots retire at the next compaction); measured
        # 12.8 ms/run at N=32768. f32 storage additionally uses
        # merged=False: the elimination FINISHES the pivot lanes, so the
        # wide R[piv] gather below returns the merged factor in its panel
        # columns for free — no _pivot_factors pass (narrow [w]-row gather
        # at a ~3.5 ms fixed cost + a second w-long sequential elimination
        # chain per step). bf16 STORAGE keeps merged=True: lu_top must
        # stay f32 for the U12 TRSM, and a round-trip through bf16 R would
        # round L11 (multiplier-feeding path — CLAUDE.md invariant).
        piv, _, M, lu_top = factor_panel_raw(panel, avail, w, block=128,
                                             merged=bf16s)
        # multipliers for live rows feed future panel updates; dead rows'
        # slots are never read again (their factor row is already in F)
        R = jax.lax.dynamic_update_slice(
            R, jnp.where(avail[:, None], M, panel).astype(R.dtype), (0, k)
        )
        avail = avail.at[piv].set(False)
        dead += w
        # finish the winners' full factor row NOW: [L_piv | lu_top | U12],
        # each part dus'd straight into F (a concatenate would materialize
        # the [w, n] band once more — ~6 ms of extra copies per N=32768
        # run, /tmp/jaxtrace_crout single.py:442)
        Rpiv = R[piv]                              # [w, n] row gather
        if lu_top is None:
            lu_top = jax.lax.slice(Rpiv, (0, k), (w, k + w))  # merged rows
        if k > 0:
            F = jax.lax.dynamic_update_slice(F, Rpiv[:, :k], (k, 0))
        F = jax.lax.dynamic_update_slice(F, lu_top.astype(R.dtype), (k, k))
        if k + w < n:
            rhs = Rpiv[:, k + w :].astype(f32)
            if k > 0:
                Ut = jax.lax.slice(F, (0, k + w), (k, n))
                rhs = rhs - schur_dot(Rpiv[:, :k], Ut, gmode)
            U12 = trsm_left_lower_unit(unit_lower(lu_top), rhs,
                                       method="invert")
            F = jax.lax.dynamic_update_slice(F, U12.astype(R.dtype),
                                             (k, k + w))
        perm = jax.lax.dynamic_update_slice(perm, origin[piv], (k,))
        live = m_r - dead
        if _partition_now(dead, v, k, w, n, partition) and live > 0:
            rows = jnp.arange(m_r, dtype=jnp.int32)
            live_idx = jnp.sort(jnp.where(avail, rows, m_r))[:live]
            R = R[live_idx]
            origin = origin[live_idx]
            avail = jnp.ones(live, bool)
            dead = 0
    if m > n:
        # tail: never-pivoted rows hold completed L rows (their multiplier
        # columns were all written by panel writes), original order
        F = jax.lax.dynamic_update_slice(F, R, (n, 0))
        perm = jax.lax.dynamic_update_slice(perm, origin, (n,))
    return F, perm


def _getrf_crout_split(
    A: jnp.ndarray, v: int, precision: str = "highest",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Crout LU with 'split' compaction — see _getrf_crout's docstring.

    State: T = the input matrix, NEVER written or moved (a crout R's
    trailing columns hold raw values until their panel/pivot step, so the
    monolithic scheme's full-width compaction gathers move n-column rows
    of which only the first k+w are live data); `origin` [m_live] — the T
    row behind each live slot (ascending); Lbuf [m_live, k] — the live
    rows' multiplier columns, compacted EVERY step (the only moving
    state, ~1/3 the monolithic gather traffic integrated over the run);
    F/perm as in 'gather'.

    Pivot-for-pivot identical to 'gather' at partition=1: every GEMM and
    panel operand holds the same values in the same row order (asserted
    in tests/test_single_device.py). `partition` is ignored — the per-step
    Lbuf compaction IS the cheap operation this variant exists for."""
    m, n = A.shape
    bf16s = A.dtype == jnp.bfloat16
    f32 = jnp.float64 if A.dtype == jnp.float64 else jnp.float32
    gmode = "bf16" if bf16s else precision
    dt = A.dtype
    T = A
    origin = jnp.arange(m, dtype=jnp.int32)
    Lbuf = None                     # [m_live, k] multipliers (dt storage)
    F = jnp.zeros((m, n), dt)
    perm = jnp.zeros(m, jnp.int32)
    for k in range(0, n, v):
        w = min(v, n - k)
        m_live = m - k
        panel = T[origin, k : k + w].astype(f32)     # [m_live, w] gather
        if k > 0:
            Utop = jax.lax.slice(F, (0, k), (k, k + w))
            panel = panel - schur_dot(Lbuf, Utop, gmode)
        piv, _, M = factor_panel(panel, jnp.ones(m_live, bool), w, block=128)
        lu_top = M[piv]
        Lpiv = Lbuf[piv] if k > 0 else None          # [w, k] row gather
        parts = ([] if Lpiv is None else [Lpiv]) + [lu_top.astype(dt)]
        if k + w < n:
            rhs = T[origin[piv], k + w :].astype(f32)  # [w, n-k-w] gather
            if k > 0:
                Ut = jax.lax.slice(F, (0, k + w), (k, n))
                rhs = rhs - schur_dot(Lpiv.astype(f32), Ut, gmode)
            U12 = trsm_left_lower_unit(unit_lower(lu_top), rhs,
                                       method="invert")
            parts.append(U12.astype(dt))
        band = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        F = jax.lax.dynamic_update_slice(F, band, (k, 0))
        perm = jax.lax.dynamic_update_slice(perm, origin[piv], (k,))
        if m_live > w:
            rows = jnp.arange(m_live, dtype=jnp.int32)
            mask = jnp.ones(m_live, bool).at[piv].set(False)
            live_idx = jnp.sort(jnp.where(mask, rows, m_live))[: m_live - w]
            Mlive = M[live_idx].astype(dt)           # newborn multipliers
            Lbuf = (Mlive if Lbuf is None
                    else jnp.concatenate([Lbuf[live_idx], Mlive], axis=1))
            origin = origin[live_idx]
    if m > n:
        # tail: never-pivoted rows hold completed L rows (all n multiplier
        # columns live in Lbuf), original relative order
        F = jax.lax.dynamic_update_slice(F, Lbuf, (n, 0))
        perm = jax.lax.dynamic_update_slice(perm, origin, (n,))
    return F, perm


def _getrf_crout_swap(
    A: jnp.ndarray, v: int, precision: str = "highest",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Crout LU with 'swap' (push-up) compaction — see _getrf_crout's
    docstring. R stays one full-size [m, n] buffer whose live rows form a
    length-(m-k) PREFIX (k is a Python int per step, so every slice is
    static); each step moves the <= w live rows parked in the outgoing
    tail segment into the pivot slots of the kept prefix — the
    static-shape form of the reference's first_non_pivot_row push-up
    (src/conflux/lu/conflux_opt.hpp:176-218) — instead of re-gathering
    the whole live region."""
    m, n = A.shape
    bf16s = A.dtype == jnp.bfloat16
    f32 = jnp.float64 if A.dtype == jnp.float64 else jnp.float32
    gmode = "bf16" if bf16s else precision
    R = A
    origin = jnp.arange(m, dtype=jnp.int32)
    F = jnp.zeros((m, n), A.dtype)
    perm = jnp.zeros(m, jnp.int32)
    for k in range(0, n, v):
        w = min(v, n - k)
        m_live = m - k
        panel = jax.lax.slice(R, (0, k), (m_live, k + w)).astype(f32)
        if k > 0:
            Utop = jax.lax.slice(F, (0, k), (k, k + w))
            Lleft = jax.lax.slice(R, (0, 0), (m_live, k))
            # dot_general won the bigk e2e A/B (see _getrf_crout)
            panel = panel - schur_dot(Lleft, Utop, gmode)
        piv, _, M = factor_panel(panel, jnp.ones(m_live, bool), w, block=128)
        lu_top = M[piv]
        # full-height, un-offset panel write: rows past the live prefix
        # ride along unchanged so XLA's in-place analysis keeps the dus
        # aliasing R (CLAUDE.md: sub-height dus at a row offset de-aliases)
        Mw = M.astype(R.dtype)
        if m_live < m:
            Mw = jnp.concatenate(
                [Mw, jax.lax.slice(R, (m_live, k), (m, k + w))], axis=0)
        R = jax.lax.dynamic_update_slice(R, Mw, (0, k))
        # finish the winners' full factor row NOW (identical to 'gather')
        Rpiv = R[piv]
        parts = [Rpiv[:, :k], lu_top.astype(R.dtype)]
        if k + w < n:
            rhs = Rpiv[:, k + w :].astype(f32)
            if k > 0:
                Ut = jax.lax.slice(F, (0, k + w), (k, n))
                rhs = rhs - schur_dot(Rpiv[:, :k], Ut, gmode)
            U12 = trsm_left_lower_unit(unit_lower(lu_top), rhs,
                                       method="invert")
            parts.append(U12.astype(R.dtype))
        band = jnp.concatenate(parts, axis=1)
        F = jax.lax.dynamic_update_slice(F, band, (k, 0))
        perm = jax.lax.dynamic_update_slice(perm, origin[piv], (k,))
        # push-up: the tail segment [m_live-w, m_live) leaves the prefix;
        # its non-pivot (still-live) rows fill the pivot slots vacated
        # inside the kept prefix. Counts always match (w tail positions =
        # #pivots-in-tail + #movers; w pivots = #pivots-in-tail +
        # #slots-in-prefix); both index lists are ascending with sentinel
        # m padding, so valid entries pair up positionally and the
        # sentinel pairs are dropped by the scatter.
        m_live2 = m_live - w
        tail = m_live2 + jnp.arange(w, dtype=jnp.int32)
        in_piv = jnp.any(tail[:, None] == piv[None, :], axis=1)
        movers = jnp.sort(jnp.where(~in_piv, tail, m))
        slots = jnp.sort(jnp.where(piv < m_live2, piv, m))
        src = jnp.clip(movers, 0, m - 1)
        R = R.at[slots].set(R[src], mode="drop")
        origin = origin.at[slots].set(origin[src], mode="drop")
    if m > n:
        # live prefix rows hold completed L rows (multiplier columns all
        # written by panel writes); their origin order is NOT the input
        # order after swaps, which perm records
        F = jax.lax.dynamic_update_slice(
            F, jax.lax.slice(R, (0, 0), (m - n, n)), (n, 0))
        perm = jax.lax.dynamic_update_slice(
            perm, jax.lax.slice(origin, (0,), (m - n,)), (n,))
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


@partial(jax.jit, static_argnames=("v", "precision", "scheme", "partition",
                                   "compaction"))
def lu_factor(
    A: jnp.ndarray, v: int = 128, precision: str = "highest",
    scheme: str = "auto", partition: int = 1, compaction: str = "gather",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LU with partial pivoting: returns (F, perm) with
    A[perm] = unit_lower(F) @ upper(F).  `perm` maps factor row -> original
    row (the reference's `pivotIndsBuff`, conflux_opt.hpp:497-503).
    precision: 'highest' (f32), 'high' (bf16x3), 'bf16' (bf16 trailing
    GEMMs with f32 accumulation; panels stay f32).
    scheme: 'auto' picks by measured dispatch (v5e, experiments/prof_*):
    'recursive' (balanced TRSM tree) wins small problems but its ~N^2
    assembly temporaries OOM at N=32768; 'crout' (left-looking — one
    big-K panel GEMM per step, no whole-trailing-region traffic, one
    rounding per stored entry; see _getrf_crout) wins from N=16384
    (191.5 vs flat 193.3+ ms; 949 vs 1141 ms at N=32768 bf16x3) and is
    also the bf16-STORAGE default; 'flat' (right-looking, band-emitting,
    minimal working set) is kept for A/B and as the stepped-driver
    fallback.
    partition (flat/crout): band-emission / compaction cadence in steps
    (1 = every step, the measured v5e winner; 0 = only at the end)."""
    from conflux_tpu.errors import ConfluxError, ErrorCode

    m, n = A.shape
    if m < n:
        raise ConfluxError(ErrorCode.INVALID_SHAPE, "lu_factor expects m >= n")
    if A.dtype == jnp.bfloat16 and scheme not in ("flat", "crout"):
        # bf16-STORAGE mode: the flat and crout schemes carry the
        # mixed-precision plumbing (f32 panels/TRSMs, bf16 buffer)
        scheme = "crout"
    elif scheme == "auto":
        scheme = auto_scheme(m)
    if scheme == "recursive":
        return _getrf_rec(A, v, precision)
    if scheme == "crout":
        return _getrf_crout(A, v, precision, partition=partition,
                            compaction=compaction)
    return _getrf_flat(A, v, precision, partition=partition)


def auto_scheme(m: int) -> str:
    """Measured single-chip scheme dispatch (v5e,
    experiments/prof_flat_sweep.py + prof_crout.py 2026-08-18): the crout
    left-looking kernel wins from N=16384 (191.5 ms vs flat 193.3-207 at
    v=1024 bf16x3) and widens at N=32768 (949 vs 1141 ms — the
    whole-trailing-region HBM traffic it avoids grows with N); the
    recursive scheme's balanced TRSM tree wins smaller problems
    (57 vs 63 ms at N=8192)."""
    return "recursive" if m < 16384 else "crout"


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
