"""Single-device LU with partial pivoting, MXU-first.

The single-device analog of the reference's Python executable spec
(python/reference_lu.py `LUP`/`LUPv2`) and its per-rank hot loop
(LAPACKE_dgetrf panel + cblas_dtrsm + cblas_dgemm,
src/conflux/lu/conflux_opt.hpp:727,1347,1626-1634).

Two schemes:

  * "flat" (default): right-looking blocked LU in ONE buffer with LAZY,
    BATCHED row movement. Between "partition" events rows never move:
    pivoted ("dead") rows freeze in place — their multiplier entries in the
    trailing GEMM operand are masked to zero, so the Schur update leaves
    them untouched — and the current step's pivot rows receive the strict
    lower part of L11 as their multiplier row, which makes the SAME trailing
    GEMM write U12 into them in place (raw - strict(L11) @ U12 = U12 up to
    roundoff, since raw = L11 @ U12). When the dead fraction crosses a
    static threshold, one region row gather moves the finished rows (in
    factor order) to the top of the buffer and compacts the live rows, so
    panel heights and GEMM heights shrink. Measured on v5e
    (experiments/prof_trace4.py / prof_flat32k / prof_flat_inplace):
    per-STEP full-width compaction cost ~45 ms of pure HBM traffic per
    N=16384 run and, at N=32768, pushed the working set (S + F + gather
    temps ~13 GB) over the 16 GB HBM edge where the backend degrades ~100x
    (117-936 s); per-EPOCH partitioning bounds the masked-FLOP overhead at
    ~1/3 while keeping peak memory to one buffer plus one GEMM temp
    (N=32768 runs in 1.8 s where the old scheme took 117 s).
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

from conflux_tpu.ops.panel import factor_panel, select_pivots
from conflux_tpu.ops.tri import (
    schur_dot,
    trsm_left_lower_unit,
    trsm_right_upper,
    unit_lower,
    upper,
)

_PREC = jax.lax.Precision.HIGHEST


# ----------------------------------------------------------------------------
# Flat in-place scheme
# ----------------------------------------------------------------------------

def _getrf_flat(
    A: jnp.ndarray, v: int, precision: str = "highest",
    part: int = 1_000_000,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Blocked right-looking LU with lazy batched row movement (see module
    docstring). The buffer is split at a STATIC frontier `f`: rows [0:f) are
    finished factor rows in factor order; rows [f:) are the working region.
    Per step k (panel width w):

      * the masked panel factorization selects w pivots among the still-live
        region rows (`avail`) — dead rows can never win the masked argmax;
      * the panel-column write stores merged L\\U rows on the pivots and
        multipliers on live rows; dead rows keep their finished U values
        (their factor content in these columns was written when THEY
        pivoted);
      * ONE trailing GEMM serves three roles through its A-operand rows:
        multipliers for live rows (the Schur update), zeros for dead rows
        (frozen), and strict(L11) for this step's pivots — which turns their
        raw trailing content into U12 in place;
      * `part` sets the partition cadence (dead >= max(v, live // part)
        triggers ONE region gather splitting [finished (factor order) |
        live (order kept)]). Default: never mid-run — the v5e sweep
        (experiments/prof_flat_sweep.py, N=16384 v=512) measured 193 ms
        with no mid-run partitions vs 237-252 ms with part=1..6: the
        masked-GEMM overhead is cheaper on the MXU than the partition
        gathers' HBM traffic + the XLA copies they induce. The knob stays
        for re-tuning on other topologies.

    Data-movement vocabulary per measured v5e costs
    (experiments/prof_gather.py): full-width row gathers and 1-D index
    scatters are fast; 2-D row scatters lower to SERIAL loops and are
    avoided (the onehot @ strict(L11) GEMM is the row-scatter workaround).
    Replaces the reference's physical row compaction (push_pivots_up /
    first_non_pivot_row, conflux_opt.hpp:176-218)."""
    m, n = A.shape
    # bf16 STORAGE mode (A arrives as bfloat16): the buffer, the factor, and
    # the trailing updates stay bf16 (f32 MXU accumulation, one rounding per
    # step) while panels, pivot selection, and TRSMs run in f32. Halves HBM:
    # N=65536 (8.6 GB) fits a single chip — the reference's second-largest
    # demonstrated config (README.md:96-106). The trailing add is CHUNKED
    # over column blocks so no [m, t]-sized GEMM temp doubles the footprint.
    bf16s = A.dtype == jnp.bfloat16
    f32 = jnp.float32
    chunk = 8192
    R = A                            # working region, shrinks per partition
    origin = jnp.arange(m, dtype=jnp.int32)   # original A-row per R row
    avail = jnp.ones(m, bool)        # live mask over R rows
    dead = 0                         # static: finished rows still in R
    pend = []                        # per-step piv since last partition
    bands = []                       # finished [dead, n] bands, factor order
    perm_parts = []
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
        # panel-column write: pivot rows get lu_top (M carries it there),
        # live rows their multipliers, dead rows keep their U values
        R = jax.lax.dynamic_update_slice(
            R, jnp.where(avail[:, None], M, panel).astype(R.dtype), (0, k)
        )
        pend.append(piv)
        avail = avail.at[piv].set(False)       # 1-D scatter (fast)
        if k + w < n:
            Rpiv = R[piv]                      # [w, n] row gather (fast)
            L11 = unit_lower(lu_top)
            U12 = trsm_left_lower_unit(L11, Rpiv[:, k + w :].astype(f32),
                                       method="invert")
            # one GEMM updates live rows AND writes U12 into pivot rows:
            # pivot row j's multiplier is strict(L11)[j], so it receives
            # raw_j - (L11 @ U12 - U12)[j] = U12[j] + O(eps).
            onehot = (
                jnp.arange(m_r, dtype=jnp.int32)[:, None] == piv[None, :]
            ).astype(f32)
            # full f32 precision: this product flows into U12 through a
            # cancellation (raw - L11 @ U12), so lowering it to bf16x3
            # injects ~1e-5-level absolute error into the U factor
            Mgemm = jnp.where(avail[:, None], M, 0.0) + jnp.dot(
                onehot, jnp.tril(lu_top, -1), precision=_PREC
            )
            if bf16s:
                # chunked bf16-out updates: each [m_r, chunk] result tile is
                # 2 bytes/elt and dies into the aliased add immediately
                for c0 in range(k + w, n, chunk):
                    c1 = min(c0 + chunk, n)
                    R = R.at[:, c0:c1].add(
                        -schur_dot(Mgemm, U12[:, c0 - k - w : c1 - k - w],
                                   "bf16out")
                    )
            else:
                R = R.at[:, k + w :].add(-schur_dot(Mgemm, U12, precision))
        dead += w
        live = m_r - dead
        # PARTITION: the finished rows leave R as one [dead, n] band in
        # factor order and the live rows compact (order kept) — panels and
        # GEMMs shrink while dead-row masking overhead stays <= ~1/3. Both
        # moves are plain row gathers producing fresh buffers, so the
        # per-step dus/add chain above keeps aliasing R in place (offset
        # sub-slicing of one big buffer defeated XLA's in-place analysis:
        # +120 ms of copies at N=16384, experiments/prof_trace5.py). The
        # schedule is static, so every shape stays compile-time known.
        if dead >= max(v, live // part) or k + w >= n:
            done_idx = jnp.concatenate(pend)
            bands.append(R[done_idx])
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


@partial(jax.jit, static_argnames=("v", "precision", "scheme"))
def lu_factor(
    A: jnp.ndarray, v: int = 128, precision: str = "highest",
    scheme: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LU with partial pivoting: returns (F, perm) with
    A[perm] = unit_lower(F) @ upper(F).  `perm` maps factor row -> original
    row (the reference's `pivotIndsBuff`, conflux_opt.hpp:497-503).
    precision: 'highest' (f32), 'high' (bf16x3), 'bf16' (bf16 trailing
    GEMMs with f32 accumulation; panels stay f32).
    scheme: 'auto' picks by measured dispatch (v5e, experiments/prof_*):
    'recursive' is ~15% faster up to N=16384 but its ~N^2 assembly
    temporaries OOM at N=32768; 'flat' (band-emitting, minimal working set)
    is the only scheme that fits N=32768 in 16 GB HBM."""
    from conflux_tpu.errors import ConfluxError, ErrorCode

    m, n = A.shape
    if m < n:
        raise ConfluxError(ErrorCode.INVALID_SHAPE, "lu_factor expects m >= n")
    if A.dtype == jnp.bfloat16:
        # bf16-STORAGE mode (see _getrf_flat): only the flat scheme carries
        # the mixed-precision plumbing (f32 panels/TRSMs, bf16 buffer)
        scheme = "flat"
    elif scheme == "auto":
        scheme = auto_scheme(m)
    if scheme == "recursive":
        return _getrf_rec(A, v, precision)
    return _getrf_flat(A, v, precision)


def auto_scheme(m: int) -> str:
    """Measured single-chip scheme dispatch (v5e,
    experiments/prof_flat_sweep.py): the no-movement flat kernel wins from
    N=16384 (193 vs 199 ms) and is the only scheme whose working set fits
    N=32768; the recursive scheme's balanced TRSM tree wins smaller problems
    (57 vs 63 ms at N=8192)."""
    return "recursive" if m < 16384 else "flat"


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
