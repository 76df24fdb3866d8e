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

# precision of the LONG-K outer-block subtraction GEMMs in the two-level
# substitution solvers only (the dominant TRSM FLOPs at the crout
# headline). Unlike the panel's inter-block updates (Nt-deep sequential
# error compounding), the outer subtraction chain is only n/_TRSM_OUTER
# (= 6 at v=1536) deep per solve. Env knob for A/B probes; default
# HIGHEST until measured against the 1e-6 residual gate
# (experiments/prof_trsm_prec.py).
import os as _os

_OPREC = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
}[_os.environ.get("CONFLUX_TRSM_OUTER_PREC", "highest")]

_PREC_MAP = {
    "highest": jax.lax.Precision.HIGHEST,  # f32 (6-pass on the MXU)
    "high": jax.lax.Precision.HIGH,        # bf16x3 (~f32-faithful, 2x faster)
}


def schur_dot(a: jnp.ndarray, b: jnp.ndarray, mode: str = "highest",
              bt: bool = False):
    """Trailing-update (Schur complement) matmul with a selectable precision
    mode. 'bf16' casts the operands to bfloat16 with f32 accumulation — the
    mixed-precision trailing update of BASELINE config 5 (panel math stays
    f32 at the call sites); 'bf16out' is 'bf16' plus a bfloat16-rounded
    RESULT for the bf16-STORAGE mode. The accumulation must stay f32: asking
    the MXU for a bf16 result directly (preferred_element_type=bfloat16)
    makes it accumulate in bf16 too — measured 1.7e-1 raw residual at
    N=8192 vs ~2e-2 with f32 accumulation + explicit output rounding (the
    convert fuses into the dot epilogue); 'high'/'highest' keep f32
    operands.

    bt=True contracts b's LAST dim (a @ b.T without materializing the
    transpose — the MXU takes either contraction layout); callers that
    carry an operand transposed so its per-step writes are column-offset
    dus (which XLA keeps in place, CLAUDE.md) read it back this way."""
    dn = (((1,), (1,) if bt else (0,)), ((), ()))
    if mode in ("bf16", "bf16out"):
        out = jax.lax.dot_general(
            a.astype(jnp.bfloat16),
            b.astype(jnp.bfloat16),
            dn,
            preferred_element_type=jnp.float32,
        )
        return out.astype(jnp.bfloat16) if mode == "bf16out" else out
    return jax.lax.dot_general(a, b, dn, precision=_PREC_MAP[mode])


def unit_lower(lu: jnp.ndarray) -> jnp.ndarray:
    """Extract the unit lower-triangular factor from merged L\\U.

    Handles both orientations of the trapezoid: tall [m, n] (m >= n, the
    lu_factor output — L is [m, n]) and wide [n, m] (panel factors with an
    eliminated right block — L is the square [n, n] part)."""
    m, n = lu.shape
    k = min(m, n)
    return jnp.tril(lu[:, :k], -1) + jnp.eye(m, k, dtype=lu.dtype)


def upper(lu: jnp.ndarray) -> jnp.ndarray:
    """Extract the square [k, k] (k = min(m, n)) upper-triangular factor
    from merged L\\U, for both tall and wide trapezoids."""
    m, n = lu.shape
    k = min(m, n)
    return jnp.triu(lu[:k, :k] if m >= n else lu[:, :k])


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


# Method choice (measured on v5e, LU N=8192): XLA's TriangularSolve
# ('solve') slightly beats the blocked-substitution path ('invert') inside
# the full factorization (54 vs 59 ms), so 'solve' is the default; 'invert'
# remains for the distributed kernels where it composes with masking.
#
# Stability note: triangular factors of pivoted matrices can be extremely
# ill-conditioned (unit-triangular matrices with +-O(1) multipliers have
# inverses growing like c^n — Viswanath/Trefethen), so a TRSM must NEVER form
# the full inverse of a large triangle: inv entries overflow f32 precision
# and the inverse-multiply cancels catastrophically (observed: LU growth
# blow-up to 1e9 at N=8192). The MXU-friendly *stable* formulation is blocked
# forward/backward substitution where only small (<=32) diagonal blocks are
# inverted and everything else is GEMMs — the standard HPL-on-accelerator
# scheme. `method='invert'` below means this blocked scheme.

_TRSM_SUB = 32    # diagonal-block size: c^32 amplification stays f32-safe
_TRSM_OUTER = 256  # long-K GEMM row-block: full MXU sublane fill


def _inv_diag_blocks(T: jnp.ndarray, transpose: bool) -> jnp.ndarray:
    """Inverses of ALL _TRSM_SUB-wide unit-lower diagonal blocks of T as one
    BATCHED nilpotent squaring [nb, s, s] — the blocks are independent, so
    computing them upfront replaces ~n/s serial tiny-dot chains (measured
    ~12 ms of 0.5 us ops per N=32768 'high' factorization,
    /tmp/jaxtrace_crout tri.py:79-80) with ~log2(s) batched matmuls.
    `transpose=True` inverts the TRANSPOSED blocks (for unit-UPPER
    diagonals, used by the right-upper solve). A ragged tail block is
    padded with identity (inv(blockdiag(X, I)) top-left == inv(X))."""
    n = T.shape[0]
    s = _TRSM_SUB
    eye = jnp.eye(s, dtype=T.dtype)
    blocks = []
    for i0 in range(0, n, s):
        i1 = min(i0 + s, n)
        blk = T[i0:i1, i0:i1]
        if transpose:
            blk = blk.T
        if i1 - i0 < s:
            blk = jax.lax.dynamic_update_slice(eye, blk, (0, 0))
        blocks.append(blk)
    D = jnp.stack(blocks)
    M = eye[None] - D
    acc = eye[None] + M
    span = 2
    while span < s:
        M = jnp.matmul(M, M, precision=_PREC)
        acc = acc + jnp.matmul(acc, M, precision=_PREC)
        span *= 2
    return acc


def _solve_unit_lower_blocked(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """X = L^{-1} B via TWO-LEVEL blocked forward substitution (L unit
    lower): only <=_TRSM_SUB diagonal blocks are ever inverted (the c^32
    stability bound), but the long-K already-solved contributions are
    subtracted per _TRSM_OUTER row block, so those GEMMs have 256 output
    rows (full MXU fill) instead of 32 (25% sublane fill — measured
    15.7 TF/s for the flat single-level sweep at the N=32768 crout
    headline, experiments/prof_crout_trace.py). Same multiply/add set as
    the single-level sweep, regrouped K-partition (f32 HIGHEST both)."""
    n = L.shape[0]
    if n <= _TRSM_SUB:
        return jnp.dot(_inv_unit_lower_small(L), B, precision=_PREC)
    inv = _inv_diag_blocks(L, transpose=False)
    X = jnp.zeros_like(B)
    for o0 in range(0, n, _TRSM_OUTER):
        o1 = min(o0 + _TRSM_OUTER, n)
        rhs_o = B[o0:o1]
        if o0 > 0:  # one [<=256, o0] x [o0, cols] GEMM per outer block
            rhs_o = rhs_o - jnp.dot(L[o0:o1, :o0], X[:o0], precision=_OPREC)
        Xo = jnp.zeros_like(rhs_o)
        for i0 in range(o0, o1, _TRSM_SUB):
            i1 = min(i0 + _TRSM_SUB, o1)
            rhs = rhs_o[i0 - o0 : i1 - o0]
            if i0 > o0:  # short-K (< _TRSM_OUTER) intra-block update
                rhs = rhs - jnp.dot(
                    L[i0:i1, o0:i0], Xo[: i0 - o0], precision=_PREC
                )
            Xi = jnp.dot(
                inv[i0 // _TRSM_SUB, : i1 - i0, : i1 - i0], rhs,
                precision=_PREC,
            )
            Xo = jax.lax.dynamic_update_slice(Xo, Xi, (i0 - o0, 0))
        X = X.at[o0:o1].set(Xo)
    return X


def _solve_right_upper_blocked(B: jnp.ndarray, U: jnp.ndarray) -> jnp.ndarray:
    """X = B U^{-1} via two-level blocked substitution (left-to-right
    column blocks; see _solve_unit_lower_blocked for the blocking)."""
    n = U.shape[0]
    d = jnp.diagonal(U)
    d = jnp.where(d == 0, jnp.ones((), U.dtype), d)
    Uu = U / d[:, None]  # unit upper; U = D Uu row-scaled
    inv = _inv_diag_blocks(Uu, transpose=True)
    X = jnp.zeros_like(B)
    for o0 in range(0, n, _TRSM_OUTER):
        o1 = min(o0 + _TRSM_OUTER, n)
        rhs_o = B[:, o0:o1]
        if o0 > 0:
            rhs_o = rhs_o - jnp.dot(
                X[:, :o0], Uu[:o0, o0:o1], precision=_OPREC
            )
        Xo = jnp.zeros_like(rhs_o)
        for j0 in range(o0, o1, _TRSM_SUB):
            j1 = min(j0 + _TRSM_SUB, o1)
            rhs = rhs_o[:, j0 - o0 : j1 - o0]
            if j0 > o0:
                rhs = rhs - jnp.dot(
                    Xo[:, : j0 - o0], Uu[o0:j0, j0:j1], precision=_PREC
                )
            inv_jj = inv[j0 // _TRSM_SUB, : j1 - j0, : j1 - j0].T
            Xo = jax.lax.dynamic_update_slice(
                Xo, jnp.dot(rhs, inv_jj, precision=_PREC), (0, j0 - o0)
            )
        X = X.at[:, o0:o1].set(Xo)
    return X / d[None, :]


@partial(jax.jit, static_argnames=("method",))
def trsm_left_lower_unit(L: jnp.ndarray, B: jnp.ndarray, method: str = "solve"):
    """X = L^{-1} B with L unit lower (the A01 update,
    conflux_opt.hpp:1539)."""
    if method == "invert":
        return _solve_unit_lower_blocked(L, B)
    return jsl.solve_triangular(L, B, lower=True, unit_diagonal=True)


@partial(jax.jit, static_argnames=("method",))
def trsm_right_upper(B: jnp.ndarray, U: jnp.ndarray, method: str = "solve"):
    """X = B U^{-1} with U upper (the A10 update, conflux_opt.hpp:1347)."""
    if method == "invert":
        return _solve_right_upper_blocked(B, U)
    return jsl.solve_triangular(U.T, B.T, lower=True).T


@partial(jax.jit, static_argnames=("method",))
def trsm_right_lower_t(B: jnp.ndarray, L: jnp.ndarray, method: str = "solve"):
    """X = B L^{-T} with L lower (the Cholesky A10 update,
    Cholesky.cpp:450)."""
    if method == "invert":
        return _solve_right_upper_blocked(B, L.T)
    return jsl.solve_triangular(L, B.T, lower=True).T


@jax.jit
def potrf_tile(A: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky of a v x v tile.

    Our own replacement for `LAPACKE_dpotrf` (Cholesky.cpp:188-194). For an
    SPD tile, unpivoted LU is the LDL^T factorization (A = Lu D Lu^T with
    D = diag(U)), so the Cholesky factor is Lu * sqrt(D) — which routes the
    whole elimination through the fused Mosaic rank-1 kernel
    (ops/panel.lu_nopivot) instead of a sequential per-column fori_loop
    (measured ~21 ms of while-loops per N=16384 factorization before).
    Nonpositive diagonal entries (non-SPD input) zero their column —
    junk-but-finite degradation, matching the framework's zero-pivot
    convention."""
    from conflux_tpu.ops.panel import lu_nopivot  # cycle-free

    M = lu_nopivot(A)
    d = jnp.diagonal(M)
    s = jnp.sqrt(jnp.maximum(d, jnp.zeros((), A.dtype)))
    return (jnp.tril(M, -1) + jnp.eye(A.shape[0], dtype=A.dtype)) * s[None, :]
