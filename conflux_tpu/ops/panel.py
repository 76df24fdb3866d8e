"""Panel factorization kernels: masked partial-pivoting row selection.

This is the static-shape, jit-compatible replacement for the reference's
`LAPACKE_dgetrf`-based local pivot machinery (`LUP`,
src/conflux/lu/conflux_opt.hpp:143-175, and python/reference_lu.py): instead
of physically swapping and compacting rows, we carry a validity mask and a
pivot index vector.  Invalid rows (already pivoted in an earlier step, or
padding in a tournament candidate block) simply never win the masked argmax —
the same effect as the reference's `first_non_pivot_row` compaction without
any data-dependent shapes.

PIPELINE (v5e-measured design, experiments/prof_trace*.py): the panel lives
TRANSPOSED [n, m] for the whole factorization — one transpose in, one out.
Per `_BLOCK`-wide column block, a fused Pallas kernel (TPU) or a jnp
fori_loop (CPU) runs the rank-1 eliminations on the [block, m] sublane rows;
between blocks the trailing panel columns are updated with two MXU
dot_generals in transposed space (pivot-lane extraction via a one-hot
contraction, then the multiplier outer product). Pivot lanes go stale after
their block — nobody reads them again — and the merged factor of the
selected rows is recomputed once at the end by a forced elimination of the
gathered pivot rows (numerically equivalent; the per-block transposes and
concatenates this avoids were the single largest cost of the whole
factorization at N=16384).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST
# NOTE: do NOT lower the inter-block update precision to bf16x3 — the panel
# elimination is a sequential error-compounding recurrence, and bf16x3 on
# the three update dots degrades the f32 whole-factorization residual from
# ~1.6e-6 to 3.6e-5 at N=4096 (measured in isolation WITH the base=32
# inverse fix, 2026-08-17) for only ~5 ms at N=16384

# precision of the one-hot EXTRACTION dots only (Tpiv / lu_blk / lu_g /
# finish scatters): these are pure selections — every output element is a
# sum with exactly one nonzero product — so bf16x3 reconstructs the
# selected f32 value to <= 2^-25 relative (a half-ulp wobble on operands,
# backward-stability-harmless), unlike the accumulating update dots above.
# Env knob for A/B probes; default HIGHEST until the headline measurement
# lands (experiments/prof_panel_attr2.py).
import os as _os

_XPREC = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
}[_os.environ.get("CONFLUX_EXTRACT_PREC", "highest")]

# rank-1 loop width; trailing panel columns are updated by MXU dots between
# blocks. Swept on v5e (experiments/prof_panel.py): widths 32-128 are within
# ~10% (per-iteration argmax/control dominates); 64 measured best.
_BLOCK = 64


def _use_pallas(m: int, dtype) -> bool:
    """The fused Mosaic kernel runs on real TPU backends only (CPU test
    meshes take the pure-jnp path) and within its VMEM budget."""
    try:
        from conflux_tpu.ops.pallas_panel import MAX_M
    except ImportError:  # pragma: no cover
        return False
    backend = jax.default_backend()
    return backend not in ("cpu",) and m <= MAX_M and dtype == jnp.float32


def _rank1_block_t(Mt, availf, j0: int, forced: bool, finish: bool = False):
    """jnp twin of the fused Mosaic kernel (ops/pallas_panel._rank1_kernel)
    on a TRANSPOSED [w, m] block, kept structurally IDENTICAL (two-level:
    [_SUB, m] rank-1 micro-panel passes + one deferred MXU update per
    micro-panel boundary) so the CPU path and the TPU kernel stay
    numerically aligned — a drifting twin can flip a masked argmax.

    Mt [w, m]; availf [1, m] f32 (1.0 = selectable). Returns
    (Mt' [w, m], availf' [1, m], piv [w] i32, ok [w] bool)."""
    from conflux_tpu.ops.pallas_panel import _LEAF, _SUB

    w, m = Mt.shape
    dt = Mt.dtype
    lanes = jnp.arange(m)[None, :]
    piv = jnp.zeros(w, jnp.int32) + 0 * availf[0, :w].astype(jnp.int32)
    ok = jnp.zeros(w, bool) | (availf[0, :w] < -1)
    leafing = 0 < _LEAF < _SUB and _SUB % _LEAF == 0

    def dotg(a, b, dims):
        return jax.lax.dot_general(a, b, (dims, ((), ())), precision=_PREC)

    def deferred(Mt, availf, piv, ok, d0, d1, e):
        """MXU update of rows [d1, e) by the factored rows [d0, d1) — the
        twin of the kernel's leaf/micro-panel boundary updates (which mask
        a fixed-width slab instead of slicing exactly: numerically
        identical, masked rows receive an exact 0.0 FMA)."""
        b = d1 - d0
        pivw = jax.lax.slice(piv, (d0,), (d1,))
        okb = jax.lax.slice(ok, (d0,), (d1,))
        onehot = ((lanes == pivw[:, None]) & okb[:, None]).astype(dt)
        Msub = jax.lax.slice(Mt, (d0, 0), (d1, m))
        T = jax.lax.slice(Mt, (d1, 0), (e, m))
        G = dotg(Msub, onehot, ((1,), (1,)))                      # [b, b]
        Tpiv = dotg(T, onehot, ((1,), (1,)))                      # [e-d1, b]
        eye = jnp.eye(b, dtype=dt)
        # inv(L11).T via the nilpotent Neumann product, exact for index <= b
        St = jnp.triu(G, 1)
        invT = eye - St
        P = St
        p = 2
        while p < b:
            P = dotg(P, P, ((1,), (0,)))
            invT = dotg(eye + P, invT, ((1,), (0,)))
            p *= 2
        U12 = dotg(Tpiv, invT, ((1,), (0,)))
        Lmul = jnp.where(availf > 0, Msub, 0.0)
        Tnew = T - dotg(U12, Lmul, ((1,), (0,)))
        if forced or finish:
            # finish the block's pivot lanes: their deferred rows get the
            # exact U12 (merged-factor U values) instead of going stale —
            # mirrors the Mosaic kernel's forced/finish write
            anyp = jnp.sum(onehot, axis=0, keepdims=True) > 0
            Tnew = jnp.where(anyp, dotg(U12, onehot, ((1,), (0,))), Tnew)
        return jax.lax.dynamic_update_slice(Mt, Tnew, (d1, 0))

    for s0 in range(0, w, _SUB):
        b = min(_SUB, w - s0)
        s1 = s0 + b

        def body(jloc, state, s0=s0, b=b):
            sub_iota = jnp.arange(b)[:, None]
            Mtb, avail, piv, ok = state
            jj = s0 + jloc
            col = jax.lax.dynamic_slice(Mtb, (jj, 0), (1, m))
            if forced:
                p = jnp.asarray(j0 + jj, jnp.int32)
            else:
                score = jnp.where(avail > 0, jnp.abs(col), -jnp.inf)
                p = jnp.argmax(score).astype(jnp.int32)
            is_p = lanes == p
            piv = jax.lax.dynamic_update_slice(piv, p[None], (jj,))
            okv = jnp.sum(jnp.where(is_p, avail, 0.0)) > 0
            ok = jax.lax.dynamic_update_slice(ok, okv[None], (jj,))
            pv = jnp.sum(jnp.where(is_p, col, 0.0))
            safe = jnp.where(pv == 0, jnp.ones((), dt), pv)
            mult = jnp.where((avail > 0) & ~is_p, col / safe, 0.0)
            Msub = jax.lax.dynamic_slice(Mtb, (s0, 0), (b, m))
            pivcol = jnp.sum(jnp.where(is_p, Msub, 0.0), axis=1,
                             keepdims=True)
            pivcol = jnp.where(sub_iota > jloc, pivcol, 0.0)
            Mtb = jax.lax.dynamic_update_slice(
                Mtb, Msub - pivcol * mult, (s0, 0))
            newrow = jnp.where((avail > 0) & ~is_p, mult, col)
            Mtb = jax.lax.dynamic_update_slice(Mtb, newrow, (jj, 0))
            avail = jnp.where(is_p, 0.0, avail)
            return Mtb, avail, piv, ok

        if leafing and b == _SUB:
            # three-level: _LEAF-wide rank-1 leaves + inner deferred
            # updates of the micro-panel rest (twin of the kernel's
            # leaf_level; exact slices instead of its masked slab)
            for l0 in range(s0, s1, _LEAF):
                l1 = l0 + _LEAF
                Mt, availf, piv, ok = jax.lax.fori_loop(
                    0, _LEAF, partial(body, s0=l0, b=_LEAF),
                    (Mt, availf, piv, ok)
                )
                if l1 < s1:
                    Mt = deferred(Mt, availf, piv, ok, l0, l1, s1)
        else:
            Mt, availf, piv, ok = jax.lax.fori_loop(
                0, b, body, (Mt, availf, piv, ok)
            )
        if s1 >= w:
            continue
        # deferred update of rows [s1, w) — see the Mosaic kernel
        Mt = deferred(Mt, availf, piv, ok, s0, s1, w)
    return Mt, availf, piv, ok


def _rank1_dispatch(Bt, availf, j0: int, forced: bool, finish: bool = False):
    if _use_pallas(Bt.shape[1], Bt.dtype):
        from conflux_tpu.ops.pallas_panel import rank1_block_pallas_t

        Bt2, availf2, pivw, okw = rank1_block_pallas_t(
            Bt, availf, forced, j0, finish=finish
        )
        return Bt2, availf2, pivw, okw > 0
    return _rank1_block_t(Bt, availf, j0, forced, finish)


# outer K-regrouping width of the inter-block updates: per-`_BLOCK`
# deferred updates touch only their GROUP's rows, and the rows beyond the
# group receive ONE K=_GROUP update per group boundary — the panel-level
# analog of the two-level TRSM (tri.py) and of the kernel's micro-panels.
# Single-level per-block updates rewrote the whole remaining [rest, m]
# transposed panel at every 128-block boundary (~46 GB / ~62 ms of the
# N=32768 v=1536 crout headline, /tmp/jaxtrace_crout panel.py:195-212) at
# K=128 operand re-read efficiency (21.3 TF/s).
_GROUP = 512


def _lu_select_loop_t(panel, active, npiv: int, forced: bool, block=None,
                      finish: bool = False):
    """Transposed TWO-LEVEL blocked elimination loop. panel [m, n] with
    n == npiv; active [m] bool. Returns (piv [npiv] i32, ok [npiv] bool,
    Pt [npiv, m]) where Pt rows are the eliminated panel COLUMNS;
    non-pivot lanes hold their multipliers. With finish=False pivot lanes
    are stale beyond their own block (the callers recompute the merged
    pivot factor with `_pivot_factors`); with finish=True every deferred
    update also writes the pivot lanes' exact U12 (one extra one-hot MXU
    dot per boundary), so Pt's pivot lane p_j holds the full merged-factor
    row lu[j, :] — L multipliers below its elimination row, U values at
    and beyond — and no `_pivot_factors` pass (narrow [npiv]-row gather +
    a second npiv-long sequential elimination chain) is needed."""
    m, n = panel.shape
    if n != npiv:
        raise ValueError(f"panel width {n} must equal npiv {npiv}")
    block = block or _BLOCK
    group = max(_GROUP, block)

    from conflux_tpu.ops.tri import _inv_lower_rec, trsm_right_lower_t

    # derive carries from BOTH inputs so their varying-manual-axes are the
    # union of panel's and active's under shard_map
    zb = jnp.zeros_like(active) | jnp.zeros_like(panel[:, 0], dtype=bool)
    availf = jnp.where(zb, 0.0, active.astype(panel.dtype))[None, :]
    Pt = panel.T + 0.0 * availf
    piv = jnp.zeros(npiv, jnp.int32) + zb[:npiv].astype(jnp.int32)
    ok = zb[:npiv]
    lanes = jnp.arange(m)

    def onehot_of(pivw, okb):
        # pivot-lane extraction as one-hot MXU contractions.
        # (A lane-dim jnp.take is exact and FLOP-free but measured SLOWER
        # end-to-end: 974.6 vs 942.4 ms at the N=32768 crout headline —
        # TPU gathers on the minor dimension don't vectorize; the MXU
        # one-hot dot wins. prof_r3e 2026-08-18.)
        return ((lanes[None, :] == pivw[:, None]) & okb[:, None]
                ).astype(panel.dtype)

    for g0 in range(0, npiv, group):
        g1 = min(g0 + group, npiv)
        for b0 in range(g0, g1, block):
            b1 = min(b0 + block, g1)
            bw = b1 - b0
            Bt = jax.lax.slice(Pt, (b0, 0), (b1, m))
            Bt2, availf2, pivw, okb = _rank1_dispatch(Bt, availf, b0, forced,
                                                      finish)
            piv = jax.lax.dynamic_update_slice(piv, pivw, (b0,))
            ok = jax.lax.dynamic_update_slice(ok, okb, (b0,))
            Pt = jax.lax.dynamic_update_slice(Pt, Bt2, (b0, 0))
            availf = availf2
            if b1 < g1:
                # inner deferred update: only the GROUP's remaining rows
                T_t = jax.lax.slice(Pt, (b1, 0), (g1, m))
                onehot = onehot_of(pivw, okb)            # [bw, m]
                Tpiv_t = jax.lax.dot_general(
                    T_t, onehot, (((1,), (1,)), ((), ())), precision=_XPREC
                )                                        # [grp rest, bw]
                lu_blk = jax.lax.dot_general(
                    Bt2, onehot, (((1,), (1,)), ((), ())), precision=_XPREC
                ).T                                      # [bw piv, bw cols]
                L11 = jnp.tril(lu_blk, -1) + jnp.eye(bw, dtype=panel.dtype)
                # base=32: never form an explicit inverse of a triangle
                # wider than 32 (pivot-multiplier triangles amplify like
                # c^n; at block=128 the default base-128 inverse degraded
                # the f32 whole-factorization residual from ~1e-6 to 3e-5)
                U12t = jnp.dot(
                    Tpiv_t, _inv_lower_rec(L11, unit=True, base=32).T,
                    precision=_PREC,
                )                                        # [grp rest, bw]
                # rows still in play hold this block's multipliers
                Lmul_t = jnp.where(availf2 > 0, Bt2, 0.0)  # [bw, m]
                T_t = T_t - jnp.dot(U12t, Lmul_t, precision=_PREC)
                if forced:
                    # forced pivots are lanes b0..b1: keep their rows exact
                    # (U12t is [grp rest, bw] — exactly T_t's lanes b0..b1)
                    T_t = jax.lax.dynamic_update_slice(T_t, U12t, (0, b0))
                elif finish:
                    # unforced pivot lanes are scattered: one-hot scatter
                    # of the exact U12 (0/1 operand at HIGHEST — lossless)
                    anyp = jnp.sum(onehot, axis=0, keepdims=True) > 0
                    T_t = jnp.where(
                        anyp, jnp.dot(U12t, onehot, precision=_XPREC), T_t)
                Pt = jax.lax.dynamic_update_slice(Pt, T_t, (b1, 0))
        if g1 < npiv:
            # outer K=(g1-g0) update of everything beyond the group. The
            # group's merged factor extraction is FRESH everywhere it is
            # read: entry (row i, lane p_j) was final when row i was
            # eliminated, and dead lanes are frozen by the avail masks
            # (kernel + deferred updates never touch them).
            gw = g1 - g0
            pivg = jax.lax.slice(piv, (g0,), (g1,))
            okg = jax.lax.slice(ok, (g0,), (g1,))
            onehot_g = onehot_of(pivg, okg)              # [gw, m]
            Bt_g = jax.lax.slice(Pt, (g0, 0), (g1, m))
            T_t = jax.lax.slice(Pt, (g1, 0), (npiv, m))
            Tpiv_t = jax.lax.dot_general(
                T_t, onehot_g, (((1,), (1,)), ((), ())), precision=_XPREC
            )                                            # [rest, gw]
            lu_g = jax.lax.dot_general(
                Bt_g, onehot_g, (((1,), (1,)), ((), ())), precision=_XPREC
            ).T                                          # [gw piv, gw cols]
            L11_g = jnp.tril(lu_g, -1) + jnp.eye(gw, dtype=panel.dtype)
            # gw-wide triangle: blocked substitution (32-wide inverses
            # only), NOT an explicit gw-wide inverse — same stability rule
            # as the TRSMs
            U12t = trsm_right_lower_t(Tpiv_t, L11_g, method="invert")
            Lmul_g = jnp.where(availf > 0, Bt_g, 0.0)    # [gw, m]
            T_t = T_t - jnp.dot(U12t, Lmul_g, precision=_PREC)
            if forced:
                T_t = jax.lax.dynamic_update_slice(T_t, U12t, (0, g0))
            elif finish:
                anyp = jnp.sum(onehot_g, axis=0, keepdims=True) > 0
                T_t = jnp.where(
                    anyp, jnp.dot(U12t, onehot_g, precision=_XPREC), T_t)
            Pt = jax.lax.dynamic_update_slice(Pt, T_t, (g1, 0))
    return piv, ok, Pt


def _pivot_factors(panel, piv, npiv: int, block=None):
    """Merged L\\U factors of the selected rows, recomputed by a forced
    (in-order) elimination of the gathered pivot rows — eliminating the
    pivot rows in pivot order is exactly an LU without pivoting of
    panel[piv] (numerically equivalent to the interleaved masked
    elimination; the pivot lanes of the transposed pipeline are stale)."""
    tile = panel[piv]                            # [npiv, npiv] row gather
    _, _, Qt = _lu_select_loop_t(
        tile, jnp.ones(npiv, bool), npiv, forced=True, block=block
    )
    return Qt.T


@partial(jax.jit, static_argnames=("npiv", "block", "merged"))
def _select_impl(panel, active, npiv, block, merged=True):
    piv, ok, Pt = _lu_select_loop_t(panel, active, npiv, forced=False,
                                    block=block, finish=not merged)
    lu = _pivot_factors(panel, piv, npiv, block) if merged else None
    return piv, ok, Pt, lu


def factor_panel(
    panel: jnp.ndarray, active: jnp.ndarray, npiv: int, block=None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full panel factorization: returns (piv, ok, M [m, n]) where M's
    NON-pivot rows hold the multipliers they received (L21 material) and
    M's pivot rows hold the merged L\\U factors of the selected rows.

    When `active` is all-True (the single-chip case) the returned pivots
    are guaranteed DISTINCT: the masked argmax scores selected rows -inf
    and every unselected row >= 0.

    `block` (default: module _BLOCK) is resolved OUTSIDE the jit boundary so
    sweeps over the rank-1 width retrace instead of hitting a stale cache."""
    piv, ok, Pt, lu = _select_impl(panel, active, npiv, block or _BLOCK)
    M = Pt.T
    M = M.at[piv].set(lu)   # refresh the stale pivot rows (w-row scatter)
    return piv, ok, M


def factor_panel_raw(
    panel: jnp.ndarray, active: jnp.ndarray, npiv: int, block=None,
    merged: bool = True,
):
    """factor_panel WITHOUT the pivot-row refresh scatter: returns
    (piv, ok, Mraw, lu). For callers that never read the pivot rows'
    panel columns again (the crout scheme writes them to F from `lu` and
    retires the R slots), the [w, n]-row scatter is pure waste — measured
    12.8 ms per N=32768 v=1536 factorization (/tmp/jaxtrace_crout
    panel.py:302-303).

    merged=True (default): Mraw's pivot rows are STALE (values frozen at
    their selection step) and the merged factor of the selected rows comes
    back separately as `lu` via `_pivot_factors` (a narrow [npiv]-row
    gather + a second forced npiv-long elimination chain).

    merged=False: lu is None; instead the elimination loop FINISHES the
    pivot lanes (one extra one-hot MXU dot per deferred-update boundary),
    so Mraw[piv][j] is the full merged-factor row lu[j, :] — callers that
    already gather the pivot rows full-width (the crout scheme's
    `R[piv]`) get the merged factor for free and skip `_pivot_factors`
    entirely."""
    piv, ok, Pt, lu = _select_impl(panel, active, npiv, block or _BLOCK,
                                   merged)
    return piv, ok, Pt.T, lu


def select_pivots(
    panel: jnp.ndarray, active: jnp.ndarray, npiv: int, block=None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """CALU pivot selection: pick `npiv` rows of `panel` by partial pivoting.

    Returns (piv, ok, lu):
      piv [npiv] int32 — selected row indices of `panel`, in pivot order;
      ok  [npiv] bool  — False where fewer than npiv valid rows existed;
      lu  [npiv, npiv] — merged L\\U factors of the selected rows, i.e. with
                         L = unit_lower(lu) and U = triu(lu),
                         panel[piv] == L @ U.

    Serves both the local candidate selection on a [Ml, v] panel and the
    [2v, v] butterfly-round merges of tournament pivoting
    (conflux_opt.hpp:220-336).
    """
    piv, ok, _, lu = _select_impl(panel, active, npiv, block or _BLOCK)
    return piv, ok, lu


@jax.jit
def lu_nopivot(tile: jnp.ndarray) -> jnp.ndarray:
    """In-order LU of a square tile without pivoting (merged L\\U).

    The local kernel behind the `EmptyPivot` round-robin strategy
    (python/pivoting.py:17-76)."""
    n = tile.shape[0]
    _, _, Qt = _lu_select_loop_t(tile, jnp.ones(n, bool), n, forced=True)
    return Qt.T
