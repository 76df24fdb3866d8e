"""Panel factorization kernels: masked partial-pivoting row selection.

This is the static-shape, jit-compatible replacement for the reference's
`LAPACKE_dgetrf`-based local pivot machinery (`LUP`,
src/conflux/lu/conflux_opt.hpp:143-175, and python/reference_lu.py): instead of
physically swapping and compacting rows, we carry a validity mask and a pivot
index vector.  Invalid rows (already pivoted in an earlier step, or padding in
a tournament candidate block) simply never win the masked argmax — the same
effect as the reference's `first_non_pivot_row` compaction without any
data-dependent shapes.

All updates are rank-1 eliminations on the VPU; the [m, v] panel stays in
registers/VMEM under jit.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


# rank-1 loop width; trailing columns are updated by MXU GEMMs between
# blocks. Swept on v5e (experiments/prof_panel.py): ~1.1 ms/panel at
# [8192, 512] for widths 32-128 (per-iteration argmax/control dominates,
# not the block FMA pass); 16 is worse (inter-block overhead). 64 measured
# best by a hair.
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


def _rank1_dispatch(Mblk, active, sel, piv, ok, j0, w, forced):
    """Route the rank-1 block to the fused Pallas kernel (TPU) or the
    jnp fori_loop fallback."""
    if _use_pallas(Mblk.shape[0], Mblk.dtype):
        from conflux_tpu.ops.pallas_panel import rank1_block_pallas

        avail = active & ~sel
        out, availo, pivw, okw = rank1_block_pallas(
            Mblk, avail.astype(jnp.float32)[None, :], forced, j0
        )
        newly = avail & ~(availo[0] > 0)
        piv = piv.at[j0 : j0 + w].set(pivw)
        ok = ok.at[j0 : j0 + w].set(okw > 0)
        return out, sel | newly, piv, ok
    return _rank1_block(Mblk, active, sel, piv, ok, j0, w, forced)


def _rank1_block(Mblk, active, sel, piv, ok, j0, w, forced):
    """w steps of masked-argmax elimination restricted to a [m, w] column
    block (the only sequential, VPU-bound part of the factorization)."""
    m = Mblk.shape[0]
    rows = jnp.arange(m)
    wcols = jnp.arange(w)

    def body(jj, state):
        Mb, sel, piv, ok = state
        col = jax.lax.dynamic_slice(Mb, (0, jj), (m, 1))[:, 0]
        valid = active & ~sel
        if forced:
            p = j0 + jj
        else:
            score = jnp.where(valid, jnp.abs(col), -jnp.inf)
            p = jnp.argmax(score).astype(jnp.int32)
        piv = jax.lax.dynamic_update_slice(
            piv, jnp.asarray(p, jnp.int32)[None], (j0 + jj,)
        )
        ok = jax.lax.dynamic_update_slice(ok, valid[p][None], (j0 + jj,))
        pivrow = Mb[p]
        pv = col[p]
        safe = jnp.where(pv == 0, jnp.ones((), Mb.dtype), pv)
        mult = col / safe
        elim = valid & (rows != p)
        upd = Mb - mult[:, None] * pivrow[None, :]
        Mb = jnp.where(elim[:, None] & (wcols[None, :] > jj), upd, Mb)
        newcol = jnp.where(elim, mult, col)
        Mb = jax.lax.dynamic_update_slice(Mb, newcol[:, None], (0, jj))
        sel = sel | (rows == p)
        return Mb, sel, piv, ok

    return jax.lax.fori_loop(0, w, body, (Mblk, sel, piv, ok))


def _lu_select_loop(panel, active, npiv, forced, block=None):
    """Shared blocked elimination loop (right-looking getrf without row
    swaps — the swap is replaced by the selection mask).

    panel: [m, n] working matrix; active: [m] bool validity;
    npiv: static number of pivots to select (npiv <= n);
    forced: when True, pivot j is forced to be row j (no-pivoting path, the
    reference's `EmptyPivot` strategy, python/pivoting.py:17);
    block: rank-1 loop width (None = module default _BLOCK).

    Returns (piv [npiv] int32, ok [npiv] bool, M [m, n] eliminated matrix).
    The eliminated matrix stores, for every row, the multipliers it received
    in the columns where it was eliminated — so gathering the pivot rows in
    order yields the merged L\\U factors of the selected rows (getrf layout).

    Identical pivot choices to the unblocked algorithm: each block's columns
    are fully updated (by the trailing GEMMs of earlier blocks) before its
    rank-1 loop runs.
    """
    m, n = panel.shape
    block = block or _BLOCK

    # derive the carries from BOTH inputs so their varying-manual-axes are the
    # union of panel's and active's when this kernel runs under shard_map
    # (a constant-initialized carry would clash with the varying loop output)
    zb = jnp.zeros_like(active) | jnp.zeros_like(panel[:, 0], dtype=bool)
    M = panel + zb.astype(panel.dtype)[:, None]
    sel = zb
    piv = zb[:npiv].astype(jnp.int32)
    ok = zb[:npiv]

    from conflux_tpu.ops.tri import _solve_unit_lower_blocked  # cycle-free

    for j0 in range(0, npiv, block):
        w = min(block, npiv - j0)
        j1 = j0 + w
        Mblk, sel, piv, ok = _rank1_dispatch(
            M[:, j0:j1], active, sel, piv, ok, j0, w, forced
        )
        pivs = jax.lax.dynamic_slice(piv, (j0,), (w,))
        if j1 < n:
            T = M[:, j1:]
            # U12 = L11^{-1} T[pivot rows]; eliminated rows: T -= l @ U12
            # blocked substitution, NOT an explicit inverse: pivot-multiplier
            # triangles can be ill-conditioned enough (c^w) that forming
            # inv(L11) at w=128 destroys the factorization (see ops/tri.py)
            L11 = jnp.tril(Mblk[pivs], -1) + jnp.eye(w, dtype=M.dtype)
            U12 = _solve_unit_lower_blocked(L11, T[pivs])
            elim = active & ~sel
            Lmul = jnp.where(elim[:, None], Mblk, 0)
            T = T - jnp.dot(Lmul, U12, precision=jax.lax.Precision.HIGHEST)
            T = T.at[pivs].set(jnp.where(ok[j0:j1, None], U12, T[pivs]))
            M = jnp.concatenate([M[:, :j0], Mblk, T], axis=1)
        else:
            M = jnp.concatenate([M[:, :j0], Mblk], axis=1)
    return piv, ok, M


@partial(jax.jit, static_argnames=("npiv", "block"))
def _select_impl(panel, active, npiv, block):
    return _lu_select_loop(panel, active, npiv, forced=False, block=block)


def factor_panel(
    panel: jnp.ndarray, active: jnp.ndarray, npiv: int, block=None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Like `select_pivots` but returns the FULL eliminated matrix M [m, n]
    (row i holds the multipliers row i received, in the columns where it was
    eliminated) instead of only the pivot rows. The in-place single-chip LU
    needs the non-pivot rows' multipliers (L21) as well.

    When `active` is all-True (the single-chip case) the returned pivots are
    guaranteed DISTINCT: the masked argmax scores selected rows -inf and
    every unselected row >= 0.

    `block` (default: module _BLOCK) is resolved OUTSIDE the jit boundary so
    sweeps over the rank-1 width retrace instead of hitting a stale cache."""
    return _select_impl(panel, active, npiv, block or _BLOCK)


def select_pivots(
    panel: jnp.ndarray, active: jnp.ndarray, npiv: int, block=None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """CALU pivot selection: pick `npiv` rows of `panel` by partial pivoting.

    Returns (piv, ok, lu):
      piv [npiv] int32 — selected row indices of `panel`, in pivot order;
      ok  [npiv] bool  — False where fewer than npiv valid rows existed;
      lu  [npiv, n]    — merged L\\U factors of the selected rows, i.e. with
                         L = unit_lower(lu[:, :npiv]) and U = triu-part,
                         panel[piv] == L @ U (columns beyond npiv are the
                         eliminated right block).

    Serves both the local candidate selection on a [Ml, v] panel and the
    [2v, v] butterfly-round merges of tournament pivoting
    (conflux_opt.hpp:220-336).
    """
    piv, ok, M = _select_impl(panel, active, npiv, block or _BLOCK)
    return piv, ok, M[piv]


@jax.jit
def lu_nopivot(tile: jnp.ndarray) -> jnp.ndarray:
    """In-order LU of a square tile without pivoting (merged L\\U).

    The local kernel behind the `EmptyPivot` round-robin strategy
    (python/pivoting.py:17-76)."""
    n = tile.shape[0]
    _, _, M = _lu_select_loop(tile, jnp.ones(n, bool), n, forced=True)
    return M
