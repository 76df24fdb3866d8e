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


def _lu_select_loop(panel, active, npiv, forced):
    """Shared elimination loop.

    panel: [m, n] working matrix; active: [m] bool validity;
    npiv: static number of pivots to select (npiv <= n);
    forced: None for partial pivoting (masked argmax), or a static bool: when
    True, pivot j is forced to be row j (no-pivoting path, used for the
    reference's `EmptyPivot` strategy, python/pivoting.py:17).

    Returns (piv [npiv] int32, ok [npiv] bool, M [m, n] eliminated matrix).
    The eliminated matrix stores, for every row, the multipliers it received
    in the columns where it was eliminated — so gathering the pivot rows in
    order yields the merged L\\U factors of the selected rows (getrf layout).
    """
    m, n = panel.shape
    rows = jnp.arange(m)
    cols = jnp.arange(n)

    def body(j, state):
        M, sel, piv, ok = state
        col = jax.lax.dynamic_slice(M, (0, j), (m, 1))[:, 0]
        valid = active & ~sel
        if forced:
            p = j
        else:
            score = jnp.where(valid, jnp.abs(col), -jnp.inf)
            p = jnp.argmax(score).astype(jnp.int32)
        piv = piv.at[j].set(jnp.asarray(p, jnp.int32))
        ok = ok.at[j].set(valid[p])
        pivrow = M[p]
        pv = col[p]
        safe = jnp.where(pv == 0, jnp.ones((), M.dtype), pv)
        mult = col / safe
        elim = valid & (rows != p)
        upd = M - mult[:, None] * pivrow[None, :]
        M = jnp.where(elim[:, None] & (cols[None, :] > j), upd, M)
        # store the multiplier as the L entry of eliminated rows
        newcol = jnp.where(elim, mult, col)
        M = jax.lax.dynamic_update_slice(M, newcol[:, None], (0, j))
        sel = sel | (rows == p)
        return M, sel, piv, ok

    # derive the carries from BOTH inputs so their varying-manual-axes are the
    # union of panel's and active's when this kernel runs under shard_map
    # (a constant-initialized carry would clash with the varying loop output)
    zb = jnp.zeros_like(active) | jnp.zeros_like(panel[:, 0], dtype=bool)
    init = (
        panel + zb.astype(panel.dtype)[:, None],
        zb,
        zb[:npiv].astype(jnp.int32),
        zb[:npiv],
    )
    M, _, piv, ok = jax.lax.fori_loop(0, npiv, body, init)
    return piv, ok, M


@partial(jax.jit, static_argnames=("npiv",))
def select_pivots(
    panel: jnp.ndarray, active: jnp.ndarray, npiv: int
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
    piv, ok, M = _lu_select_loop(panel, active, npiv, forced=False)
    return piv, ok, M[piv]


@jax.jit
def lu_nopivot(tile: jnp.ndarray) -> jnp.ndarray:
    """In-order LU of a square tile without pivoting (merged L\\U).

    The local kernel behind the `EmptyPivot` round-robin strategy
    (python/pivoting.py:17-76)."""
    n = tile.shape[0]
    _, _, M = _lu_select_loop(tile, jnp.ones(n, bool), n, forced=True)
    return M
