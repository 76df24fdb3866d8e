"""Shared collective building blocks for the SPMD kernels.

The panel gather-and-reorder below is the framework's realization of the
reference's `MPI_Iscatterv` panel distribution over `jk_comm`/`ik_comm`
(conflux_opt.hpp:1424-1434; Cholesky.cpp:459-481): an all_gather over mesh
axis 'x' followed by a reorder into global-tile indexing and a per-device
selection of the tiles its local columns need. The tile index algebra
(global tile t = lt*P + p, layout.py) is subtle enough to keep in ONE place.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def panel_rows_for_columns(
    Lb: jnp.ndarray,
    v: int,
    Px: int,
    Py: int,
    pj,
    ntl: int,
    base_row_tile: int = 0,
    base_col_tile: int = 0,
) -> jnp.ndarray:
    """Give every device the panel tiles its local COLUMN tiles correspond to.

    Lb [mtl*v, w]: a column panel (any width w — e.g. the per-layer
    l = ceil(v/Pz) slice), y-broadcast, holding local row tiles
    (base_row_tile + li)*Px + pi. Returns [ntl, v, w]: tile j for each local
    column tile lj, j = (base_col_tile + lj)*Py + pj. Out-of-window indices
    (dead tiles) are clipped — callers mask them.
    """
    mtl = Lb.shape[0] // v
    w = Lb.shape[1]
    lall = jax.lax.all_gather(Lb, "x")  # [Px, mtl, v, w] worth of rows
    # entry (p, li) is global tile (base_row_tile + li)*Px + p: reorder so
    # axis 0 is the global tile index relative to base_row_tile*Px
    T = lall.reshape(Px, mtl, v, w).transpose(1, 0, 2, 3).reshape(mtl * Px, v, w)
    jidx = (base_col_tile + jnp.arange(ntl)) * Py + pj - base_row_tile * Px
    return jnp.take(T, jnp.clip(jidx, 0, T.shape[0] - 1), axis=0)
