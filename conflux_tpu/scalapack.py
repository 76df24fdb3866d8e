"""ScaLAPACK-style drivers: pdgetrf / pdpotrf.

The reference ships a BLACS/ScaLAPACK bridge (examples/utils.hpp:38-240 and
the COSTA transforms in examples/conflux_miniapp.cpp:349-422) so users of
block-cyclic ScaLAPACK layouts can call CONFLUX.  Here the same role is
played by `jax.device_put` resharding: these wrappers accept a dense host
matrix or any-sharded jax.Array, pick a grid and tile size with the
reference's heuristics when not given, run the distributed factorization and
return factors in block-cyclic layout plus LAPACK-compatible pivot output.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import numpy as np

from conflux_tpu.cholesky.p25d import cholesky_25d
from conflux_tpu.grid import Grid, choose_grid_cholesky, choose_grid_lu, choose_tile_cholesky, make_grid
from conflux_tpu.layout import BlockCyclic, distribute, undistribute
from conflux_tpu.lu.p25d import lu_25d


@dataclass(frozen=True)
class Factorization:
    """Distributed factor handle: data stays sharded until materialized."""

    data: jax.Array          # (Pz, Px*Ml, Py*Nl) block-cyclic factors
    desc: BlockCyclic
    perm: Optional[jax.Array] = None  # LU only: slot -> original row

    def dense(self) -> np.ndarray:
        out = np.asarray(undistribute(self.data, self.desc))
        return out

    def ipiv(self) -> np.ndarray:
        """LAPACK-style sequential-swap pivot vector (1-based, like getrf's
        IPIV) derived from the permutation vector. The sequential walk runs
        in the native C++ runtime (Python fallback inside)."""
        if self.perm is None:
            from conflux_tpu.errors import ConfluxError, ErrorCode

            raise ConfluxError(ErrorCode.NOT_FACTORIZED, "no pivots: not an LU factorization")
        from conflux_tpu import native

        return native.perm_to_ipiv(np.asarray(self.perm))


def pdgetrf(
    A,
    grid: Optional[Grid] = None,
    v: Optional[int] = None,
    pivoting: str = "tournament",
) -> Factorization:
    """Distributed LU with pivoting of a dense or sharded square matrix."""
    A = np.asarray(A) if not isinstance(A, jax.Array) else A
    m, n = A.shape
    if grid is None:
        grid = make_grid(choose_grid_lu(m, n, len(jax.devices())))
    if v is None:
        v = choose_tile_cholesky(n, (grid.Px, grid.Py, grid.Pz), grid.P)
    desc = BlockCyclic.create(m, n, v, grid)
    G = distribute(A, desc)
    F, perm = lu_25d(G, desc, pivoting)
    return Factorization(F, desc, perm)


def pdpotrf(A, grid: Optional[Grid] = None, v: Optional[int] = None) -> Factorization:
    """Distributed lower Cholesky of a dense or sharded SPD matrix."""
    A = np.asarray(A) if not isinstance(A, jax.Array) else A
    n = A.shape[0]
    if grid is None:
        grid = make_grid(choose_grid_cholesky(len(jax.devices()), n))
    if v is None:
        v = choose_tile_cholesky(n, (grid.Px, grid.Py, grid.Pz), grid.P)
    desc = BlockCyclic.create(n, n, v, grid)
    G = distribute(A, desc)
    L = cholesky_25d(G, desc)
    return Factorization(L, desc)
