"""conflux-tpu: a TPU-native distributed dense factorization framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability set of CONFLUX
(communication-optimal 2.5D LU with tournament pivoting) and CONFCHOX
(near-communication-optimal 2.5D Cholesky) — see /root/reference (kabicm/conflux).

Design (TPU-first, not a port):
  * the (Px, Py, Pz) MPI processor grid becomes a `jax.sharding.Mesh` with axes
    ('x', 'y', 'z'); all rank programs are SPMD functions under `shard_map`.
  * MPI reductions/broadcasts/scatters become `psum` / `all_gather` / `ppermute`
    collectives riding the ICI.
  * data-dependent pivoting is expressed with static shapes: masked argmax,
    permutation vectors and one-hot row routing instead of physical row
    compaction (the reference's `push_pivots_up` machinery).
  * local hot kernels (panel LU, TRSM, trailing GEMM) target the MXU via
    `dot_general` with controlled precision and Pallas kernels.
"""

__version__ = "0.1.0"

from conflux_tpu.errors import ConfluxError, ErrorCode
from conflux_tpu.grid import Grid, make_grid, choose_grid_lu, choose_grid_cholesky
from conflux_tpu.layout import (
    BlockCyclic,
    distribute,
    redistribute,
    retile,
    undistribute,
)


def __getattr__(name):
    # heavier APIs resolved lazily to keep `import conflux_tpu` light
    import importlib

    # NOTE: no aliases named like submodules ('lu', 'cholesky', 'pgemm') —
    # importing the submodule binds it as a package attribute and would
    # permanently shadow this hook, flipping the name from function to module
    lazy = {
        "lu_factor": "conflux_tpu.lu.single",
        "lu_residual": "conflux_tpu.lu.single",
        "cholesky_residual": "conflux_tpu.cholesky.single",
        "lu_25d": "conflux_tpu.lu.p25d",
        "plu": "conflux_tpu.lu.p25d",
        "cholesky_25d": "conflux_tpu.cholesky.p25d",
        "pcholesky": "conflux_tpu.cholesky.p25d",
        "pdgetrf": "conflux_tpu.scalapack",
        "pdpotrf": "conflux_tpu.scalapack",
        "plu_residual_25d": "conflux_tpu.pgemm",
        "pchol_residual_25d": "conflux_tpu.pgemm",
        "lu_solve": "conflux_tpu.solve",
        "cho_solve": "conflux_tpu.solve",
        "lu_factor_stepped": "conflux_tpu.lu.stepped",
        "cholesky_stepped": "conflux_tpu.cholesky.stepped",
    }
    if name in lazy:
        return getattr(importlib.import_module(lazy[name]), name)
    raise AttributeError(name)


__all__ = [
    "Grid",
    "make_grid",
    "choose_grid_lu",
    "choose_grid_cholesky",
    "BlockCyclic",
    "distribute",
    "undistribute",
    "redistribute",
    "retile",
    "ConfluxError",
    "ErrorCode",
    "lu_factor", "lu_residual", "cholesky_residual",
    "lu_25d", "plu", "cholesky_25d", "pcholesky", "pdgetrf", "pdpotrf",
    "plu_residual_25d", "pchol_residual_25d", "lu_solve", "cho_solve",
    "lu_factor_stepped", "cholesky_stepped",
]
