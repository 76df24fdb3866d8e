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

from conflux_tpu.grid import Grid, make_grid, choose_grid_lu, choose_grid_cholesky
from conflux_tpu.layout import BlockCyclic

__all__ = [
    "Grid",
    "make_grid",
    "choose_grid_lu",
    "choose_grid_cholesky",
    "BlockCyclic",
]
