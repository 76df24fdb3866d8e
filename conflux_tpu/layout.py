"""Block-cyclic layout algebra and distributed-matrix (re)distribution.

TPU-native equivalent of two reference layers:
  * the pure index maps `l2g`/`g2l`/`g2lnoTile` and friends
    (src/conflux/lu/conflux_opt.cpp:19-98, python/utils.py:39-100), rebuilt as
    vectorized jnp functions usable inside jit;
  * the COSTA grid2grid bridge (`conflux_layout`, src/conflux/lu/layout.cpp)
    whose job — moving a matrix between the CONFLUX tile-cyclic distribution
    and other layouts — is done here by XLA itself: a `jax.device_put` onto a
    different `NamedSharding` lowers to the exact all-to-all reshuffle COSTA
    performs with MPI.

Storage convention for a distributed matrix on a Grid(Px, Py, Pz):

  The global array `G` has shape (Pz, Px*Ml, Py*Nl) and partition spec
  P('z', 'x', 'y').  Device (pi, pj, pz) holds the local block
  G[pz, pi*Ml:(pi+1)*Ml, pj*Nl:(pj+1)*Nl] of shape (Ml, Nl) — row-major over
  *local tiles*: local row li*v + r is global row (li*Px + pi)*v + r, i.e.
  tile-cyclic exactly like the reference (global tile t lives on rank t % Px at
  local tile t // Px, conflux_opt.cpp:74-98).

  The leading z axis realizes the 2.5D replication: every entry of the global
  matrix is represented as a *sum over z layers* (layer 0 carries the data at
  initialization, other layers carry zeros; during factorization the layers
  hold the partial trailing updates — the reference's deferred
  `MPI_Reduce(..., k_comm)`, conflux_opt.hpp:636-646).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from conflux_tpu.errors import ConfluxError, ErrorCode
from conflux_tpu.grid import Grid


# ----------------------------------------------------------------------------
# Pure index algebra (vectorized, jit-safe). Mirrors conflux_opt.cpp:19-98.
# ----------------------------------------------------------------------------

def l2g(p, l, stride):
    """Local tile index -> global tile index (conflux_opt.cpp:19-21)."""
    return l * stride + p


def g2l(g, stride):
    """Global tile index -> (owner, local tile index) (conflux_opt.cpp:23-27)."""
    return g % stride, g // stride


def g2l_row(grow, Px, v):
    """Global row -> (owner pi, local row within the [Ml] no-tile local frame).

    Mirrors the row arithmetic of `g2lnoTile` (conflux_opt.cpp:74-98):
    global tile gT = grow // v is owned by pi = gT % Px at local tile
    lT = gT // Px; within the tile the row offset is grow % v.
    """
    gt = grow // v
    pown = gt % Px
    lt = gt // Px
    return pown, lt * v + grow % v


def local_row_to_global(pi, Px, v, Ml):
    """Vector of global row indices for all Ml local rows of device row pi.
    (Also serves columns: local_row_to_global(pj, Py, v, Nl).)
    Explicit int32: under jax_enable_x64 (the f64-on-CPU validation mode)
    a bare arange promotes to int64 and poisons every index dtype."""
    lr = jnp.arange(Ml, dtype=jnp.int32)
    lt = lr // v
    return (lt * Px + jnp.asarray(pi, jnp.int32)) * v + lr % v


def local_tile_to_global(p, P, v, L):
    """Vector of global TILE indices for all L/v local tiles of device p."""
    return (jnp.arange(L, dtype=jnp.int32) // v) * P + jnp.asarray(p, jnp.int32)


def flipbit(n, k):
    """XOR bit k — butterfly partner map (conflux_opt.cpp:55-57)."""
    return n ^ (1 << k)


def butterfly_pair(pi: int, r: int, Px: int) -> int:
    """Partner of rank pi in butterfly round r for arbitrary Px.

    Mirrors `conflux::butterfly_pair` (conflux_opt.cpp:59-72): non-power-of-two
    ranks fold the out-of-range partner back into the grid.
    """
    src = flipbit(pi, r)
    if src >= Px:
        if r == 0:
            src = pi
        else:
            src = flipbit(src, r - 1)
            if src >= Px:
                src = Px - 1
    return src


# ----------------------------------------------------------------------------
# Descriptor
# ----------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class BlockCyclic:
    """Block-cyclic descriptor (the analog of `lu_params` geometry fields,
    src/conflux/lu/lu_params.hpp:67-82)."""

    M: int          # padded global rows
    N: int          # padded global cols
    v: int          # tile size
    grid: Grid

    @staticmethod
    def create(M: int, N: int, v: int, grid: Grid) -> "BlockCyclic":
        """Pad M, N up to v*Px resp. v*Py multiples (lu_params.hpp:67-71).

        A square input stays square: both dims pad to the lcm of v*Px and
        v*Py, so square-only entry points work on non-square grids."""
        if v <= 0:
            raise ConfluxError(ErrorCode.INVALID_TILE, f"tile size v={v} must be positive")
        if M == N:
            step = math.lcm(v * grid.Px, v * grid.Py)
            mp = np_ = step * (-(-N // step))
        else:
            mp = v * grid.Px * (-(-M // (v * grid.Px)))
            np_ = v * grid.Py * (-(-N // (v * grid.Py)))
            if M > N:
                # tall LU: guarantee Mg >= Ng and a spare padding ROW for
                # every padding COLUMN, so pad_like's identity padding keeps
                # the padded problem full column rank
                need = max(np_, M + (np_ - N))
                mp = max(mp, v * grid.Px * (-(-need // (v * grid.Px))))
        return BlockCyclic(mp, np_, v, grid)

    @property
    def Mt(self) -> int:
        return self.M // self.v

    @property
    def Nt(self) -> int:
        return self.N // self.v

    @property
    def Mtl(self) -> int:  # local tile rows (tA11x in the reference)
        return self.Mt // self.grid.Px

    @property
    def Ntl(self) -> int:  # local tile cols (tA11y)
        return self.Nt // self.grid.Py

    @property
    def Ml(self) -> int:
        return self.Mtl * self.v

    @property
    def Nl(self) -> int:
        return self.Ntl * self.v

    @property
    def nlayr(self) -> int:
        """Per-z-layer slice of the update rank: ceil(v/Pz) (lu_params.hpp:73)."""
        return -(-self.v // self.grid.Pz)

    # -- shardings ------------------------------------------------------------

    def sharding(self) -> NamedSharding:
        return NamedSharding(self.grid.mesh, P("z", "x", "y"))

    def global_shape(self) -> Tuple[int, int, int]:
        return (self.grid.Pz, self.grid.Px * self.Ml, self.grid.Py * self.Nl)


# ----------------------------------------------------------------------------
# Distribution transforms (the COSTA-equivalent layer)
# ----------------------------------------------------------------------------

def _cyclic_permute(A: jnp.ndarray, v: int, Px: int, Py: int) -> jnp.ndarray:
    """Dense [M, N] -> cyclic-permuted [Px*Ml, Py*Nl] so contiguous device
    blocks correspond to the tile-cyclic distribution."""
    M, N = A.shape
    mtl, ntl = M // (v * Px), N // (v * Py)
    A6 = A.reshape(mtl, Px, v, ntl, Py, v)
    A6 = A6.transpose(1, 0, 2, 4, 3, 5)  # (Px, mtl, v, Py, ntl, v)
    return A6.reshape(Px * mtl * v, Py * ntl * v)


def _cyclic_unpermute(G: jnp.ndarray, v: int, Px: int, Py: int) -> jnp.ndarray:
    Mg, Ng = G.shape
    mtl, ntl = Mg // (v * Px), Ng // (v * Py)
    A6 = G.reshape(Px, mtl, v, Py, ntl, v)
    A6 = A6.transpose(1, 0, 2, 4, 3, 5)
    return A6.reshape(Mg, Ng)


def distribute(A, desc: BlockCyclic) -> jax.Array:
    """Place a dense [M, N] (or pre-padded) matrix into the distributed
    (Pz, Px*Ml, Py*Nl) representation: layer 0 = data, layers 1.. = zeros.

    The zero layers realize the same invariant the reference enforces at init
    ("ranks that are not on layer 0 must have all 0s", lu_params.hpp:149-155).
    """
    A = jnp.asarray(A)
    if A.shape != (desc.M, desc.N):
        pad = ((0, desc.M - A.shape[0]), (0, desc.N - A.shape[1]))
        if min(p[1] for p in pad) < 0:
            raise ConfluxError(
                ErrorCode.LAYOUT_MISMATCH,
                f"matrix {A.shape} larger than descriptor {(desc.M, desc.N)}",
            )
        # pad with identity on the trailing diagonal to keep factorizations
        # nonsingular (the reference instead grows N itself, lu_params.hpp:67-71)
        A = pad_like(A, desc)
    G0 = _cyclic_permute(A, desc.v, desc.grid.Px, desc.grid.Py)
    G = jnp.concatenate(
        [G0[None], jnp.zeros((desc.grid.Pz - 1,) + G0.shape, G0.dtype)], axis=0
    )
    return jax.device_put(G, desc.sharding())


def pad_like(A, desc: BlockCyclic) -> jnp.ndarray:
    """The dense padded matrix `distribute(A, desc)` factorizes (identity on
    the trailing diagonal). Use it as the ground truth when computing
    residuals of padded problems: LU pivoting may interleave padding rows,
    so LU factors of padded inputs cannot be cropped back to the user's N
    (Cholesky factors can — padding is block-diagonal there)."""
    A = jnp.asarray(A)
    if A.shape == (desc.M, desc.N):
        return A
    k = min(desc.M - A.shape[0], desc.N - A.shape[1])
    padded = jnp.zeros((desc.M, desc.N), A.dtype)
    padded = padded.at[: A.shape[0], : A.shape[1]].set(A)
    if k > 0:
        padded = padded.at[
            A.shape[0] + jnp.arange(k), A.shape[1] + jnp.arange(k)
        ].set(1)
    return padded


def undistribute(G, desc: BlockCyclic) -> jnp.ndarray:
    """Inverse of `distribute`: sum z layers, undo the cyclic permutation."""
    G0 = jnp.sum(jnp.asarray(G), axis=0)
    return _cyclic_unpermute(G0, desc.v, desc.grid.Px, desc.grid.Py)


@partial(jax.jit, static_argnames=("src", "dst"))
def retile(G: jax.Array, src: "BlockCyclic", dst: "BlockCyclic") -> jax.Array:
    """Move a distributed matrix between block-cyclic descriptors that
    differ in tile size and/or (Px, Py, Pz) split — entirely on device.

    This is COSTA's grid2grid `transform` between two CONFLUX layouts
    (reference: src/conflux/lu/layout.cpp describing both directions to
    COSTA): the reshape/transpose below is data movement XLA lowers to an
    all-to-all over ICI, and the trailing sharding constraint pins the
    result onto the destination distribution. Both descriptors must live on
    the same mesh; across meshes use `redistribute` (device_put) instead.
    """
    if (src.M, src.N) != (dst.M, dst.N):
        raise ConfluxError(ErrorCode.LAYOUT_MISMATCH, "retile requires identical global shapes")
    if src.grid.mesh != dst.grid.mesh:
        raise ConfluxError(ErrorCode.LAYOUT_MISMATCH, "retile requires a shared mesh; use redistribute()")
    A = _cyclic_unpermute(jnp.sum(G, axis=0), src.v, src.grid.Px, src.grid.Py)
    G0 = _cyclic_permute(A, dst.v, dst.grid.Px, dst.grid.Py)
    out = jnp.concatenate(
        [G0[None], jnp.zeros((dst.grid.Pz - 1,) + G0.shape, G0.dtype)], axis=0
    )
    return jax.lax.with_sharding_constraint(out, dst.sharding())


def redistribute(X: jax.Array, sharding: jax.sharding.Sharding) -> jax.Array:
    """Move a distributed array onto a different sharding.

    This is the whole of COSTA's `transform` (grid2grid) in TPU-native form:
    XLA emits the optimal all-to-all over ICI for the resharding
    (reference: costa::transform used at examples/conflux_miniapp.cpp:349-353).
    """
    return jax.device_put(X, sharding)
