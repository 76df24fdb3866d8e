"""Processor-grid selection and TPU mesh construction.

TPU-native equivalent of the reference's grid machinery:
  * `lu_params<T>::get_p_grid` (src/conflux/lu/lu_params.hpp:21-47) — LU grid
    auto-selection heuristic.
  * `conflux::initialize` grid + tile heuristics for Cholesky
    (src/conflux/cholesky/Cholesky.cpp:76-134).
  * `CalculateDecomposition` / `CalculateParameters` — the communication-cost
    model from the Python spec (python/settings.py:25-52).

Instead of `MPI_Cart_create` + five `MPI_Cart_sub` communicators
(src/conflux/lu/lu_params.hpp:84-108), we build one `jax.sharding.Mesh` with
named axes ('x', 'y', 'z'); every sub-communicator of the reference is simply a
named-axis argument to a JAX collective (psum/all_gather/ppermute), so no
communicator objects are needed.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np

from conflux_tpu.errors import ConfluxError, ErrorCode


def _lcm(a: int, b: int) -> int:
    return abs(a * b) // math.gcd(a, b)


def choose_grid_lu(M: int, N: int, P: int) -> Tuple[int, int, int]:
    """Pick (Px, Py, Pz) for LU given matrix shape and device count.

    Mirrors the behaviour of `lu_params::get_p_grid`
    (src/conflux/lu/lu_params.hpp:21-47): prefer a perfect square (p, p, 1);
    then (p, p, 2) when P/2 is a perfect square; otherwise a cube-root split
    scaled by the aspect ratio, sorted descending so Px >= Py >= Pz.
    """
    ratio = max(M, N) / min(M, N)
    p_sq = int(math.isqrt(int(P / ratio)))
    p_half_sq = int(math.isqrt(int(P / (2 * ratio))))
    if P == p_sq * p_sq:
        return (p_sq, p_sq, 1)
    if P >= 2 and p_half_sq * p_half_sq == P // 2 and P % 2 == 0:
        return (p_half_sq, p_half_sq, 2)
    # truncating cube root + ratio-scaled assignment, like the reference:
    # px = p1, py = ratio*p1, pz = P/(px*py), sorted descending — this keeps
    # every device in use (e.g. P=7 -> (7,1,1), P=24 -> (6,2,2))
    p1 = max(1, int((P / ratio) ** (1.0 / 3.0)))
    px = p1
    py = max(1, int(ratio * p1))
    pz = max(1, P // (px * py))
    dims = sorted([px, py, pz], reverse=True)
    return (dims[0], dims[1], dims[2])


def choose_grid_cholesky(P: int, N: int) -> Tuple[int, int, int]:
    """Pick (Px, Py, Pz) for Cholesky.

    Mirrors the special cases and the power-of-two default of
    `conflux::initialize` (src/conflux/cholesky/Cholesky.cpp:76-114).
    """
    if P == 8 and N < 16384:
        return (2, 2, 2)
    if P == 32 and N < 8192:
        return (4, 4, 2)
    if P == 128 and N <= 16384:
        return (8, 8, 2)
    if P == 512:
        return (16, 16, 2)
    pow2 = int(math.log2(P)) if P > 0 else 0
    px = (1 << (pow2 // 2)) * (1 if pow2 % 2 == 0 else 2)
    py = 1 << (pow2 // 2)
    return (px, py, 1)


def choose_tile_cholesky(N: int, grid: Tuple[int, int, int], P: int) -> int:
    """Tile-size heuristic keyed on per-rank memory footprint.

    Mirrors src/conflux/cholesky/Cholesky.cpp:116-134: the ratio
    N*N*Pz/P (in millions of elements) selects v in {128, 256, 512, 1024}.
    """
    ratio = (float(N) * N * grid[2] / P) / 1e6
    if ratio < 2.5:
        return 128
    if ratio < 30:
        return 256
    if ratio < 250:
        return 512
    return 1024


def choose_decomposition(P: int) -> Tuple[int, int]:
    """(sqrtp1, c): 2D side length and replication factor minimizing the
    modeled communication cost 1/(ppp*c) over c <= (P+1)^(1/3).

    Mirrors `CalculateDecomposition` (python/settings.py:25-42).
    """
    p13 = int(math.floor((P + 1) ** (1.0 / 3.0)))
    best_ppp = int(math.floor(math.sqrt(P)))
    best_c = 1
    best_cost = 1.0 / (best_ppp * best_c)
    for c in range(1, p13 + 1):
        ppp = int(math.floor(math.sqrt(P // c)))
        cost = 1.0 / (ppp * c)
        if cost < best_cost:
            best_cost, best_ppp, best_c = cost, ppp, c
    assert best_ppp * best_ppp * best_c <= P
    return best_ppp, best_c


def choose_parameters(inp_n: int, P: int) -> Tuple[int, int, int, int]:
    """(sqrtp1, c, v, N_padded) — mirrors `CalculateParameters`
    (python/settings.py:45-52): v = lcm(sqrtp1, c), N padded to v*sqrtp1."""
    sqrtp1, c = choose_decomposition(P)
    v = _lcm(sqrtp1, c)
    n_local_tiles = -(-inp_n // (v * sqrtp1))
    n = v * sqrtp1 * n_local_tiles
    return sqrtp1, c, v, n


@dataclasses.dataclass(frozen=True)
class Grid:
    """A (Px, Py, Pz) processor grid realized as a TPU mesh.

    Axes: 'x' distributes tile rows, 'y' distributes tile columns, and 'z' is
    the 2.5D replication axis (the reference's Pz / `k_comm`,
    src/conflux/lu/lu_params.hpp:98-101). All the reference's Cartesian
    sub-communicators map to named-axis collectives:
      k_comm  -> psum/all_gather over 'z'
      i_comm  -> ppermute/all_gather over 'x'
      jk_comm -> collectives over ('y', 'z'); ik_comm -> ('x', 'z');
      ij_comm -> ('x', 'y').
    """

    Px: int
    Py: int
    Pz: int
    mesh: jax.sharding.Mesh

    @property
    def P(self) -> int:
        return self.Px * self.Py * self.Pz

    def __repr__(self) -> str:  # grid string parity with miniapp output
        return f"{self.Px}x{self.Py}x{self.Pz}"


def make_grid(
    shape: Optional[Tuple[int, int, int]] = None,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
    M: Optional[int] = None,
    N: Optional[int] = None,
    algorithm: str = "lu",
) -> Grid:
    """Build a Grid (mesh with axes x, y, z).

    If `shape` is None, auto-select like the reference miniapps do when
    `--p_grid`/`--grid` is omitted (lu_params.hpp:21-47, Cholesky.cpp:76-114).
    """
    devices = list(devices if devices is not None else jax.devices())
    P = len(devices)
    if shape is None:
        n = N if N is not None else 4096
        m = M if M is not None else n
        if algorithm == "cholesky":
            shape = choose_grid_cholesky(P, n)
        else:
            shape = choose_grid_lu(m, n, P)
    px, py, pz = shape
    if px * py * pz > P:
        raise ConfluxError(
            ErrorCode.DEVICE_SHORTAGE,
            f"grid {px}x{py}x{pz} needs {px*py*pz} devices, have {P}",
        )
    if px * py * pz < P:
        import warnings

        warnings.warn(
            f"grid {px}x{py}x{pz} uses {px*py*pz} of {P} devices; "
            f"{P - px*py*pz} device(s) idle",
            stacklevel=2,
        )
    devices = devices[: px * py * pz]
    dev_array = np.asarray(devices).reshape(px, py, pz)
    mesh = jax.sharding.Mesh(dev_array, ("x", "y", "z"))
    return Grid(px, py, pz, mesh)
