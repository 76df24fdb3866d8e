"""Matrix generation and binary file IO.

Capability parity with:
  * `lu_params::InitMatrix` (src/conflux/lu/lu_params.hpp:141-376): seeded
    uniform random fill `5 + U[0,1)` for benchmarking, plus small
    deterministic debug matrices with planted dominant entries that force
    known pivot movements (the reference hard-codes 8/9/16/20/27/32 matrices
    for the same purpose; ours are generated, not copied).
  * `CholeskyIO::generateInputMatrixDistributed` (src/conflux/cholesky/
    CholeskyIO.cpp:100-172): an O(v^2)-state SPD generator — a seeded v x v
    Gram tile replicated across the matrix plus a diagonal-dominance boost.
  * `CholeskyIO` file dump/parse + `cholesky_helper --generate/--compare`
    (examples/cholesky_helper.cpp): raw float64 row-major binary files.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def random_matrix(M: int, N: int, seed: int = 42, dtype=np.float32) -> np.ndarray:
    """Benchmark fill: 5 + U[0,1) (lu_params.hpp:364-375 semantics).

    Large fills route through the native OpenMP generator when built
    (conflux_tpu/native); note the two paths use different PRNGs, so fix one
    path when bitwise reproducibility across machines matters."""
    if M * N >= 1 << 22:
        from conflux_tpu import native

        if native.available():
            return native.fill_random(M, N, seed=seed, dtype=dtype)
    rng = np.random.default_rng(seed)
    return (5.0 + rng.random((M, N))).astype(dtype)


def debug_matrix(n: int, seed: int = 7, dtype=np.float32) -> np.ndarray:
    """Small deterministic matrix with planted dominant off-diagonal entries
    so tournament pivoting must move known rows (the role of the hard-coded
    matrices in lu_params.hpp:157-363)."""
    rng = np.random.default_rng(seed)
    A = rng.integers(0, 10, size=(n, n)).astype(dtype)
    # plant dominant values off the diagonal: row i's champion lives in
    # column (2*i+1) % n, so natural (no-pivot) order is always wrong
    for i in range(0, n, max(1, n // 8)):
        A[(2 * i + 1) % n, i] = 100.0 * (1 + i)
    return A


def spd_matrix(
    N: int, v: int = 128, seed: int = 42, dtype=np.float32
) -> np.ndarray:
    """SPD generator with O(v^2) entropy: replicated seeded Gram tile plus a
    diagonal boost (CholeskyIO.cpp:100-172 semantics). The replication makes
    the full matrix PSD (it is G ⊗ ones-ish); the diagonal shift makes it
    strictly SPD and well-conditioned."""
    rng = np.random.default_rng(seed)
    R = rng.standard_normal((v, v))
    G = (R @ R.T) / v
    reps = -(-N // v)
    A = np.tile(G, (reps, reps))[:N, :N]
    A += 2.0 * v * np.eye(N)
    return ((A + A.T) / 2).astype(dtype)


def dense_spd_matrix(N: int, seed: int = 42, dtype=np.float32) -> np.ndarray:
    """Full-entropy SPD matrix (B B^T + N I) for correctness tests."""
    rng = np.random.default_rng(seed)
    B = rng.standard_normal((N, N))
    return (B @ B.T + N * np.eye(N)).astype(dtype)


# -- binary file IO (cholesky_helper format: raw row-major float64) ----------

def save_matrix(path: str, A: np.ndarray) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.asarray(A, dtype=np.float64).tofile(path)


def save_dist(path: str, G, desc) -> None:
    """Persist a distributed matrix (checkpoint parity with the reference's
    MPI-IO dumps, CholeskyIO.cpp:384-501): gathered to host, raw f64."""
    from conflux_tpu.layout import undistribute

    save_matrix(path, np.asarray(undistribute(G, desc)))


def load_dist(path: str, desc, dtype=np.float32):
    """Load a matrix saved by save_dist back into the distributed layout.

    `dtype` is the on-device dtype (the file format is always f64, matching
    the reference's CholeskyIO binary format); pass np.float64 to round-trip
    a double-precision distributed matrix without precision loss."""
    from conflux_tpu.layout import distribute

    A = load_matrix(path, desc.N, desc.M)
    return distribute(A.astype(dtype), desc)


def load_matrix(path: str, N: int, M: Optional[int] = None) -> np.ndarray:
    M = M if M is not None else N
    data = np.fromfile(path, dtype=np.float64, count=M * N)
    if data.size != M * N:
        from conflux_tpu.errors import ConfluxError, ErrorCode

        raise ConfluxError(
            ErrorCode.IO_ERROR,
            f"{path}: expected {M*N} float64 values, got {data.size}",
        )
    return data.reshape(M, N)
