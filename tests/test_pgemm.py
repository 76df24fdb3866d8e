"""Distributed SUMMA matmul + fully-distributed validation residual."""

import numpy as np
import pytest

from conflux_tpu.grid import make_grid
from conflux_tpu.layout import BlockCyclic, distribute, undistribute
from conflux_tpu.lu.p25d import lu_25d
from conflux_tpu.pgemm import pgemm, plu_residual_25d


@pytest.mark.parametrize("shape", [(2, 2, 1), (2, 2, 2), (4, 2, 1)])
def test_pgemm_matches_numpy(rng, shape):
    grid = make_grid(shape)
    n, v = 64, 8
    A = rng.standard_normal((n, n)).astype(np.float32)
    B = rng.standard_normal((n, n)).astype(np.float32)
    desc = BlockCyclic.create(n, n, v, grid)
    C = np.asarray(undistribute(pgemm(distribute(A, desc), distribute(B, desc), desc), desc))
    np.testing.assert_allclose(C, A @ B, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("shape", [(2, 2, 1), (2, 2, 2)])
def test_distributed_residual_matches_host(rng, shape):
    grid = make_grid(shape)
    n, v = 64, 8
    A = rng.standard_normal((n, n)).astype(np.float32)
    desc = BlockCyclic.create(n, n, v, grid)
    G = distribute(A, desc)
    F, perm = lu_25d(G, desc, "tournament")
    res_dist = float(plu_residual_25d(G, F, perm, desc))
    # host reference
    Fh = np.asarray(undistribute(F, desc))
    L = np.tril(Fh, -1) + np.eye(n, dtype=np.float32)
    U = np.triu(Fh)
    res_host = np.linalg.norm(A[np.asarray(perm)] - L @ U) / (n * np.linalg.norm(A))
    assert res_dist < 1e-6
    # both norms sit at f32 rounding-noise level; same order of magnitude
    assert res_host / 3 < res_dist < res_host * 3


@pytest.mark.parametrize("shape", [(2, 2, 1), (2, 2, 2)])
def test_distributed_cholesky_residual(rng, shape):
    from conflux_tpu.cholesky.p25d import cholesky_25d
    from conflux_tpu.pgemm import pchol_residual_25d

    grid = make_grid(shape)
    n, v = 64, 8
    B = rng.standard_normal((n, n))
    A = (B @ B.T + n * np.eye(n)).astype(np.float32)
    desc = BlockCyclic.create(n, n, v, grid)
    G = distribute(A, desc)
    L = cholesky_25d(G, desc)
    res = float(pchol_residual_25d(G, L, desc))
    assert res < 1e-6
    Lh = np.asarray(undistribute(L, desc))
    res_host = np.linalg.norm(A - Lh @ Lh.T) / (n * np.linalg.norm(A))
    assert res_host / 3 < res < res_host * 3
