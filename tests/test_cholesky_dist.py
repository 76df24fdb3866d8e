"""Distributed 2.5D Cholesky gates (SURVEY.md §7 stage 3; BASELINE config 2)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg as sla

from conflux_tpu.cholesky.p25d import cholesky_25d, pcholesky
from conflux_tpu.grid import make_grid
from conflux_tpu.layout import BlockCyclic, distribute, undistribute


def _spd(rng, n):
    B = rng.standard_normal((n, n))
    return (B @ B.T + n * np.eye(n)).astype(np.float32)


@pytest.mark.parametrize(
    "shape,n,v",
    [
        ((2, 2, 1), 64, 8),
        ((2, 2, 2), 64, 8),
        ((4, 2, 1), 64, 8),
        ((2, 4, 1), 64, 8),
        ((1, 2, 4), 64, 8),
        ((2, 2, 2), 128, 16),
        ((1, 1, 1), 32, 8),
    ],
)
def test_cholesky_25d_matches_lapack(rng, shape, n, v):
    grid = make_grid(shape)
    A = _spd(rng, n)
    L = np.asarray(pcholesky(A, grid, v=v))
    Ls = sla.cholesky(A.astype(np.float64), lower=True)
    np.testing.assert_allclose(L, Ls, rtol=2e-3, atol=2e-3)
    res = np.linalg.norm(A - L @ L.T) / (n * np.linalg.norm(A))
    assert res < 1e-6, res


def test_cholesky_25d_padding(rng):
    # non-multiple N exercises the identity padding path
    grid = make_grid((2, 2, 2))
    A = _spd(rng, 56)
    L = np.asarray(pcholesky(A, grid, v=8))
    assert L.shape == (56, 56)
    res = np.linalg.norm(A - L @ L.T) / (56 * np.linalg.norm(A))
    assert res < 1e-6, res


def test_cholesky_25d_v_not_divisible_by_pz(rng):
    # v % Pz != 0 uses nlayr = ceil(v/Pz) with a zero-padded last slice
    # (reference: lu_params.hpp:73)
    grid = make_grid((1, 2, 4))
    n, v = 36, 6  # v=6, Pz=4 -> nlayr=2, last slice half-padded
    A = _spd(rng, n)
    desc = BlockCyclic.create(n, n, v, grid)
    assert desc.nlayr == 2
    L = np.asarray(undistribute(cholesky_25d(distribute(A, desc), desc), desc))
    res = np.linalg.norm(A - (L @ L.T)[:n, :n]) / (n * np.linalg.norm(A))
    assert res < 1e-6


def test_cholesky_25d_z_layers_hold_factor_on_layer0(rng):
    grid = make_grid((2, 2, 2))
    A = _spd(rng, 64)
    desc = BlockCyclic.create(64, 64, 8, grid)
    Lg = cholesky_25d(distribute(A, desc), desc)
    Lh = np.asarray(Lg)
    assert np.all(Lh[1] == 0), "non-zero z>0 layer breaks the partial-sum invariant"
    L = np.asarray(undistribute(Lg, desc))
    np.testing.assert_allclose(
        L, sla.cholesky(A.astype(np.float64), lower=True), rtol=2e-3, atol=2e-3
    )


def test_cholesky_25d_unrolled_matches_fori(rng):
    grid = make_grid((2, 2, 2))
    A = _spd(rng, 96)
    desc = BlockCyclic.create(96, 96, 8, grid)
    G = distribute(A, desc)
    L1 = np.asarray(undistribute(cholesky_25d(G, desc), desc))
    L2 = np.asarray(undistribute(cholesky_25d(G, desc, unroll=True), desc))
    np.testing.assert_allclose(L1, L2, atol=1e-3)
