"""Distributed 2.5D LU gates (SURVEY.md §7 stages 5-6; BASELINE configs 3-4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conflux_tpu.grid import make_grid
from conflux_tpu.layout import BlockCyclic, distribute
from conflux_tpu.lu.p25d import lu_25d, plu
from conflux_tpu.lu.single import lu_factor


def _residual(A, F, perm):
    n = A.shape[0]
    L = np.tril(np.asarray(F), -1) + np.eye(n, dtype=np.float32)
    U = np.triu(np.asarray(F))
    PA = A[np.asarray(perm)]
    return np.linalg.norm(PA - L @ U) / (n * np.linalg.norm(A))


@pytest.mark.parametrize(
    "shape,n,v,pivoting",
    [
        ((2, 2, 1), 64, 8, "tournament"),
        ((2, 2, 2), 64, 8, "tournament"),
        ((4, 2, 1), 64, 8, "tournament"),
        ((2, 4, 1), 64, 8, "tournament"),
        ((1, 2, 4), 64, 8, "tournament"),
        ((2, 2, 2), 128, 16, "tournament"),
        ((1, 1, 1), 32, 8, "tournament"),
        ((2, 2, 2), 64, 8, "gather"),
        ((2, 2, 2), 64, 8, "full"),
    ],
)
def test_lu_25d_residual(rng, shape, n, v, pivoting):
    grid = make_grid(shape)
    A = rng.standard_normal((n, n)).astype(np.float32)
    F, perm = plu(A, grid, v=v, pivoting=pivoting)
    perm = np.asarray(perm)
    assert len(np.unique(perm)) == n, "pivot vector is not a permutation"
    res = _residual(A, np.asarray(F), perm)
    assert res < 1e-6, (pivoting, res)


def test_lu_25d_nonpow2_px_falls_back(rng):
    # Px=3 is not a power of two: butterfly must fall back to the gather merge
    grid = make_grid((3, 2, 1))
    A = rng.standard_normal((48, 48)).astype(np.float32)
    F, perm = plu(A, grid, v=8, pivoting="tournament")
    assert _residual(A, np.asarray(F), np.asarray(perm)) < 1e-6


def test_lu_25d_none_pivoting_diag_dominant(rng):
    # round-robin (EmptyPivot) is only stable for diagonally dominant input
    grid = make_grid((2, 2, 1))
    n = 64
    A = (rng.standard_normal((n, n)) + n * np.eye(n)).astype(np.float32)
    F, perm = plu(A, grid, v=8, pivoting="none")
    np.testing.assert_array_equal(np.asarray(perm), np.arange(n))
    assert _residual(A, np.asarray(F), np.asarray(perm)) < 1e-6


def test_lu_25d_full_matches_single_device(rng):
    # 'full' pivoting = exact partial pivoting: must agree with the
    # single-device blocked LU pivot-for-pivot (same seeded matrix)
    grid = make_grid((2, 2, 2))
    n, v = 64, 8
    A = rng.standard_normal((n, n)).astype(np.float32)
    F_d, perm_d = plu(A, grid, v=v, pivoting="full")
    F_s, perm_s = lu_factor(jnp.asarray(A), v=v)
    np.testing.assert_array_equal(np.asarray(perm_d), np.asarray(perm_s))
    np.testing.assert_allclose(np.asarray(F_d), np.asarray(F_s), atol=1e-3)


def test_lu_25d_tournament_pivots_replicated(rng):
    # the pivot vector must come out identical no matter which device slot we
    # read — guards the canonical-merge-order determinism
    grid = make_grid((2, 2, 2))
    n, v = 64, 8
    A = rng.standard_normal((n, n)).astype(np.float32)
    desc = BlockCyclic.create(n, n, v, grid)
    F, perm = lu_25d(distribute(A, desc), desc, "tournament")
    assert len(np.unique(np.asarray(perm))) == n


def test_lu_25d_unrolled_matches_fori(rng):
    import jax.numpy as jnp
    from conflux_tpu.layout import distribute, undistribute

    grid = make_grid((2, 2, 2))
    n, v = 64, 8
    A = rng.standard_normal((n, n)).astype(np.float32)
    desc = BlockCyclic.create(n, n, v, grid)
    G = distribute(A, desc)
    F1, p1 = lu_25d(G, desc, "tournament")
    F2, p2 = lu_25d(G, desc, "tournament", unroll=True)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_allclose(
        np.asarray(undistribute(F1, desc)),
        np.asarray(undistribute(F2, desc)),
        atol=1e-3,
    )


def test_lu_25d_nonsquare_grid_square_matrix(rng):
    # Px != Py used to produce a non-square padded descriptor and abort
    from conflux_tpu.layout import pad_like
    from conflux_tpu.pgemm import plu_residual_25d

    grid = make_grid((4, 2, 1))
    n, v = 72, 8  # not a multiple of v*Px: exercises square lcm padding
    A = rng.standard_normal((n, n)).astype(np.float32)
    desc = BlockCyclic.create(n, n, v, grid)
    assert desc.M == desc.N
    from conflux_tpu.layout import distribute

    G = distribute(A, desc)
    F, perm = lu_25d(G, desc, "tournament")
    # residual against the padded problem (LU pivoting interleaves padding)
    Ap = np.asarray(pad_like(A, desc))
    res = _residual(Ap, np.asarray(
        __import__("conflux_tpu.layout", fromlist=["undistribute"]).undistribute(F, desc)
    ), np.asarray(perm))
    assert res < 1e-6
    # and the distributed residual masked to the user's N
    res_true = float(plu_residual_25d(G, F, perm, desc, n_true=n))
    assert res_true < 1e-6
