"""Executable-spec parity: the pure-numpy simulator (conflux_tpu.spec) must
agree pivot-for-pivot with the shard_map SPMD program.

This mirrors the role of the reference's Python rank simulator
(python/conflux.py + python/pivoting.py TournPivot): same candidate
selection, same butterfly reduction tree with the same canonical merge
order, simulated serially in numpy.  Residual tests check "some valid
factorization"; this checks the *pivot decisions* themselves.
"""

import numpy as np
import pytest

from conflux_tpu.grid import make_grid
from conflux_tpu.layout import BlockCyclic, distribute, undistribute
from conflux_tpu.lu.p25d import lu_25d
from conflux_tpu.spec import tournament_lu_np


@pytest.mark.parametrize("shape,n,v", [((2, 2, 1), 64, 8), ((4, 2, 1), 64, 8),
                                       ((2, 2, 2), 64, 8),
                                       # non-power-of-two Px: the log-round
                                       # butterfly_pair tournament
                                       ((3, 2, 1), 48, 8), ((5, 1, 1), 80, 8),
                                       ((6, 1, 1), 48, 8)])
def test_tournament_pivots_match_numpy_spec(rng, shape, n, v):
    grid = make_grid(shape)
    A = rng.standard_normal((n, n)).astype(np.float32)
    desc = BlockCyclic.create(n, n, v, grid)
    F, perm = lu_25d(distribute(A, desc), desc, "tournament")
    Fs, expect, comm = tournament_lu_np(A, v, grid.Px, grid.Pz, grid.Py)
    np.testing.assert_array_equal(np.asarray(perm), expect)
    # the simulator's factor matches the SPMD factor
    np.testing.assert_allclose(
        np.asarray(undistribute(F, desc)), Fs, rtol=1e-3, atol=1e-3
    )
    # the tournament runs exactly ceil(log2 Px) ppermute rounds per step
    if grid.Px > 1:
        expected_rounds = (n // v) * (grid.Px - 1).bit_length()
        assert comm.rounds_x == expected_rounds


def test_spec_residual(rng):
    n, v = 64, 8
    A = rng.standard_normal((n, n)).astype(np.float32)
    F, piv, _ = tournament_lu_np(A, v, Px=2)
    L = np.tril(F, -1) + np.eye(n)
    U = np.triu(F)
    res = np.linalg.norm(A[piv] - L @ U) / (n * np.linalg.norm(A))
    assert res < 1e-12  # the spec runs in float64
