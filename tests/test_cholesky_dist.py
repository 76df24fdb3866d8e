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


def test_cholesky_25d_windowed_matches_fori(rng):
    grid = make_grid((2, 2, 2))
    A = _spd(rng, 96)
    desc = BlockCyclic.create(96, 96, 8, grid)
    G = distribute(A, desc)
    L1 = np.asarray(undistribute(cholesky_25d(G, desc, unroll=False), desc))
    L2 = np.asarray(
        undistribute(cholesky_25d(G, desc, unroll="windowed"), desc)
    )
    np.testing.assert_allclose(L1, L2, atol=1e-3)
    L3 = np.asarray(
        undistribute(cholesky_25d(G, desc, unroll="windowed", windows=5), desc)
    )
    np.testing.assert_allclose(L1, L3, atol=1e-3)


def test_dispatch_variant_rules():
    # the measured dispatch table (dispatch.choose_variant) stays consistent
    # with segment_bounds' coverage guarantees
    from types import SimpleNamespace

    from conflux_tpu.dispatch import choose_variant, normalize_variant, segment_bounds

    class D:  # minimal descriptor stub
        def __init__(self, N, Nt, grid=(1, 1, 1)):
            self.N, self.Nt = N, Nt
            self.v = max(1, N // Nt)
            Px, Py, Pz = grid
            self.grid = SimpleNamespace(Px=Px, Py=Py, Pz=Pz, P=Px * Py * Pz)

    assert choose_variant(D(131072, 512), "lu") == "windowed"
    assert choose_variant(D(2048, 8), "lu") == "fori"
    assert choose_variant(D(4096, 8), "cholesky") == "lookahead"
    # grid-keyed LU rule (the reference's table keys on (P, N) too,
    # Cholesky.cpp:857-921): the crout variant is gated by its MODELED
    # comm premium over the right-looking schedule (jaxpr-enforced
    # counters, spec.model_comm_volume) — the choice must FLIP with P at
    # fixed N: premium-free at P=1 (273.6 ms vs 281 windowed at the
    # 1-device proxy, results/variant_dispatch.csv), 1.83x modeled
    # premium already at 2x2x1 (and 4.1x at 16x16x1)
    assert choose_variant(D(16384, 16), "lu") == "crout"
    assert choose_variant(D(16384, 16, grid=(2, 2, 1)), "lu") == "windowed"
    assert choose_variant(D(16384, 16, grid=(8, 8, 1)), "lu") == "windowed"
    # r4 regen: crout wins cholesky from N >= 8192 (variant_dispatch.csv
    # 8192/16384 rows; falls back to windowed past the Nt trace bound) —
    # and its comm model is grid-uniformly cheaper, so no grid gate
    assert choose_variant(D(16384, 32), "cholesky") == "crout"
    assert choose_variant(D(16384, 32, grid=(8, 8, 1)), "cholesky") == "crout"
    assert choose_variant(D(262144, 512), "cholesky") == "windowed"
    # per-algorithm trace ceiling + the crout grid gate's boundary
    from conflux_tpu.dispatch import MAX_UNROLLED_STEPS, _lu_crout_grid_ok
    from conflux_tpu.lu.p25d import crout_rowpart_default

    assert MAX_UNROLLED_STEPS["lu"] >= 128  # Nt=128 windowed compile-proven
    assert _lu_crout_grid_ok(D(16384, 16))           # P = 1: premium-free
    assert not _lu_crout_grid_ok(D(16384, 16, grid=(2, 2, 1)))
    # measured cadence rule (results/r5_experiments.md): ~Nt/4 rebalances
    # capped at a 4-panel-per-device shrink, floored at the grid height
    assert crout_rowpart_default(1, 16) == 4
    assert crout_rowpart_default(1, 8) == 2
    assert crout_rowpart_default(1, 32) == 4
    assert crout_rowpart_default(4, 4) == 4   # floor at Px
    assert crout_rowpart_default(2, 32) == 8

    assert normalize_variant(True, D(64, 8), "lu") == "unrolled"
    assert normalize_variant(False, D(64, 8), "lu") == "fori"
    assert normalize_variant("windowed", D(64, 8), "lu") == "windowed"
    for Nt in (1, 7, 8, 9, 64, 257):
        for w in (1, 3, 8):
            b = segment_bounds(Nt, w)
            assert b[0][0] == 0 and b[-1][1] == Nt
            assert all(lo < hi for lo, hi in b)
            assert all(b[i][1] == b[i + 1][0] for i in range(len(b) - 1))
            assert len(b) <= max(1, min(w, Nt))


def test_cholesky_25d_lookahead_matches_unrolled(rng):
    grid = make_grid((2, 2, 2))
    A = _spd(rng, 96)
    desc = BlockCyclic.create(96, 96, 8, grid)
    G = distribute(A, desc)
    L1 = np.asarray(undistribute(cholesky_25d(G, desc, unroll="unrolled"), desc))
    L2 = np.asarray(undistribute(cholesky_25d(G, desc, unroll="lookahead"), desc))
    np.testing.assert_allclose(L1, L2, atol=1e-4)


@pytest.mark.parametrize("shape,n,v", [
    ((2, 2, 2), 64, 8),
    ((4, 2, 1), 64, 8),
    ((2, 4, 1), 96, 8),
    ((1, 2, 4), 64, 8),
])
def test_cholesky_25d_crout_residual(rng, shape, n, v):
    # the LEFT-LOOKING rank program (no trailing update; big-K column
    # assembly against the frozen L columns — _local_cholesky_25d_crout)
    grid = make_grid(shape)
    A = _spd(rng, n)
    desc = BlockCyclic.create(n, n, v, grid)
    G = distribute(A, desc)
    L = np.asarray(undistribute(cholesky_25d(G, desc, unroll="crout"), desc))
    res = np.linalg.norm(A - L @ L.T) / (n * np.linalg.norm(A))
    assert res < 1e-6, (shape, res)


def test_cholesky_25d_crout_matches_fori(rng):
    # left- and right-looking evaluate the same sums in different orders:
    # factors agree to fp-reassociation level
    grid = make_grid((2, 2, 2))
    A = _spd(rng, 96)
    desc = BlockCyclic.create(96, 96, 8, grid)
    G = distribute(A, desc)
    L1 = np.asarray(undistribute(cholesky_25d(G, desc), desc))
    L2 = np.asarray(undistribute(cholesky_25d(G, desc, unroll="crout"), desc))
    np.testing.assert_allclose(L1, L2, atol=1e-3)


@pytest.mark.parametrize("shape", [(2, 2, 1), (2, 2, 2)])
@pytest.mark.parametrize("variant", ["fori", "unrolled", "windowed", "crout"])
def test_cholesky_25d_bf16_storage(rng, shape, variant):
    # bf16 STORAGE mode (VERDICT r2 missing #5): blocks/partials/factor in
    # bfloat16, potrf/TRSM/reductions f32 (measured ~3e-5 normalized
    # residual at n=128 on the CPU mesh)
    grid = make_grid(shape)
    n, v = 128, 16
    A = _spd(rng, n)
    desc = BlockCyclic.create(n, n, v, grid)
    G = distribute(jnp.asarray(A, jnp.bfloat16), desc)
    L = cholesky_25d(G, desc, precision="high", unroll=variant)
    assert L.dtype == jnp.bfloat16
    Lh = np.asarray(undistribute(L, desc)).astype(np.float32)
    res = np.linalg.norm(A - Lh @ Lh.T) / (n * np.linalg.norm(A))
    assert res < 2e-4
