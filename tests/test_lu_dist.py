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


@pytest.mark.parametrize("shape", [(3, 2, 1), (5, 1, 1), (6, 1, 1), (3, 1, 2)])
def test_lu_25d_nonpow2_px_butterfly(rng, shape):
    # non-power-of-two Px runs the log-round butterfly (butterfly_pair
    # receive map, conflux_opt.cpp:59-72), not a gather fallback
    grid = make_grid(shape)
    n = 8 * grid.Px * grid.Py * 2
    A = rng.standard_normal((n, n)).astype(np.float32)
    F, perm = plu(A, grid, v=8, pivoting="tournament")
    assert len(np.unique(np.asarray(perm))) == n
    assert _residual(A, np.asarray(F), np.asarray(perm)) < 1e-6


def test_lu_25d_v_not_divisible_by_pz(rng):
    # v % Pz != 0: nlayr = ceil(v/Pz) with a zero-padded last K slice
    grid = make_grid((2, 1, 4))
    n, v = 60, 6  # nlayr = 2, last slice half-padded
    A = rng.standard_normal((n, n)).astype(np.float32)
    F, perm = plu(A, grid, v=v, pivoting="tournament")
    from conflux_tpu.layout import BlockCyclic as BC, pad_like

    desc = BC.create(n, n, v, grid)
    Ap = np.asarray(pad_like(A, desc))
    assert _residual(Ap, np.asarray(F), np.asarray(perm)) < 1e-6


@pytest.mark.parametrize("shape,m,n,v", [
    ((2, 2, 1), 96, 64, 8),
    ((2, 2, 2), 96, 64, 8),
    ((3, 2, 1), 104, 48, 8),
])
def test_lu_25d_rectangular_tall(rng, shape, m, n, v):
    # tall M > N distributed LU (reference: rectangular padding,
    # lu_params.hpp:67-82): trapezoid factors + pivot vector of length M
    from conflux_tpu.layout import pad_like

    grid = make_grid(shape)
    A = rng.standard_normal((m, n)).astype(np.float32)
    F, perm = plu(A, grid, v=v, pivoting="tournament")
    Fh = np.asarray(F)
    perm = np.asarray(perm)
    desc = BlockCyclic.create(m, n, v, grid)
    Ap = np.asarray(pad_like(A, desc))
    mg, ng = Ap.shape
    assert perm.shape == (mg,)
    assert len(np.unique(perm)) == mg, "pivot vector is not a permutation"
    L = np.tril(Fh[:, :ng], -1) + np.eye(mg, ng, dtype=np.float32)
    U = np.triu(Fh[:ng, :ng])
    res = np.linalg.norm(Ap[perm] - L @ U) / (ng * np.linalg.norm(Ap))
    assert res < 1e-6
    # tail rows (never pivoted) appear in ascending original-row order
    tail = perm[ng:]
    assert np.all(np.diff(tail) > 0)


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
    # rowpart=0 keeps the unrolled variant on the fori variant's row layout,
    # so tournament pivots must be IDENTICAL (rebalanced runs change the
    # tournament groups — covered by test_lu_25d_row_frontier)
    import jax.numpy as jnp
    from conflux_tpu.layout import distribute, undistribute

    grid = make_grid((2, 2, 2))
    n, v = 64, 8
    A = rng.standard_normal((n, n)).astype(np.float32)
    desc = BlockCyclic.create(n, n, v, grid)
    G = distribute(A, desc)
    F1, p1 = lu_25d(G, desc, "tournament")
    F2, p2 = lu_25d(G, desc, "tournament", unroll=True, rowpart=0)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_allclose(
        np.asarray(undistribute(F1, desc)),
        np.asarray(undistribute(F2, desc)),
        atol=1e-3,
    )


@pytest.mark.parametrize("variant,shape", [
    ("unrolled", (2, 2, 1)),
    ("unrolled", (2, 2, 2)),
    ("unrolled", (3, 2, 1)),   # Px does not divide live evenly: pad slots
    ("lookahead", (2, 2, 2)),
    ("windowed", (2, 2, 2)),
    ("unrolled", (1, 1, 1)),   # Px=1: rebalance degenerates to local bands
    ("crout", (2, 2, 2)),
    ("crout", (3, 2, 1)),
])
def test_lu_25d_row_frontier(rng, variant, shape):
    # the shrinking-row working set (_rebalance_rows): pivots differ from
    # the masked full-height run (CALU groups moved), but the factorization
    # must stay a gate-quality CALU — valid permutation + 1e-6 residual
    from conflux_tpu.layout import pad_like, undistribute

    grid = make_grid(shape)
    n, v = 96, 8
    A = rng.standard_normal((n, n)).astype(np.float32)
    desc = BlockCyclic.create(n, n, v, grid)
    G = distribute(A, desc)
    kw = {"rowpart": 1} if variant != "windowed" else {"windows": 4}
    F, perm = lu_25d(G, desc, "tournament", unroll=variant, **kw)
    perm = np.asarray(perm)
    Ap = np.asarray(pad_like(A, desc))
    assert len(np.unique(perm)) == Ap.shape[0]
    res = _residual(Ap, np.asarray(undistribute(F, desc)), perm)
    assert res < 1e-6, (variant, shape, res)


def test_lu_25d_row_frontier_full_pivot_parity(rng):
    # 'full' pivoting is layout-INDEPENDENT (candidates sorted by global id
    # in _full_pivot): the rebalanced run must stay pivot-for-pivot equal to
    # the masked fori run even though the row layout diverges
    grid = make_grid((2, 2, 2))
    n, v = 96, 8
    A = rng.standard_normal((n, n)).astype(np.float32)
    desc = BlockCyclic.create(n, n, v, grid)
    G = distribute(A, desc)
    _, p_fori = lu_25d(G, desc, "full")
    _, p_reb = lu_25d(G, desc, "full", unroll="unrolled", rowpart=1)
    np.testing.assert_array_equal(np.asarray(p_fori), np.asarray(p_reb))


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


def test_lu_25d_windowed_matches_fori(rng):
    # windowed variant (dispatch.segment_bounds segments, one fori body per
    # static column window) at rowpart=0 (fori row layout): pivot-identical
    # and factor-close to the reference fori rank program
    from conflux_tpu.layout import undistribute

    grid = make_grid((2, 2, 2))
    n, v = 96, 8  # Nt = 12 steps over the default 8 windows
    A = rng.standard_normal((n, n)).astype(np.float32)
    desc = BlockCyclic.create(n, n, v, grid)
    G = distribute(A, desc)
    F1, p1 = lu_25d(G, desc, "tournament", unroll=False)
    F2, p2 = lu_25d(G, desc, "tournament", unroll="windowed", rowpart=0)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_allclose(
        np.asarray(undistribute(F1, desc)),
        np.asarray(undistribute(F2, desc)),
        atol=1e-3,
    )
    # few-window edge: window count below the segment granularity
    F3, p3 = lu_25d(G, desc, "tournament", unroll="windowed", windows=3,
                    rowpart=0)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p3))


def test_lu_25d_windowed_nt128_compile_scale(rng):
    # the designated large-Nt scale path at a REAL step count (VERDICT r3
    # Missing #2): Nt = 128 steps in 8 windows must trace, compile and run
    # — trace size is bounded by the window count, not Nt (measured 35.7 s
    # compile+run on the 8-device CPU mesh, vs the unrolled variant whose
    # trace grows with all 128 steps)
    from conflux_tpu.layout import undistribute

    grid = make_grid((2, 2, 1))
    n, v = 1024, 8  # Nt = 128
    A = rng.standard_normal((n, n)).astype(np.float32)
    desc = BlockCyclic.create(n, n, v, grid)
    assert desc.Nt == 128
    G = distribute(A, desc)
    F, perm = lu_25d(G, desc, "tournament", unroll="windowed", windows=8)
    res = _residual(A, np.asarray(undistribute(F, desc)), np.asarray(perm))
    assert res < 1e-6, res


def test_lu_25d_windowed_rectangular_pz2(rng):
    # windowed variant through the tall-tail epilogue at Pz = 2
    from conflux_tpu.layout import BlockCyclic, distribute, pad_like, undistribute

    grid = make_grid((2, 2, 2))
    m, n, v = 96, 64, 8
    A = rng.standard_normal((m, n)).astype(np.float32)
    desc = BlockCyclic.create(m, n, v, grid)
    G = distribute(A, desc)
    F, perm = lu_25d(G, desc, "tournament", unroll="windowed", windows=4)
    Fh = np.asarray(undistribute(F, desc))
    perm = np.asarray(perm)
    Ap = np.asarray(pad_like(A, desc))
    mg, ng = Ap.shape
    assert len(np.unique(perm)) == mg
    L = np.tril(Fh[:, :ng], -1) + np.eye(mg, ng, dtype=np.float32)
    U = np.triu(Fh[:ng, :ng])
    res = np.linalg.norm(Ap[perm] - L @ U) / (ng * np.linalg.norm(Ap))
    assert res < 1e-6


def test_lu_25d_lookahead_matches_unrolled(rng):
    # lookahead = unrolled + split trailing updates (next panel column first,
    # bulk after): must be pivot-identical — the split changes dependence
    # structure, not arithmetic coverage
    from conflux_tpu.layout import undistribute

    grid = make_grid((2, 2, 2))
    n, v = 96, 8
    A = rng.standard_normal((n, n)).astype(np.float32)
    desc = BlockCyclic.create(n, n, v, grid)
    G = distribute(A, desc)
    F1, p1 = lu_25d(G, desc, "tournament", unroll="unrolled")
    F2, p2 = lu_25d(G, desc, "tournament", unroll="lookahead")
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    # factors agree to fp-divergence level only: the split trailing GEMM
    # reassociates sums, so late-step entries drift a few ulps of the
    # growth-amplified magnitudes (measured max 1.8e-4 at n=96 after the
    # batched-inverse TRSM landed; atol=1e-4 was one rounding nudge from
    # the edge)
    np.testing.assert_allclose(
        np.asarray(undistribute(F1, desc)),
        np.asarray(undistribute(F2, desc)),
        atol=1e-3,
    )


@pytest.mark.parametrize("shape,n,v,pivoting", [
    ((2, 2, 2), 64, 8, "tournament"),
    ((2, 2, 2), 64, 8, "full"),
    ((4, 2, 1), 64, 8, "gather"),
    ((2, 4, 1), 64, 8, "tournament"),
    ((1, 2, 4), 64, 8, "tournament"),
    # Px == 1: the FUSED panel path (merged=False finishing + lu00
    # y-psum, lu/p25d.py `fin`) under both its pivoting modes
    ((1, 2, 4), 64, 8, "gather"),
    ((1, 4, 2), 64, 8, "tournament"),
])
def test_lu_25d_crout_residual(rng, shape, n, v, pivoting):
    # the LEFT-LOOKING rank program (no trailing update; big-K panel
    # assembly + U12 finish GEMMs — _local_lu_25d_crout)
    from conflux_tpu.layout import undistribute

    grid = make_grid(shape)
    A = rng.standard_normal((n, n)).astype(np.float32)
    desc = BlockCyclic.create(n, n, v, grid)
    G = distribute(A, desc)
    F, perm = lu_25d(G, desc, pivoting, unroll="crout")
    perm = np.asarray(perm)
    assert len(np.unique(perm)) == n
    res = _residual(A, np.asarray(undistribute(F, desc)), perm)
    assert res < 1e-6, (pivoting, res)


def test_lu_25d_crout_vs_fori_residual(rng):
    # left- and right-looking programs compute the same factorization up to
    # summation order; fp-tie pivots may legally differ between schemes
    # (CLAUDE.md: cross-scheme tests gate residuals, not pivot equality),
    # so both must independently pass the gate on the same input
    from conflux_tpu.layout import undistribute

    grid = make_grid((2, 2, 2))
    n, v = 96, 8
    A = rng.standard_normal((n, n)).astype(np.float32)
    desc = BlockCyclic.create(n, n, v, grid)
    G = distribute(A, desc)
    F1, p1 = lu_25d(G, desc, "tournament")
    F2, p2 = lu_25d(G, desc, "tournament", unroll="crout", rowpart=0)
    for F, p in ((F1, p1), (F2, p2)):
        assert _residual(A, np.asarray(undistribute(F, desc)),
                         np.asarray(p)) < 1e-6
    # at rowpart=0 the row layout matches the fori run, so the tournament
    # GROUPS are identical; on non-degenerate random input the pivots
    # agree too (ties have measure zero)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_lu_25d_crout_rectangular_tall_pz2(rng):
    from conflux_tpu.layout import pad_like, undistribute

    grid = make_grid((2, 2, 2))
    m, n, v = 96, 64, 8
    A = rng.standard_normal((m, n)).astype(np.float32)
    desc = BlockCyclic.create(m, n, v, grid)
    G = distribute(A, desc)
    F, perm = lu_25d(G, desc, "tournament", unroll="crout")
    Fh = np.asarray(undistribute(F, desc))
    perm = np.asarray(perm)
    Ap = np.asarray(pad_like(A, desc))
    mg, ng = Ap.shape
    assert len(np.unique(perm)) == mg
    L = np.tril(Fh[:, :ng], -1) + np.eye(mg, ng, dtype=np.float32)
    U = np.triu(Fh[:ng, :ng])
    res = np.linalg.norm(Ap[perm] - L @ U) / (ng * np.linalg.norm(Ap))
    assert res < 1e-6


@pytest.mark.parametrize("shape", [(2, 2, 1), (2, 2, 2), (1, 2, 4)])
@pytest.mark.parametrize("variant", ["fori", "unrolled", "windowed", "crout"])
def test_lu_25d_bf16_storage(rng, shape, variant):
    # bf16 STORAGE mode (VERDICT r2 missing #5): local blocks, z-partials
    # and the factor live in bfloat16; panels/pivoting/TRSMs/reductions run
    # f32. Residual plateaus at the bf16 storage level (measured ~1.5e-4
    # normalized at n=128 on the CPU mesh), far above the f32 paths' 1e-8
    # but far below a junk factor's ~1/n.
    from conflux_tpu.layout import undistribute

    grid = make_grid(shape)
    n, v = 128, 16
    A = rng.standard_normal((n, n)).astype(np.float32)
    desc = BlockCyclic.create(n, n, v, grid)
    G = distribute(jnp.asarray(A, jnp.bfloat16), desc)
    F, perm = lu_25d(G, desc, precision="high", unroll=variant)
    assert F.dtype == jnp.bfloat16
    Fh = np.asarray(undistribute(F, desc)).astype(np.float32)
    perm = np.asarray(perm)
    assert len(np.unique(perm)) == n
    assert _residual(A, Fh, perm) < 6e-4
