"""Per-substep profiled driver gates (the reference's PE/PL/PP substep
attribution, src/conflux/lu/profiler.hpp:5-19 + the region names
throughout conflux_opt.hpp)."""

import numpy as np

from conflux_tpu import profiler
from conflux_tpu.grid import make_grid
from conflux_tpu.layout import BlockCyclic, distribute
from conflux_tpu.lu.p25d import lu_25d
from conflux_tpu.lu.profiled import lu_25d_profiled

SUBSTEPS = ("step0_reduce", "step1_pivot", "step23_rows", "step45_trsm",
            "step6_update")


def test_profiled_bit_identical_to_fori(rng):
    # the attribution driver must run the SAME math as the fused fori rank
    # program — pivots AND factors bit for bit (otherwise the table
    # attributes a different program)
    n, v = 64, 8
    A = rng.standard_normal((n, n)).astype(np.float32)
    grid = make_grid((2, 2, 2))
    desc = BlockCyclic.create(n, n, v, grid)
    G = distribute(A, desc)
    F1, p1 = lu_25d_profiled(G, desc, "tournament")
    F2, p2 = lu_25d(G, desc, "tournament", unroll=False)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(F1), np.asarray(F2))


def test_profiled_region_table(rng):
    n, v = 64, 8
    A = rng.standard_normal((n, n)).astype(np.float32)
    grid = make_grid((2, 2, 1))
    desc = BlockCyclic.create(n, n, v, grid)
    G = distribute(A, desc)
    profiler.enable(True)
    profiler.PC()
    try:
        lu_25d_profiled(G, desc, "tournament")
        report = profiler._GLOBAL.report()
        root = profiler._GLOBAL.root
        for name in SUBSTEPS:
            assert name in report
            assert root.children[name].calls == desc.Nt, name
            assert root.children[name].wall > 0
    finally:
        profiler.enable(False)
        profiler.PC()


CHOL_SUBSTEPS = ("step0_reduce", "step1_potrf", "step2_trsm_write",
                 "step3_bcast", "step4_update")


def _spd(rng, n):
    B = rng.standard_normal((n, n)).astype(np.float32)
    return (B + B.T) / 2 + 2 * n * np.eye(n, dtype=np.float32)


def test_cholesky_profiled_bit_identical_to_fori(rng):
    # same gate as the LU driver: the Cholesky attribution driver must run
    # the SAME math as the fused fori rank program, factor bit for bit
    from conflux_tpu.cholesky.p25d import cholesky_25d
    from conflux_tpu.cholesky.profiled import cholesky_25d_profiled

    n, v = 64, 8
    S = _spd(rng, n)
    desc = BlockCyclic.create(n, n, v, make_grid((2, 2, 2)))
    G = distribute(S, desc)
    L1 = cholesky_25d_profiled(G, desc)
    L2 = cholesky_25d(G, desc, unroll=False)
    np.testing.assert_array_equal(np.asarray(L1), np.asarray(L2))


def test_cholesky_profiled_region_table(rng):
    from conflux_tpu.cholesky.profiled import cholesky_25d_profiled

    n, v = 64, 8
    S = _spd(rng, n)
    desc = BlockCyclic.create(n, n, v, make_grid((2, 2, 1)))
    G = distribute(S, desc)
    profiler.enable(True)
    profiler.PC()
    try:
        cholesky_25d_profiled(G, desc)
        report = profiler._GLOBAL.report()
        root = profiler._GLOBAL.root
        for name in CHOL_SUBSTEPS:
            assert name in report
            assert root.children[name].calls == desc.Nt, name
            assert root.children[name].wall > 0
    finally:
        profiler.enable(False)
        profiler.PC()
