"""Grid heuristics and block-cyclic layout algebra tests (SURVEY.md §7 stage 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from conflux_tpu.grid import (
    choose_decomposition,
    choose_grid_cholesky,
    choose_grid_lu,
    choose_parameters,
    choose_tile_cholesky,
    make_grid,
)
from conflux_tpu.layout import (
    BlockCyclic,
    butterfly_pair,
    distribute,
    g2l,
    g2l_row,
    l2g,
    local_row_to_global,
    redistribute,
    undistribute,
)


def test_choose_grid_lu_square():
    assert choose_grid_lu(4096, 4096, 16) == (4, 4, 1)
    assert choose_grid_lu(4096, 4096, 64) == (8, 8, 1)
    assert choose_grid_lu(4096, 4096, 8) == (2, 2, 2)
    px, py, pz = choose_grid_lu(4096, 4096, 12)
    assert px * py * pz <= 12 and px >= py >= pz


def test_choose_grid_cholesky():
    assert choose_grid_cholesky(8, 8192) == (2, 2, 2)
    assert choose_grid_cholesky(512, 65536) == (16, 16, 2)
    assert choose_grid_cholesky(16, 65536) == (4, 4, 1)
    assert choose_grid_cholesky(8, 65536) == (4, 2, 1)


def test_choose_tile_cholesky():
    assert choose_tile_cholesky(2048, (2, 2, 1), 4) == 128
    assert choose_tile_cholesky(16384, (4, 4, 1), 16) == 256
    assert choose_tile_cholesky(65536, (8, 8, 1), 64) == 512
    assert choose_tile_cholesky(131072, (16, 16, 1), 256) == 512
    assert choose_tile_cholesky(262144, (16, 16, 1), 256) == 1024


def test_choose_decomposition():
    ppp, c = choose_decomposition(8)
    assert ppp * ppp * c <= 8
    sqrtp1, c, v, n = choose_parameters(16, 8)
    assert n % (v * sqrtp1) == 0


def test_index_maps():
    # round trip: l2g(g2l(g)) == g
    g = np.arange(64)
    p, l = g2l(g, 4)
    np.testing.assert_array_equal(l2g(p, l, 4), g)
    pown, lrow = g2l_row(np.arange(256), Px=4, v=8)
    assert pown.max() == 3
    # device 0 local rows map back
    gri = np.asarray(local_row_to_global(0, 4, 8, 64))
    pown2, lrow2 = g2l_row(gri, 4, 8)
    np.testing.assert_array_equal(pown2, 0)
    np.testing.assert_array_equal(lrow2, np.arange(64))


def test_butterfly_pair_pow2_and_non_pow2():
    # power of two: pure XOR
    for r in range(2):
        for pi in range(4):
            assert butterfly_pair(pi, r, 4) == pi ^ (1 << r)
    # non-power-of-two: always lands inside the grid
    for px in (3, 5, 6, 7):
        for r in range(3):
            for pi in range(px):
                assert 0 <= butterfly_pair(pi, r, px) < px


@pytest.mark.parametrize("shape", [(2, 2, 2), (4, 2, 1), (2, 2, 1)])
def test_distribute_roundtrip(rng, shape):
    grid = make_grid(shape)
    desc = BlockCyclic.create(64, 64, 8, grid)
    A = rng.standard_normal((64, 64)).astype(np.float32)
    G = distribute(A, desc)
    assert G.shape == desc.global_shape()
    back = np.asarray(undistribute(G, desc))
    np.testing.assert_array_equal(back, A)


def test_distribute_pads_with_identity(rng):
    grid = make_grid((2, 2, 1))
    desc = BlockCyclic.create(40, 40, 8, grid)  # pads to 48
    assert (desc.M, desc.N) == (48, 48)
    A = rng.standard_normal((40, 40)).astype(np.float32)
    back = np.asarray(undistribute(distribute(A, desc), desc))
    np.testing.assert_array_equal(back[:40, :40], A)
    np.testing.assert_array_equal(back[40:, 40:], np.eye(8, dtype=np.float32))


def test_distribute_local_block_is_tile_cyclic(rng):
    # device (pi,pj) must hold tiles (i%Px==pi, j%Py==pj) — the reference's
    # distribution (conflux_opt.cpp:74-98, layout.cpp:116-123)
    grid = make_grid((2, 2, 1))
    v = 4
    desc = BlockCyclic.create(16, 16, v, grid)
    A = np.arange(256, dtype=np.float32).reshape(16, 16)
    G = distribute(A, desc)
    # global permuted array: block (pi, pj) at [pi*Ml:(pi+1)*Ml, pj*Nl:...]
    Gh = np.asarray(G)[0]
    for pi in range(2):
        for pj in range(2):
            blk = Gh[pi * desc.Ml : (pi + 1) * desc.Ml, pj * desc.Nl : (pj + 1) * desc.Nl]
            for li in range(desc.Mtl):
                for lj in range(desc.Ntl):
                    gi, gj = li * 2 + pi, lj * 2 + pj
                    np.testing.assert_array_equal(
                        blk[li * v : (li + 1) * v, lj * v : (lj + 1) * v],
                        A[gi * v : (gi + 1) * v, gj * v : (gj + 1) * v],
                    )


def test_redistribute_to_row_sharding(rng):
    grid = make_grid((2, 2, 2))
    desc = BlockCyclic.create(32, 32, 4, grid)
    A = rng.standard_normal((32, 32)).astype(np.float32)
    G = distribute(A, desc)
    flat = redistribute(G, NamedSharding(grid.mesh, P(None, ("x", "y"), None)))
    np.testing.assert_array_equal(np.asarray(flat), np.asarray(G))
