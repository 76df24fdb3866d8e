"""retile (COSTA transform parity) + distributed checkpoint IO."""

import numpy as np

from conflux_tpu.grid import make_grid
from conflux_tpu.io import load_dist, save_dist
from conflux_tpu.layout import BlockCyclic, distribute, retile, undistribute


def test_retile_changes_tile_size(rng):
    grid = make_grid((2, 2, 2))
    A = rng.standard_normal((64, 64)).astype(np.float32)
    src = BlockCyclic.create(64, 64, 8, grid)
    dst = BlockCyclic.create(64, 64, 16, grid)
    G2 = retile(distribute(A, src), src, dst)
    assert G2.shape == dst.global_shape()
    np.testing.assert_array_equal(np.asarray(undistribute(G2, dst)), A)


def test_retile_changes_grid_split(rng):
    grid_a = make_grid((4, 2, 1))
    grid_b = make_grid((2, 2, 2))
    # different Grid objects share the same devices but different meshes;
    # retile requires one mesh — build both descs on one grid, vary (v, Pz)
    A = rng.standard_normal((64, 64)).astype(np.float32)
    src = BlockCyclic.create(64, 64, 8, grid_a)
    dst = BlockCyclic.create(64, 64, 4, grid_a)
    np.testing.assert_array_equal(
        np.asarray(undistribute(retile(distribute(A, src), src, dst), dst)), A
    )


def test_save_load_dist_roundtrip(rng, tmp_path):
    grid = make_grid((2, 2, 2))
    A = rng.standard_normal((32, 32)).astype(np.float32)
    desc = BlockCyclic.create(32, 32, 4, grid)
    G = distribute(A, desc)
    p = str(tmp_path / "ckpt.bin")
    save_dist(p, G, desc)
    G2 = load_dist(p, desc)
    np.testing.assert_allclose(
        np.asarray(undistribute(G2, desc)), A, atol=1e-6
    )
