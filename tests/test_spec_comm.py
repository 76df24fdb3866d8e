"""Communication-volume accounting gates (VERDICT item 9).

The spec counts the elements each collective of the SPMD program actually
moves (shape-derived, ring model — see conflux_tpu/spec.py docstring), the
analog of the reference simulator's measured per-rank counts
(python/conflux.py:114-119,345-360). These tests pin the counts to closed
forms computed independently and assert the 2.5D scaling law.
"""

import numpy as np
import pytest

from conflux_tpu.spec import CommVolume, tournament_lu_np


def _run(n, v, Px, Pz, Py=2, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    _, _, comm = tournament_lu_np(A, v, Px, Pz, Py)
    return comm


def test_counters_match_closed_forms():
    n, v, Px, Py, Pz = 64, 8, 2, 2, 2
    comm = _run(n, v, Px, Pz, Py)
    Nt = n // v
    Ml, Nl, l = n // Px, n // Py, v // Pz
    # step-0 panel column z-psum: [Ml, v] over Pz, on every (x, y) column
    assert comm.psum_z == Nt * 2 * Ml * v * (Pz - 1) * Px * Py
    # butterfly: Px=2 -> 1 round, 2 ppermute pairs, on every (y, z) replica
    assert comm.rounds_x == Nt * 1
    assert comm.tournament_x == Nt * 2 * v * (v + 1) * Py * Pz
    # pivot bcast: [v, v] + [v] psum over Py, groups Px*Pz
    assert comm.pivot_bcast_y == Nt * 2 * (v * v + v) * (Py - 1) * Px * Pz
    # pivot-row gather: [v, Nl] psum over Px*Pz, groups Py
    assert comm.row_gather_xz == Nt * 2 * v * Nl * (Px * Pz - 1) * Py
    # per-layer panel slice: [Ml, l] psum over Py, groups Px*Pz
    assert comm.panel_slice_y == Nt * 2 * Ml * l * (Py - 1) * Px * Pz


def test_panel_slice_volume_halves_when_pz_doubles():
    # the 2.5D point: each z layer consumes only an l = v/Pz slice of the
    # panel, so PER-RANK panel-broadcast traffic halves when Pz doubles at
    # fixed (Px, Py) (reference: nlayr slicing + Iscatterv,
    # lu_params.hpp:73, conflux_opt.hpp:1424-1434)
    n, v = 64, 8
    c1 = _run(n, v, Px=2, Pz=1)
    c2 = _run(n, v, Px=2, Pz=2)
    P1, P2 = 2 * 2 * 1, 2 * 2 * 2
    r1 = c1.panel_slice_y / P1
    r2 = c2.panel_slice_y / P2
    assert r2 == pytest.approx(r1 / 2)


def test_per_rank_total_decreases_with_p_strong_scaling():
    # strong scaling: per-rank communication volume shrinks as the grid
    # grows at fixed N (the N^2/sqrt(P) law, within constants)
    n, v = 256, 16
    small = _run(n, v, Px=2, Pz=1, Py=2)
    large = _run(n, v, Px=4, Pz=1, Py=4)
    assert large.per_rank(16) < small.per_rank(4)


def test_total_is_sum_of_fields():
    comm = CommVolume(psum_z=1, tournament_x=2, pivot_bcast_y=3,
                      row_gather_xz=4, panel_slice_y=5)
    assert comm.total() == 15
    assert comm.per_rank(3) == 5
