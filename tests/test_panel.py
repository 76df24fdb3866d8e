"""Unit tests for the masked pivot-selection kernel (ops/panel.py).

Mirrors the role of the reference's local-LU spec tests
(python/reference_lu.py LUP/LUPnoTile vs scipy)."""

import jax.numpy as jnp
import numpy as np
import scipy.linalg as sla

from conflux_tpu.ops.panel import select_pivots, lu_nopivot
from conflux_tpu.ops.tri import unit_lower, upper


def test_select_pivots_factors_selected_rows(rng):
    m, v = 24, 8
    A = rng.standard_normal((m, v)).astype(np.float32)
    piv, ok, lu = select_pivots(jnp.asarray(A), jnp.ones(m, bool), v)
    piv, lu = np.asarray(piv), np.asarray(lu)
    assert np.asarray(ok).all()
    assert len(np.unique(piv)) == v
    L, U = np.asarray(unit_lower(jnp.asarray(lu))), np.asarray(upper(jnp.asarray(lu)))
    np.testing.assert_allclose(A[piv], L @ U, rtol=0, atol=1e-4)


def test_select_pivots_matches_getrf_pivot_rows(rng):
    # with all rows valid, the selected pivot rows must match LAPACK's
    m, v = 16, 6
    A = rng.standard_normal((m, v))
    piv, ok, _ = select_pivots(jnp.asarray(A, jnp.float32), jnp.ones(m, bool), v)
    _, _, _ = sla.lu(A)
    # scipy's getrf ipiv: recompute sequential partial pivoting ourselves
    M = A.copy()
    expect = []
    selected = np.zeros(m, bool)
    for j in range(v):
        cand = np.where(selected, -np.inf, np.abs(M[:, j]))
        p = int(np.argmax(cand))
        expect.append(p)
        selected[p] = True
        rows = ~selected
        M[rows, j + 1 :] -= np.outer(M[rows, j] / M[p, j], M[p, j + 1 :])
    assert list(np.asarray(piv)) == expect


def test_select_pivots_respects_mask(rng):
    m, v = 12, 4
    A = rng.standard_normal((m, v)).astype(np.float32)
    A[3] = 100.0  # dominant but masked row must never win
    active = np.ones(m, bool)
    active[3] = False
    piv, ok, _ = select_pivots(jnp.asarray(A), jnp.asarray(active), v)
    assert 3 not in np.asarray(piv)
    assert np.asarray(ok).all()


def test_select_pivots_flags_insufficient_rows(rng):
    m, v = 6, 4
    A = rng.standard_normal((m, v)).astype(np.float32)
    active = np.zeros(m, bool)
    active[:2] = True
    _, ok, _ = select_pivots(jnp.asarray(A), jnp.asarray(active), v)
    ok = np.asarray(ok)
    assert ok[:2].all() and not ok[2:].any()


def test_lu_nopivot(rng):
    v = 8
    A = rng.standard_normal((v, v)).astype(np.float32) + 4 * np.eye(v, dtype=np.float32)
    lu = lu_nopivot(jnp.asarray(A))
    L, U = np.asarray(unit_lower(lu)), np.asarray(upper(lu))
    np.testing.assert_allclose(A, L @ U, rtol=0, atol=1e-4)
    # agreement with scipy's unpivoted lu
    P, Ls, Us = sla.lu(A.astype(np.float64))
    np.testing.assert_allclose(P, np.eye(v))  # diag-dominant: no pivoting
    np.testing.assert_allclose(L, Ls, atol=1e-4)


def test_pallas_rank1_matches_jnp_fallback(rng):
    # interpret-mode parity of the fused Mosaic kernel vs the pure-jnp
    # rank-1 elimination it replaces on TPU (ops/panel._rank1_block)
    import jax

    from conflux_tpu.ops.panel import _rank1_block
    from conflux_tpu.ops.pallas_panel import rank1_block_pallas

    m, w = 96, 16
    A = rng.standard_normal((m, w)).astype(np.float32)
    active = np.ones(m, bool)
    active[5] = False  # one masked row
    Mj = jnp.asarray(A)
    act = jnp.asarray(active)
    sel0 = jnp.zeros(m, bool)
    piv0 = jnp.zeros(w, jnp.int32)
    ok0 = jnp.zeros(w, bool)
    Mref, sel_ref, piv_ref, ok_ref = _rank1_block(
        Mj, act, sel0, piv0, ok0, 0, w, forced=False
    )
    out, availo, pivw, okw = rank1_block_pallas(
        Mj, act.astype(jnp.float32)[None, :], forced=False, j0=0,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(piv_ref), np.asarray(pivw))
    np.testing.assert_array_equal(np.asarray(ok_ref), np.asarray(okw) > 0)
    np.testing.assert_allclose(np.asarray(Mref), np.asarray(out),
                               rtol=1e-6, atol=1e-6)
    # avail' = active & ~selected
    np.testing.assert_array_equal(
        np.asarray(availo[0]) > 0, np.asarray(act & ~sel_ref)
    )


def test_pallas_rank1_forced_mode(rng):
    import jax

    from conflux_tpu.ops.panel import _rank1_block
    from conflux_tpu.ops.pallas_panel import rank1_block_pallas

    m, w = 32, 8
    A = rng.standard_normal((m, w)).astype(np.float32)
    Mj = jnp.asarray(A)
    act = jnp.ones(m, bool)
    Mref, _, piv_ref, ok_ref = _rank1_block(
        Mj, act, jnp.zeros(m, bool), jnp.zeros(w, jnp.int32),
        jnp.zeros(w, bool), 0, w, forced=True
    )
    out, _, pivw, okw = rank1_block_pallas(
        Mj, act.astype(jnp.float32)[None, :], forced=True, j0=0,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(piv_ref), np.asarray(pivw))
    np.testing.assert_allclose(np.asarray(Mref), np.asarray(out),
                               rtol=1e-6, atol=1e-6)
