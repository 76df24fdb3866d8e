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
