"""Complex (c64) path gates — the reference instantiates its BLAS shim and
layout for std::complex (src/conflux/lu/blas.cpp:15-122,
layout.cpp:138-192); here the c64 capability is the real-GEMM-decomposed
compute shim (ops/cplx.py) plus the crout-structured complex LU
(lu/csingle.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conflux_tpu.lu.csingle import clu_factor, clu_residual
from conflux_tpu.ops.cplx import (
    cabs1,
    cpanel_factor,
    cschur_dot,
    ctrsm_left_lower_unit,
    ctrsm_right_upper,
)


def _crand(rng, *shape):
    return (rng.standard_normal(shape)
            + 1j * rng.standard_normal(shape)).astype(np.complex64)


@pytest.mark.parametrize("method", ["4m", "3m"])
def test_cschur_dot_matches_numpy(rng, method):
    A = _crand(rng, 48, 32)
    B = _crand(rng, 32, 40)
    got = np.asarray(cschur_dot(jnp.asarray(A), jnp.asarray(B), method))
    want = A.astype(np.complex128) @ B.astype(np.complex128)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_cabs1_is_lapack_convention():
    z = jnp.asarray([3 - 4j, -1 + 2j, 0j], jnp.complex64)
    np.testing.assert_allclose(np.asarray(cabs1(z)), [7.0, 3.0, 0.0])


def test_cpanel_factor_merged_rows(rng):
    # panel[piv] == unit_lower(lu) @ triu(lu) and multipliers reproduce the
    # eliminated rows
    m, w = 24, 8
    P = _crand(rng, m, w)
    piv, ok, M = cpanel_factor(jnp.asarray(P), jnp.ones(m, bool), w)
    piv, M = np.asarray(piv), np.asarray(M)
    assert np.asarray(ok).all()
    assert len(np.unique(piv)) == w
    lu = M[piv]
    L = np.tril(lu, -1) + np.eye(w)
    U = np.triu(lu)
    np.testing.assert_allclose(P[piv], L @ U, atol=1e-4)


def test_cpanel_pivot_scoring_cabs1(rng):
    # the first pivot must be the cabs1-max row of column 0 — NOT the
    # |z|-max row (plant a row whose |z| wins but whose |re|+|im| loses)
    P = np.zeros((4, 2), np.complex64)
    P[0, 0] = 3.9 + 0j        # cabs1 = 3.9, |z| = 3.9
    P[1, 0] = 2.0 + 2.0j      # cabs1 = 4.0, |z| = 2.83  <- cgetrf pick
    P[2, 0] = 1.0 + 0j
    P[:, 1] = 1.0
    piv, _, _ = cpanel_factor(jnp.asarray(P), jnp.ones(4, bool), 2)
    assert int(piv[0]) == 1


def test_ctrsm_left_lower_unit(rng):
    # multiplier-scale triangle (|entries| ~ 0.3): a RANDOM O(1) unit
    # triangle has a c^n-growing inverse (Viswanath/Trefethen; tri.py
    # stability note) and no solver can bound its f32 residual at n=96
    n, c = 96, 40  # > one _SUB block
    L = np.tril(0.3 * _crand(rng, n, n), -1) + np.eye(n)
    B = _crand(rng, n, c)
    X = np.asarray(ctrsm_left_lower_unit(jnp.asarray(L.astype(np.complex64)),
                                         jnp.asarray(B)))
    np.testing.assert_allclose(L @ X, B, atol=5e-3)


def test_ctrsm_right_upper(rng):
    n, r = 64, 24
    U = np.triu(_crand(rng, n, n)) + 3 * np.eye(n)
    B = _crand(rng, r, n)
    X = np.asarray(ctrsm_right_upper(jnp.asarray(B),
                                     jnp.asarray(U.astype(np.complex64))))
    np.testing.assert_allclose(X @ U, B, atol=5e-3)


@pytest.mark.parametrize("m,n,v,method", [
    (64, 64, 8, "4m"),
    (64, 64, 8, "3m"),
    (96, 64, 16, "4m"),   # tall trapezoid
    (128, 128, 32, "4m"),
])
def test_clu_factor_residual(rng, m, n, v, method):
    A = _crand(rng, m, n)
    F, perm = clu_factor(jnp.asarray(A), v=v, method=method)
    perm = np.asarray(perm)
    assert len(np.unique(perm)) == m
    res = clu_residual(A, F, perm)
    assert res < 1e-6, (method, res)


def test_clu_matches_scipy_magnitude(rng):
    # same growth class as scipy's partial-pivoted LU: the max |entry| of U
    # stays within a small factor (both are partial pivoting; pivots may
    # differ only on the |z|-vs-cabs1 scoring convention)
    import scipy.linalg as sla

    A = _crand(rng, 64, 64)
    F, perm = clu_factor(jnp.asarray(A), v=8)
    U = np.triu(np.asarray(F))
    _, _, U_s = sla.lu(A)
    assert np.abs(U).max() < 10 * np.abs(U_s).max()


def test_clu_rejects_real_input(rng):
    from conflux_tpu.errors import ConfluxError

    with pytest.raises(ConfluxError):
        clu_factor(jnp.zeros((8, 8), jnp.float32), v=4)


def test_clu_zero_pivot_finite():
    # structurally singular input degrades to junk-but-finite factors
    A = jnp.zeros((16, 16), jnp.complex64)
    F, perm = clu_factor(A, v=4)
    assert np.isfinite(np.asarray(F)).all()


# ---------------------------------------------------------------------------
# Distributed complex LU (lu/cp25d.py)
# ---------------------------------------------------------------------------

def _cdist_residual(A, desc, F, perm):
    from conflux_tpu.layout import pad_like, undistribute

    Fh = np.asarray(undistribute(F, desc))
    Ap = np.asarray(pad_like(A, desc))
    mg, ng = Ap.shape
    L = np.tril(Fh[:, :ng], -1) + np.eye(mg, ng, dtype=np.complex64)
    U = np.triu(Fh[:ng])
    return np.linalg.norm(Ap[np.asarray(perm)] - L @ U) / (
        ng * np.linalg.norm(Ap))


@pytest.mark.parametrize("shape,m,n,v", [
    ((2, 2, 2), 64, 64, 8),    # full 2.5D
    ((3, 2, 1), 96, 96, 8),    # non-pow2 Px (multicast butterfly rounds)
    ((2, 2, 1), 96, 64, 8),    # tall trapezoid (reused _tall_tail epilogue)
    ((1, 2, 4), 64, 64, 8),    # z-heavy replication
])
def test_clu_25d_residual(rng, shape, m, n, v):
    # the c64 rank program: cabs1 tournament, complex TRSMs, split-K
    # cschur_dot trailing updates over the same 2.5D collective schedule
    from conflux_tpu.grid import make_grid
    from conflux_tpu.layout import BlockCyclic, distribute
    from conflux_tpu.lu.cp25d import clu_25d

    A = _crand(rng, m, n)
    desc = BlockCyclic.create(m, n, v, make_grid(shape))
    F, perm = clu_25d(distribute(A, desc), desc)
    assert len(np.unique(np.asarray(perm))) == desc.M
    res = _cdist_residual(A, desc, F, perm)
    assert res < 1e-6, (shape, res)


def test_clu_25d_3m_method(rng):
    from conflux_tpu.grid import make_grid
    from conflux_tpu.layout import BlockCyclic, distribute
    from conflux_tpu.lu.cp25d import clu_25d

    A = _crand(rng, 64, 64)
    desc = BlockCyclic.create(64, 64, 8, make_grid((2, 2, 2)))
    F, perm = clu_25d(distribute(A, desc), desc, method="3m")
    res = _cdist_residual(A, desc, F, perm)
    assert res < 1e-6, res


def test_clu_25d_single_device_matches_clu_factor(rng):
    # on a 1x1x1 grid the rank program IS exact partial pivoting with
    # cabs1 scoring — pivot-for-pivot identical to the single-chip kernel
    from conflux_tpu.grid import make_grid
    from conflux_tpu.layout import BlockCyclic, distribute, undistribute
    from conflux_tpu.lu.cp25d import clu_25d

    A = _crand(rng, 64, 64)
    desc = BlockCyclic.create(64, 64, 8, make_grid((1, 1, 1)))
    F, perm = clu_25d(distribute(A, desc), desc)
    F1, perm1 = clu_factor(jnp.asarray(A), v=8)
    np.testing.assert_array_equal(np.asarray(perm), np.asarray(perm1))
    # values agree to fp-reassociation level only: the rank program is
    # right-looking (per-step split-K updates), clu_factor is crout (one
    # big-K GEMM per panel) — different summation orders (CLAUDE.md:
    # cross-scheme tests gate residuals, not bit equality)
    np.testing.assert_allclose(np.asarray(undistribute(F, desc)),
                               np.asarray(F1)[np.argsort(np.asarray(perm1))]
                               [np.asarray(perm)], atol=1e-3)
