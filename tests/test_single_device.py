"""Single-device blocked LU / Cholesky parity + residual gates.

Gate 1 of the build plan (SURVEY.md §7): parity with scipy/LAPACK at the
residual the reference's ScaLAPACK harness enforces
(examples/conflux_miniapp.cpp:480-499)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg as sla

from conflux_tpu.cholesky import cholesky, cholesky_residual
from conflux_tpu.lu import lu, lu_factor, lu_residual
from conflux_tpu.ops.tri import (
    inv_lower,
    inv_unit_lower,
    inv_upper,
    potrf_tile,
    trsm_left_lower_unit,
    trsm_right_lower_t,
    trsm_right_upper,
)


@pytest.mark.parametrize("n,v", [(32, 8), (96, 32), (256, 64), (257, 64)])
def test_lu_residual(rng, n, v):
    if n % v:
        pytest.skip("non-multiple sizes handled at the API layer (pdgetrf)")
    A = rng.standard_normal((n, n)).astype(np.float32)
    F, perm = lu_factor(jnp.asarray(A), v=v)
    res = float(lu_residual(A, F, perm))
    assert res < 1e-6, res
    # perm is a permutation
    assert len(np.unique(np.asarray(perm))) == n


def test_lu_matches_scipy_pivots(rng):
    # single panel (n == v): recursive LU == straight partial pivoting,
    # so pivot choice must match scipy's getrf exactly
    n = 48
    A = rng.standard_normal((n, n)).astype(np.float32)
    L, U, perm = lu(jnp.asarray(A), v=n)
    p, l, u = sla.lu(A.astype(np.float64))
    perm_scipy = np.argmax(p, axis=0)  # PA = p.T @ A rows
    np.testing.assert_array_equal(np.asarray(perm), perm_scipy)
    np.testing.assert_allclose(np.asarray(L), l, atol=1e-4)


@pytest.mark.parametrize("n,v", [(64, 16), (192, 64)])
def test_cholesky_residual(rng, n, v):
    B = rng.standard_normal((n, n))
    A = (B @ B.T + n * np.eye(n)).astype(np.float32)
    L = cholesky(jnp.asarray(A), v=v)
    res = float(cholesky_residual(A, L))
    assert res < 1e-6, res
    Ls = sla.cholesky(A.astype(np.float64), lower=True)
    np.testing.assert_allclose(np.asarray(L), Ls, rtol=1e-3, atol=1e-3)


def test_potrf_tile_matches_lapack(rng):
    n = 32
    B = rng.standard_normal((n, n))
    A = (B @ B.T + n * np.eye(n)).astype(np.float32)
    L = potrf_tile(jnp.asarray(A))
    Ls = sla.cholesky(A.astype(np.float64), lower=True)
    np.testing.assert_allclose(np.asarray(L), Ls, rtol=1e-3, atol=1e-3)


def test_triangular_inverses(rng):
    # random triangles are exponentially ill-conditioned; scale off-diagonals
    n = 80
    L = 0.1 * np.tril(rng.standard_normal((n, n)), -1).astype(np.float32) + 3 * np.eye(
        n, dtype=np.float32
    )
    np.testing.assert_allclose(
        np.asarray(inv_lower(jnp.asarray(L))) @ L, np.eye(n), atol=1e-3
    )
    Lu = np.tril(L, -1) + np.eye(n, dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(inv_unit_lower(jnp.asarray(Lu))) @ Lu, np.eye(n), atol=1e-3
    )
    U = L.T.copy()
    np.testing.assert_allclose(
        U @ np.asarray(inv_upper(jnp.asarray(U))), np.eye(n), atol=1e-3
    )


@pytest.mark.parametrize("method", ["solve", "invert"])
def test_trsm_variants(rng, method):
    n, k = 48, 64
    L = 0.1 * np.tril(rng.standard_normal((n, n)), -1).astype(np.float32) + 3 * np.eye(
        n, dtype=np.float32
    )
    Lu = np.tril(L, -1) + np.eye(n, dtype=np.float32)
    U = L.T.copy()
    B = rng.standard_normal((n, k)).astype(np.float32)
    X = np.asarray(trsm_left_lower_unit(jnp.asarray(Lu), jnp.asarray(B), method=method))
    np.testing.assert_allclose(Lu @ X, B, atol=1e-3)
    C = rng.standard_normal((k, n)).astype(np.float32)
    X = np.asarray(trsm_right_upper(jnp.asarray(C), jnp.asarray(U), method=method))
    np.testing.assert_allclose(X @ U, C, atol=1e-3)
    X = np.asarray(trsm_right_lower_t(jnp.asarray(C), jnp.asarray(L), method=method))
    np.testing.assert_allclose(X @ L.T, C, atol=1e-3)


def test_lu_odd_tile_width(rng):
    # v smaller than the selection block width and not a power of two
    n, v = 48, 12
    A = rng.standard_normal((n, n)).astype(np.float32)
    F, perm = lu_factor(jnp.asarray(A), v=v)
    from conflux_tpu.validation import lu_residual_dense

    assert lu_residual_dense(A, np.asarray(F), np.asarray(perm)) < 1e-6


def test_lu_schemes_agree_pivot_for_pivot(rng):
    # the band-emitting flat scheme and the recursive scheme implement the
    # same partial pivoting: identical permutations, near-identical factors
    import jax.numpy as jnp

    from conflux_tpu.lu.single import lu_factor

    for m, n in ((128, 128), (160, 96)):
        A = rng.standard_normal((m, n)).astype(np.float32)
        Ff, pf = lu_factor(jnp.asarray(A), v=32, scheme="flat")
        Fr, pr = lu_factor(jnp.asarray(A), v=32, scheme="recursive")
        np.testing.assert_array_equal(np.asarray(pf), np.asarray(pr))
        np.testing.assert_allclose(np.asarray(Ff), np.asarray(Fr),
                                   rtol=1e-4, atol=1e-4)


def test_cholesky_schemes_agree(rng):
    import jax.numpy as jnp

    from conflux_tpu.cholesky.single import cholesky

    n = 160
    B = rng.standard_normal((n, n))
    A = (B @ B.T + n * np.eye(n)).astype(np.float32)
    Lf = cholesky(jnp.asarray(A), v=32, scheme="flat")
    Lr = cholesky(jnp.asarray(A), v=32, scheme="recursive")
    np.testing.assert_allclose(np.asarray(Lf), np.asarray(Lr),
                               rtol=1e-4, atol=1e-4)


def test_lu_flat_partition_cadences_agree(rng):
    # the partition-cadence knob (`part`) is pure data movement: every
    # cadence must produce the identical factor and permutation (the default
    # never partitions mid-run, so this exercises the band/partition branch)
    import jax
    import jax.numpy as jnp

    from conflux_tpu.lu.single import _getrf_flat

    for m, n in ((160, 160), (200, 120)):
        A = rng.standard_normal((m, n)).astype(np.float32)
        F0, p0 = jax.jit(lambda a: _getrf_flat(a, 32, "highest", 1_000_000))(
            jnp.asarray(A))
        for part in (1, 2, 4):
            Fp, pp = jax.jit(
                lambda a, part=part: _getrf_flat(a, 32, "highest", part)
            )(jnp.asarray(A))
            np.testing.assert_array_equal(np.asarray(pp), np.asarray(p0))
            np.testing.assert_allclose(np.asarray(Fp), np.asarray(F0),
                                       rtol=1e-5, atol=1e-5)


def test_lu_bf16_storage(rng):
    # bf16 STORAGE mode: buffer/factor/trailing updates in bfloat16 (f32
    # panels + MXU accumulation). The raw residual plateaus near the
    # 8-bit-mantissa floor (~N * 2e-5 on this random family — documented as
    # NOT meeting the reference's 1e-6 N-normalized gate); the permutation
    # must still be exact and the factor finite.
    import jax.numpy as jnp

    from conflux_tpu.lu.single import lu_factor

    n, v = 512, 64
    A = (5.0 + rng.random((n, n))).astype(np.float32)
    F, perm = lu_factor(jnp.asarray(A, jnp.bfloat16), v=v)
    assert F.dtype == jnp.bfloat16
    pv = np.asarray(perm)
    assert sorted(pv.tolist()) == list(range(n))
    Fh = np.asarray(F.astype(jnp.float32))
    L = np.tril(Fh, -1) + np.eye(n, dtype=np.float32)
    U = np.triu(Fh)
    r = np.linalg.norm(A[pv] - L @ U) / np.linalg.norm(A)
    assert np.isfinite(r) and r < 0.05
