"""Stepped (per-panel dispatch) LU driver: contract parity with lu_factor
and the blocked full-residual gate (lu/stepped.py, validation.py).

The stepped driver is the package path to N=65536 single-chip
factorizations (VERDICT round 2, missing #1); these tests pin its
semantics at CPU-friendly sizes: same (F, perm) contract, pivot-for-pivot
equality with lu_factor, host/device output parity, bf16 storage mode,
and lu_residual_blocked agreeing with the dense residual."""

import numpy as np
import pytest

import jax.numpy as jnp

from conflux_tpu.lu import lu_factor, lu_factor_stepped
from conflux_tpu.validation import lu_residual_blocked, lu_residual_dense


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def test_stepped_matches_lu_factor(rng):
    n, v = 192, 32
    A = (5.0 + rng.random((n, n))).astype(np.float32)
    F0, p0 = lu_factor(jnp.asarray(A), v=v, scheme="flat")
    F1, p1 = lu_factor_stepped(A, v=v, out="device")
    # same panel math on the same values: pivots identical. The factors
    # agree only to the roundoff of the two U12 routes (flat splices the
    # exact TRSM result; stepped recovers it through the
    # raw - strict(L11)@U12 cancellation, whose ulp-level per-step GEMM
    # divergence compounds through later panels — measured 1.7e-4 max
    # here), so the factor check is loose and the BINDING gate is the
    # residual (the same bar lu_factor itself is held to).
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_allclose(np.asarray(F0), np.asarray(F1),
                               atol=1e-3, rtol=0)
    r = lu_residual_dense(A, np.asarray(F1), np.asarray(p1))
    assert r < 1e-6, r


def test_stepped_host_out_matches_device(rng):
    n, v = 160, 32
    A = (5.0 + rng.random((n, n))).astype(np.float32)
    Fd, pd = lu_factor_stepped(A, v=v, out="device", chunk=64)
    Fh, ph = lu_factor_stepped(A, v=v, out="host", chunk=64)
    assert isinstance(Fh, np.ndarray) and isinstance(ph, np.ndarray)
    np.testing.assert_array_equal(np.asarray(pd), ph)
    np.testing.assert_array_equal(np.asarray(Fd), Fh)


def test_stepped_tall_and_residual(rng):
    m, n, v = 256, 128, 32
    A = (5.0 + rng.random((m, n))).astype(np.float32)
    F, perm = lu_factor_stepped(A, v=v, out="host")
    assert sorted(perm.tolist()) == list(range(m))
    r = lu_residual_dense(A, F, perm)
    assert r < 1e-6, r
    # the blocked device-streaming residual must agree with the dense gate
    rb = lu_residual_blocked(A, F, perm, block=96)
    assert abs(rb - r) < 1e-8, (rb, r)


def test_stepped_bf16_storage(rng):
    n, v = 192, 32
    A = (5.0 + rng.random((n, n))).astype(np.float32)
    Ab = jnp.asarray(A, jnp.bfloat16)
    F, perm = lu_factor_stepped(Ab, v=v, out="device")
    assert F.dtype == jnp.bfloat16
    # gate vs the bf16 matrix that was actually factored (storage mode
    # plateaus at bf16 rounding, ~1e-3 relative at this size)
    Ah = np.asarray(jnp.asarray(A, jnp.bfloat16).astype(jnp.float32))
    r = lu_residual_blocked(Ah, F, perm, block=64)
    assert r < 1e-4, r


def test_stepped_rejects_bad_inputs(rng):
    from conflux_tpu.errors import ConfluxError

    with pytest.raises(ConfluxError):
        lu_factor_stepped(np.zeros((4, 8), np.float32))
    with pytest.raises(ConfluxError):
        lu_factor_stepped(np.zeros((8, 8), np.float64))


# ---------------------------------------------------------------------------
# Stepped + bf16-storage Cholesky (cholesky/stepped.py, cholesky/single.py)
# ---------------------------------------------------------------------------

def _spd(rng, n):
    B = rng.random((n, n)).astype(np.float32)
    return (B @ B.T / n + np.eye(n, dtype=np.float32)).astype(np.float32)


def test_cholesky_stepped_matches_flat(rng):
    from conflux_tpu.cholesky import cholesky, cholesky_stepped

    n, v = 192, 32
    S = _spd(rng, n)
    L0 = cholesky(jnp.asarray(S), v=v, scheme="flat")
    L1 = cholesky_stepped(S, v=v, out="device")
    # identical panel math on identical values: bitwise-equal factors
    np.testing.assert_array_equal(np.asarray(L0), np.asarray(L1))
    # chunk now also tiles the left-looking GEMM's K dimension (the
    # cond-skip operand grid), so a different chunk reorders the f32
    # accumulation: ulp-level gap, not bitwise equality
    Lh = cholesky_stepped(S, v=v, out="host", chunk=64)
    assert isinstance(Lh, np.ndarray)
    np.testing.assert_allclose(np.asarray(L1), Lh, atol=2e-6, rtol=0)
    from conflux_tpu.validation import cholesky_residual_dense

    assert cholesky_residual_dense(S, Lh) < 1e-6


def test_cholesky_bf16_storage(rng):
    from conflux_tpu.cholesky import cholesky, cholesky_stepped
    from conflux_tpu.validation import cholesky_residual_blocked

    n, v = 192, 32
    S = _spd(rng, n)
    Sb = jnp.asarray(S, jnp.bfloat16)
    L = cholesky(Sb, v=v)
    assert L.dtype == jnp.bfloat16
    # gate vs the bf16 matrix that was actually factored: no pivot
    # cancellation hazard, so the residual plateaus at bf16 rounding
    Sh = np.asarray(Sb.astype(jnp.float32))
    r = cholesky_residual_blocked(Sh, L, block=64)
    assert r < 1e-4, r
    # stepped agrees with the flat single-jit kernel in storage mode too
    Ls = cholesky_stepped(Sb, v=v, out="device")
    np.testing.assert_array_equal(np.asarray(L, np.float32),
                                  np.asarray(Ls, np.float32))


def test_cholesky_residual_blocked_matches_dense(rng):
    from conflux_tpu.cholesky import cholesky
    from conflux_tpu.validation import (cholesky_residual_blocked,
                                        cholesky_residual_dense)

    n = 160
    S = _spd(rng, n)
    L = cholesky(jnp.asarray(S), v=32)
    rd = cholesky_residual_dense(S, L)
    rb = cholesky_residual_blocked(S, L, block=48)
    assert abs(rd - rb) < 1e-8, (rd, rb)


def test_cholesky_stepped_rejects_bad_inputs():
    from conflux_tpu.cholesky import cholesky_stepped
    from conflux_tpu.errors import ConfluxError

    with pytest.raises(ConfluxError):
        cholesky_stepped(np.zeros((4, 8), np.float32))
    with pytest.raises(ConfluxError):
        cholesky_stepped(np.zeros((8, 8), np.float64))


def test_stepped_crout_matches_single_jit_crout(rng):
    # the crout stepped driver replays _getrf_crout's exact per-step math
    # (same GEMMs on the same values) -> bit-identical factors and pivots
    from conflux_tpu.lu.single import lu_factor
    from conflux_tpu.lu.stepped import lu_factor_stepped

    n = 256
    A = rng.standard_normal((n, n)).astype(np.float32)
    F1, p1 = lu_factor_stepped(A, v=64, precision="highest", scheme="crout")
    F2, p2 = lu_factor(jnp.asarray(A), v=64, precision="highest",
                       scheme="crout")
    np.testing.assert_array_equal(p1, np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(F1), np.asarray(F2))


def test_stepped_crout_tall_bf16s(rng):
    from conflux_tpu.lu.stepped import lu_factor_stepped

    m, n = 320, 256
    A = rng.standard_normal((m, n)).astype(np.float32)
    F, perm = lu_factor_stepped(jnp.asarray(A, jnp.bfloat16), v=64,
                                scheme="crout")
    assert len(np.unique(perm)) == m
    Fh = np.asarray(jnp.asarray(F).astype(jnp.float32), np.float64)
    Ah = np.asarray(jnp.asarray(A, jnp.bfloat16).astype(jnp.float32),
                    np.float64)
    L = np.tril(Fh[:, :n], -1) + np.eye(m, n)
    U = np.triu(Fh[:n])
    res = np.linalg.norm(Ah[perm] - L @ U) / (n * np.linalg.norm(Ah))
    assert res < 8e-4, res
