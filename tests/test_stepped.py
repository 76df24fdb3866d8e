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
    # same panel math on the same values: pivots identical, factors equal
    # to roundoff of the two U12 routes (flat splices the exact TRSM
    # result; stepped recovers it through the raw - strict(L11)@U12
    # cancellation — measured max gap 1.4e-5 on O(5) entries here)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_allclose(np.asarray(F0), np.asarray(F1),
                               atol=5e-5, rtol=0)


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
