"""Native C++ host runtime tests (mirrors the reference's only unit suite:
tests/unit/test_utils.cpp exercises permute_rows / inverse_permute_rows)."""

import numpy as np
import pytest

from conflux_tpu import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def test_fill_random_matches_contract(lib_ok):
    A = native.fill_random(64, 32, seed=7)
    assert A.shape == (64, 32) and A.dtype == np.float32
    assert (A >= 5).all() and (A < 6).all()
    # deterministic
    np.testing.assert_array_equal(A, native.fill_random(64, 32, seed=7))
    assert not np.array_equal(A, native.fill_random(64, 32, seed=8))


def test_permute_rows_roundtrip(lib_ok, rng):
    A = rng.standard_normal((40, 12)).astype(np.float32)
    perm = rng.permutation(40)
    P = native.permute_rows(A, perm)
    np.testing.assert_array_equal(P, A[perm])
    back = native.permute_rows(P, perm, inverse=True)
    np.testing.assert_array_equal(back, A)


def test_cyclic_permute_matches_numpy(lib_ok, rng):
    A = rng.standard_normal((32, 48)).astype(np.float32)
    got = native.cyclic_permute(A, v=4, Px=2, Py=3)
    mtl, ntl = 32 // 8, 48 // 12
    want = (
        A.reshape(mtl, 2, 4, ntl, 3, 4).transpose(1, 0, 2, 4, 3, 5).reshape(32, 48)
    )
    np.testing.assert_array_equal(got, want)


def test_native_profiler(lib_ok):
    prof = native.NativeProfiler()
    prof.clear()
    prof.enter("outer")
    prof.enter("inner")
    prof.leave()
    prof.leave()
    rep = prof.report()
    assert "/outer" in rep and "/outer/inner" in rep
    prof.clear()


def test_numpy_fallbacks(monkeypatch, rng):
    monkeypatch.setattr(native, "_load", lambda: None)
    A = native.fill_random(8, 8, seed=1)
    assert (A >= 5).all()
    B = rng.standard_normal((8, 4)).astype(np.float32)
    perm = rng.permutation(8)
    np.testing.assert_array_equal(native.permute_rows(B, perm), B[perm])


def test_mcopy(lib_ok, rng):
    A = rng.standard_normal((20, 16)).astype(np.float32)
    got = native.mcopy(A, rows=5, cols=6, row0=3, col0=4)
    np.testing.assert_array_equal(got, A[3:8, 4:10])


def test_fill_random_adjacent_seeds_independent(lib_ok):
    A7 = native.fill_random(16, 8, seed=7)
    A8 = native.fill_random(16, 8, seed=8)
    # adjacent seeds must not share shifted row streams
    assert not np.array_equal(A7[1:], A8[:-1])


def test_fill_random_narrow_dtype_safe():
    A = native.fill_random(32, 32, seed=3, dtype=np.float16)
    assert A.dtype == np.float16 and (np.asarray(A, np.float32) >= 5).all()


def test_cyclic_permute_rejects_nondivisible(lib_ok, rng):
    A = rng.standard_normal((12, 12)).astype(np.float32)
    with pytest.raises(ValueError):
        native.cyclic_permute(A, v=4, Px=2, Py=3)
