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


def _expected_band_count(m, n, v, partition):
    """Mirror of _getrf_flat's static band-emission schedule, driven by the
    SAME predicate the kernel uses (_partition_now)."""
    from conflux_tpu.lu.single import _partition_now

    bands = dead = 0
    for k in range(0, n, v):
        w = min(v, n - k)
        dead += w
        if _partition_now(dead, v, k, w, n, partition):
            bands += 1
            dead = 0
    if m > n:
        bands += 1  # never-pivoted tail rows
    return bands


def _traced_band_count(m, n, v, partition):
    """Count the operands of the concatenate that produces the factor — the
    number of bands the COMPILED program actually emits (guards the cadence
    semantics: round 2 shipped a predicate whose default did the opposite of
    its docstring and no test noticed)."""
    import jax
    import jax.numpy as jnp

    from conflux_tpu.lu.single import _getrf_flat

    jaxpr = jax.make_jaxpr(
        lambda a: _getrf_flat(a, v, "highest", partition)
    )(jnp.zeros((m, n), jnp.float32))
    out = jaxpr.jaxpr.outvars[0]
    for eqn in jaxpr.jaxpr.eqns:
        if eqn.outvars and eqn.outvars[0] is out:
            return len(eqn.invars) if eqn.primitive.name == "concatenate" else 1
    return 1  # output is an input or a single unwrapped band


def test_lu_flat_partition_schedule():
    # partition=e emits a band every e steps; 0 = only at the end. Assert
    # the schedule on the traced program, not just the helper.
    for m, n, v, partition, want in (
        (160, 160, 32, 1, 5),   # default: one band per step
        (160, 160, 32, 0, 1),   # never mid-run: single band
        (160, 160, 32, 2, 3),   # every 2 steps (+ final odd step)
        (200, 120, 32, 1, 5),   # tall: 4 step bands (w=24 last) + tail band
        (200, 120, 32, 0, 2),   # tall never: end band + tail band
    ):
        assert _expected_band_count(m, n, v, partition) == want
        assert _traced_band_count(m, n, v, partition) == want


def test_lu_flat_partition_cadences_agree(rng):
    # the partition-cadence knob is pure data movement: every cadence must
    # produce the identical permutation and the same factor up to roundoff
    # (cadence 1 stores U12 exactly; other cadences recover it through the
    # raw - strict(L11)@U12 cancellation)
    import jax
    import jax.numpy as jnp

    from conflux_tpu.lu.single import _getrf_flat

    for m, n in ((160, 160), (200, 120)):
        A = rng.standard_normal((m, n)).astype(np.float32)
        F0, p0 = jax.jit(lambda a: _getrf_flat(a, 32, "highest", 0))(
            jnp.asarray(A))
        for partition in (1, 2, 4):
            Fp, pp = jax.jit(
                lambda a, e=partition: _getrf_flat(a, 32, "highest", e)
            )(jnp.asarray(A))
            np.testing.assert_array_equal(np.asarray(pp), np.asarray(p0))
            # 1e-3/1e-4: the two U12 routes legitimately differ by f32
            # roundoff through a cancellation (observed max 2.4e-4 relative
            # on one element in 24000 on this random-normal family)
            np.testing.assert_allclose(np.asarray(Fp), np.asarray(F0),
                                       rtol=1e-3, atol=1e-4)


def test_lu_flat_pallas_trailing_paths(rng, monkeypatch):
    # Execute the fused-Mosaic trailing branches of _getrf_flat on CPU
    # (interpret mode, backend gate bypassed): whole-R, sliced-R (forced
    # by shrinking the operand ceiling), and the dot_general fallback must
    # agree. Without this, those branches only ever run on real hardware.
    import functools

    import jax
    import jax.numpy as jnp

    import conflux_tpu.lu.single as single
    import conflux_tpu.ops.pallas_gemm as pg

    n, v = 1024, 512
    A = (5.0 + rng.random((n, n))).astype(np.float32)

    F0, p0 = jax.jit(
        lambda a: single._getrf_flat(a, v, "high")
    )(jnp.asarray(A))  # gate off on CPU -> fallback

    real_ok = single._pallas_mode_ok

    def mode_ok(R, mode, c0, nn):  # shape checks only, no backend check
        return (mode in ("high", "bf16", "bf16out") and R.shape[0] % 512 == 0
                and c0 % 512 == 0 and (nn - c0) % 512 == 0)

    monkeypatch.setattr(single, "_pallas_mode_ok", mode_ok)
    monkeypatch.setattr(
        pg.pl, "pallas_call",
        functools.partial(pg.pl.pallas_call, interpret=True))
    # pivot choices legitimately diverge between the two 'high'
    # implementations (the hi/lo-split rounding differs from XLA's HIGH in
    # the last bits; one argmax near-tie flip permutes everything after),
    # so the assertion is each path's own residual gate, not equality.
    r0 = float(single.lu_residual(A, F0, p0))
    assert r0 < 1e-8, r0
    for limit, label in ((1 << 40, "whole-R"), (1, "sliced-R")):
        monkeypatch.setattr(single, "_PALLAS_R_LIMIT", limit)
        jax.clear_caches()
        Fp, pp = jax.jit(
            lambda a: single._getrf_flat(a, v, "high")
        )(jnp.asarray(A))
        rp = float(single.lu_residual(A, Fp, pp))
        assert rp < 1e-8, (label, rp)
    monkeypatch.setattr(single, "_pallas_mode_ok", real_ok)
    jax.clear_caches()


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


def test_lu_crout_scheme(rng):
    # Crout (left-looking) scheme: same contract as flat — residual gate,
    # valid perm, tall trapezoid, every cadence; factors agree with the
    # flat scheme to fp (pivots may flip on fp ties — the panel values are
    # summed in a different order — so assert the residual, not the perm)
    import jax.numpy as jnp

    from conflux_tpu.lu.single import lu_factor, lu_residual

    for m, n, v in ((128, 128, 32), (160, 96, 32), (140, 140, 32)):
        A = rng.standard_normal((m, n)).astype(np.float32)
        for part in (1, 2, 0):
            F, p = lu_factor(jnp.asarray(A), v=v, scheme="crout",
                             partition=part)
            p = np.asarray(p)
            assert len(np.unique(p)) == m
            L = np.tril(np.asarray(F, np.float64), -1) + np.eye(m, n)
            U = np.triu(np.asarray(F, np.float64)[:n])
            res = np.linalg.norm(A[p] - L @ U) / (n * np.linalg.norm(A))
            assert res < 1e-6, (m, n, part, res)


def test_lu_crout_swap_compaction(rng):
    # 'swap' (push-up) compaction: same contract as 'gather' on square,
    # tall, ragged-tile and full-width-panel shapes. Pivots may legally
    # differ from 'gather' on fp ties (different row order inside the live
    # prefix), so the gate is the residual + perm validity, plus exact
    # factor agreement when v == n (single panel: no compaction happens).
    import jax.numpy as jnp

    from conflux_tpu.lu.single import lu_factor, lu_residual

    for m, n, v in ((128, 128, 32), (160, 96, 32), (150, 130, 32),
                    (128, 128, 128)):
        A = rng.standard_normal((m, n)).astype(np.float32)
        F, p = lu_factor(jnp.asarray(A), v=v, scheme="crout",
                         compaction="swap")
        p = np.asarray(p)
        assert len(np.unique(p)) == m
        L = np.tril(np.asarray(F, np.float64), -1) + np.eye(m, n)
        U = np.triu(np.asarray(F, np.float64)[:n])
        res = np.linalg.norm(A[p] - L @ U) / (n * np.linalg.norm(A))
        assert res < 1e-6, (m, n, v, res)
        if v == n:  # single panel: compaction never fires -> exact match
            Fg, pg = lu_factor(jnp.asarray(A), v=v, scheme="crout")
            np.testing.assert_array_equal(p, np.asarray(pg))
            np.testing.assert_array_equal(np.asarray(F), np.asarray(Fg))
    # bf16 STORAGE rides the same swap path
    A = rng.standard_normal((128, 128)).astype(np.float32)
    F, p = lu_factor(jnp.asarray(A, jnp.bfloat16), v=32, scheme="crout",
                     compaction="swap")
    assert F.dtype == jnp.bfloat16
    r = float(lu_residual(np.asarray(jnp.asarray(A, jnp.bfloat16)
                                     .astype(jnp.float32)),
                          F.astype(jnp.float32), p))
    assert r < 5e-4, r


def test_lu_crout_split_compaction(rng):
    # 'split' compaction (never-moved raw T + compacted Lbuf) is
    # pivot-for-pivot AND bit-for-bit identical to 'gather' at
    # partition=1: every GEMM/panel operand holds the same values in the
    # same row order (see _getrf_crout_split). Square, tall, ragged-tile,
    # full-width-panel, and bf16-STORAGE shapes.
    import jax.numpy as jnp

    from conflux_tpu.lu.single import lu_factor

    for m, n, v in ((128, 128, 32), (160, 96, 32), (150, 130, 32),
                    (128, 128, 128)):
        A = rng.standard_normal((m, n)).astype(np.float32)
        Fs, ps = lu_factor(jnp.asarray(A), v=v, scheme="crout",
                           compaction="split")
        Fg, pg = lu_factor(jnp.asarray(A), v=v, scheme="crout",
                           compaction="gather")
        np.testing.assert_array_equal(np.asarray(ps), np.asarray(pg))
        np.testing.assert_array_equal(np.asarray(Fs), np.asarray(Fg))
    A = rng.standard_normal((128, 128)).astype(np.float32)
    Fs, ps = lu_factor(jnp.asarray(A, jnp.bfloat16), v=32, scheme="crout",
                       compaction="split")
    Fg, pg = lu_factor(jnp.asarray(A, jnp.bfloat16), v=32, scheme="crout",
                       compaction="gather")
    assert Fs.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(ps), np.asarray(pg))
    np.testing.assert_array_equal(np.asarray(Fs.astype(jnp.float32)),
                                  np.asarray(Fg.astype(jnp.float32)))


def test_lu_crout_bf16_storage(rng):
    import jax.numpy as jnp

    from conflux_tpu.lu.single import lu_factor

    n = 256
    A = rng.standard_normal((n, n)).astype(np.float32)
    F, p = lu_factor(jnp.asarray(A, jnp.bfloat16), v=64, scheme="crout")
    assert F.dtype == jnp.bfloat16
    p = np.asarray(p)
    assert len(np.unique(p)) == n
    Fh = np.asarray(F.astype(jnp.float32), np.float64)
    L = np.tril(Fh, -1) + np.eye(n)
    U = np.triu(Fh)
    Ah = np.asarray(jnp.asarray(A, jnp.bfloat16).astype(jnp.float32))
    res = np.linalg.norm(Ah[p] - L @ U) / (n * np.linalg.norm(Ah))
    assert res < 6e-4, res


def test_bigk_kernel_interpret_matches_dot(rng, monkeypatch):
    # The K-gridded big-K Mosaic kernel is DECIDED out of the crout
    # routing (it lost the e2e A/B by 14%, results/r4_experiments.md)
    # but stays as a benchmarked reference kernel — this pins its
    # correctness at the shapes the A/B ran (interpret mode on CPU).
    import functools

    import jax
    import jax.numpy as jnp

    import conflux_tpu.ops.pallas_gemm as pg
    from conflux_tpu.ops.tri import schur_dot

    m, k, w = 1024, 512, 512
    R = jnp.asarray(rng.standard_normal((m, w)).astype(np.float32))
    A = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    B = jnp.asarray(rng.standard_normal((k, w)).astype(np.float32))
    monkeypatch.setattr(
        pg.pl, "pallas_call",
        functools.partial(pg.pl.pallas_call, interpret=True))
    jax.clear_caches()
    for mode, tol in (("high", 2e-4), ("bf16", 1e-6)):
        got = pg.sub_matmul_pallas_bigk(R, A, B, mode)
        ref = R - schur_dot(A, B, mode)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=tol, atol=tol * 30)
    jax.clear_caches()
