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
    # rank-1 elimination it replaces on TPU (ops/panel._rank1_block_t)
    from conflux_tpu.ops.panel import _rank1_block_t
    from conflux_tpu.ops.pallas_panel import rank1_block_pallas_t

    m, w = 96, 16
    A = rng.standard_normal((m, w)).astype(np.float32)
    active = np.ones(m, bool)
    active[5] = False  # one masked row
    Mt = jnp.asarray(A.T)
    availf = jnp.asarray(active.astype(np.float32))[None, :]
    Mref, avail_ref, piv_ref, ok_ref = _rank1_block_t(
        Mt, availf, 0, forced=False
    )
    out, availo, pivw, okw = rank1_block_pallas_t(
        Mt, availf, forced=False, j0=0, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(piv_ref), np.asarray(pivw))
    np.testing.assert_array_equal(np.asarray(ok_ref), np.asarray(okw) > 0)
    np.testing.assert_allclose(np.asarray(Mref), np.asarray(out),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(availo[0]) > 0, np.asarray(avail_ref[0]) > 0
    )


def test_pallas_rank1_forced_mode(rng):
    from conflux_tpu.ops.panel import _rank1_block_t
    from conflux_tpu.ops.pallas_panel import rank1_block_pallas_t

    m, w = 32, 8
    A = rng.standard_normal((m, w)).astype(np.float32)
    Mt = jnp.asarray(A.T)
    availf = jnp.ones((1, m), jnp.float32)
    Mref, _, piv_ref, ok_ref = _rank1_block_t(Mt, availf, 0, forced=True)
    out, _, pivw, okw = rank1_block_pallas_t(
        Mt, availf, forced=True, j0=0, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(piv_ref), np.asarray(pivw))
    np.testing.assert_allclose(np.asarray(Mref), np.asarray(out),
                               rtol=1e-6, atol=1e-6)


def test_pallas_rank1_finish_mode(rng):
    # finish=True parity: the Mosaic kernel's pivot-lane finishing write
    # must match the jnp twin, and the finished lanes must hold the
    # merged-factor rows (multipliers below the elimination row, U at and
    # beyond) so callers can skip _pivot_factors
    from conflux_tpu.ops.panel import _rank1_block_t
    from conflux_tpu.ops.pallas_panel import rank1_block_pallas_t

    m, w = 96, 16
    A = rng.standard_normal((m, w)).astype(np.float32)
    Mt = jnp.asarray(A.T)
    availf = jnp.ones((1, m), jnp.float32)
    Mref, _, piv_ref, _ = _rank1_block_t(
        Mt, availf, 0, forced=False, finish=True
    )
    out, _, pivw, _ = rank1_block_pallas_t(
        Mt, availf, forced=False, j0=0, interpret=True, finish=True,
    )
    np.testing.assert_array_equal(np.asarray(piv_ref), np.asarray(pivw))
    np.testing.assert_allclose(np.asarray(Mref), np.asarray(out),
                               rtol=1e-6, atol=1e-6)
    # merged-factor property of the finished pivot lanes: panel[piv]
    # reconstructs as unit_lower(lu) @ upper(lu) with lu = Mt'[:, piv].T
    lu = np.asarray(Mref)[:, np.asarray(pivw)].T  # [w, w]
    L = np.asarray(unit_lower(jnp.asarray(lu)))
    U = np.triu(lu)
    np.testing.assert_allclose(A[np.asarray(pivw)], L @ U,
                               rtol=1e-4, atol=1e-4)


def test_factor_panel_raw_unmerged_rows(rng):
    # factor_panel_raw(merged=False): M[piv] must equal the merged factor
    # that select_pivots computes via the forced re-elimination, across
    # block and group boundaries (block=128, _GROUP=512 -> w=640 hits the
    # outer-group finishing write; m > w hits deferred full-width rows)
    from conflux_tpu.ops.panel import factor_panel_raw

    m, w = 900, 640
    A = rng.standard_normal((m, w)).astype(np.float32)
    piv, ok, M, lu_none = factor_panel_raw(
        jnp.asarray(A), jnp.ones(m, bool), w, block=128, merged=False)
    assert lu_none is None
    assert np.asarray(ok).all()
    piv2, _, lu = select_pivots(jnp.asarray(A), jnp.ones(m, bool), w,
                                block=128)
    np.testing.assert_array_equal(np.asarray(piv), np.asarray(piv2))
    merged = np.asarray(M)[np.asarray(piv)]
    # the two paths compute the same U values with different summation
    # orders (deferred one-shot U12 vs forced re-elimination); with random
    # panels' pivot growth they differ by ~1e-4 relative — the
    # reconstruction gate below is the accuracy check (both paths measure
    # ~6.5e-5 max error vs an f64 reconstruction)
    np.testing.assert_allclose(merged, np.asarray(lu), rtol=2e-3, atol=2e-3)
    # and the reconstruction gate: P A == L U on the selected rows
    L = np.tril(merged, -1) + np.eye(w, dtype=np.float32)
    np.testing.assert_allclose(A[np.asarray(piv)], L @ np.triu(merged),
                               rtol=0, atol=5e-4)


def test_pallas_gemm_interpret_matches_numpy(rng):
    # interpret-mode parity of the Pallas trailing-GEMM kernel
    import functools

    import jax
    from jax.experimental import pallas as pl

    import conflux_tpu.ops.pallas_gemm as pg

    A = jnp.asarray(rng.random((256, 128)).astype(np.float32))
    B = jnp.asarray(rng.random((128, 256)).astype(np.float32))
    orig = pg.pl.pallas_call
    pg.pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        C = pg.matmul_pallas(A, B, bm=128, bn=128, bk=128)
    finally:
        pg.pl.pallas_call = orig
    np.testing.assert_allclose(
        np.asarray(C), np.asarray(A) @ np.asarray(B), rtol=1e-5, atol=1e-4
    )


def test_schur_update_pallas_interpret(rng):
    # interpret-mode parity of the fused trailing accumulate (the flat
    # LU's TPU fast path): untouched leading columns pass through, the
    # [c0, c1) span matches schur_dot for every mode, and bf16-STORAGE
    # output rounds once
    import functools

    import conflux_tpu.ops.pallas_gemm as pg
    from conflux_tpu.ops.tri import schur_dot

    m, k, nc, c0, c1 = 512, 128, 768, 256, 640
    R = jnp.asarray(rng.standard_normal((m, nc)).astype(np.float32))
    A = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    B = jnp.asarray(rng.standard_normal((k, c1 - c0)).astype(np.float32))
    orig = pg.pl.pallas_call
    pg.pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        for mode, tol in (("high", 2e-4), ("bf16", 1e-6)):
            got = pg.schur_update_pallas(R, A, B, c0, mode,
                                         bm=128, bn=128, c1=c1)
            ref = R.at[:, c0:c1].add(-schur_dot(A, B, mode))
            assert (np.asarray(got[:, :c0]) == np.asarray(R[:, :c0])).all()
            assert (np.asarray(got[:, c1:]) == np.asarray(R[:, c1:])).all()
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=tol, atol=tol * 30)
        Rb = R.astype(jnp.bfloat16)
        got = pg.schur_update_pallas(Rb, A, B, c0, "bf16out",
                                     bm=128, bn=128, c1=c1)
        assert got.dtype == jnp.bfloat16
        assert np.isfinite(np.asarray(got, dtype=np.float32)).all()
    finally:
        pg.pl.pallas_call = orig


def test_lu_nopivot_multiblock(rng):
    # n > _BLOCK exercises the forced inter-block update path (a transposed
    # orientation bug here once produced NaN factors on hardware only)
    from conflux_tpu.ops.panel import _BLOCK, lu_nopivot

    n = 3 * _BLOCK
    A = (rng.standard_normal((n, n)) + n * np.eye(n)).astype(np.float32)
    M = np.asarray(lu_nopivot(jnp.asarray(A)))
    assert np.isfinite(M).all()
    L = np.tril(M, -1) + np.eye(n, dtype=np.float32)
    U = np.triu(M)
    res = np.linalg.norm(A - L @ U) / np.linalg.norm(A)
    assert res < 1e-5, res


def test_select_pivots_multiblock(rng):
    # npiv > _BLOCK exercises the non-forced inter-block update + the
    # forced pivot-factor recompute
    from conflux_tpu.ops.panel import _BLOCK, select_pivots
    from conflux_tpu.ops.tri import unit_lower, upper

    m, w = 4 * _BLOCK, 2 * _BLOCK
    A = rng.standard_normal((m, w)).astype(np.float32)
    piv, ok, lu = select_pivots(jnp.asarray(A), jnp.ones(m, bool), w)
    piv, lu = np.asarray(piv), np.asarray(lu)
    assert np.asarray(ok).all() and np.isfinite(lu).all()
    assert len(np.unique(piv)) == w
    L = np.asarray(unit_lower(jnp.asarray(lu)))
    U = np.asarray(upper(jnp.asarray(lu)))
    res = np.linalg.norm(A[piv] - L @ U) / np.linalg.norm(A)
    assert res < 1e-5, res


def test_sub_matmul_pallas_bigk_interpret(rng):
    # interpret-mode parity of the big-K fused subtract (K as a grid
    # dimension with a VMEM accumulator — the left-looking update shape)
    import functools

    import jax
    import jax.numpy as jnp

    import conflux_tpu.ops.pallas_gemm as pg

    m, k, n = 1024, 1536, 512
    R = rng.standard_normal((m, n)).astype(np.float32)
    A = rng.standard_normal((m, k)).astype(np.float32) / np.sqrt(k)
    B = rng.standard_normal((k, n)).astype(np.float32)

    orig = pg.pl.pallas_call
    pg.pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        for mode, tol in (("high", 1e-4), ("bf16", 5e-2)):
            out = np.asarray(pg.sub_matmul_pallas_bigk(
                jnp.asarray(R), jnp.asarray(A), jnp.asarray(B), mode))
            want = R - A @ B
            np.testing.assert_allclose(out, want, atol=tol)
        # bf16-STORAGE output rounding
        out16 = pg.sub_matmul_pallas_bigk(
            jnp.asarray(R, jnp.bfloat16), jnp.asarray(A), jnp.asarray(B),
            "bf16out")
        assert out16.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out16.astype(jnp.float32)), R - A @ B, atol=0.25)
    finally:
        pg.pl.pallas_call = orig
        jax.clear_caches()


def test_split_hi_lo_survives_jit(rng):
    # The bf16x3 operand split must keep a NONZERO low half under jit:
    # toolchains forcing --xla_allow_excess_precision=true fold an
    # astype(bf16)/astype(f32) round-trip to identity, turning lo into
    # exact zeros and silently degrading 'high' kernels to single-pass
    # bf16 (observed on-chip: relerr 1.7e-3 == plain bf16). The
    # lax.reduce_precision formulation is the folding-proof spelling;
    # this pins both the algebra and the nonzero-lo property.
    import jax

    from conflux_tpu.ops.pallas_gemm import _split_hi_lo

    x = jnp.asarray(rng.standard_normal((256, 256)).astype(np.float32))
    hi, lo = jax.jit(_split_hi_lo)(x)
    assert hi.dtype == jnp.bfloat16 and lo.dtype == jnp.bfloat16
    # generic f32 data is not exactly representable in 8-bit mantissa
    assert np.count_nonzero(np.asarray(lo)) > lo.size // 2
    rec = np.asarray(hi).astype(np.float32) + np.asarray(lo).astype(np.float32)
    err = np.abs(rec - np.asarray(x)).max()
    # hi+lo carries ~16 mantissa bits of x
    assert err <= 2.0 ** -15, err


def test_schur_dot_bt_matches_explicit_transpose(rng):
    # bt=True contracts b's LAST dim (a @ b.T without materializing the
    # transpose) — the read path for operands carried transposed so their
    # per-step writes are column-offset dus (lu/p25d crout 'col' F mode)
    from conflux_tpu.ops.tri import schur_dot

    a = jnp.asarray(rng.standard_normal((96, 64)).astype(np.float32))
    bT = jnp.asarray(rng.standard_normal((80, 64)).astype(np.float32))
    for mode in ("highest", "high", "bf16", "bf16out"):
        got = np.asarray(schur_dot(a, bT, mode, bt=True), np.float32)
        ref = np.asarray(schur_dot(a, bT.T, mode), np.float32)
        np.testing.assert_array_equal(got, ref)
