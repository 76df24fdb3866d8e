"""Complex (c64) compute shim — the MXU has no complex datapath, so every
complex GEMM is expressed as real f32 GEMMs with f32 accumulation.

Capability parity with the reference's complex instantiations of the BLAS
shim and layout (src/conflux/lu/blas.cpp:15-122 `cosma::gemm<std::complex
<float>>`, layout.cpp:138-192): the reference links cgemm/zgemm; here the
complex product is decomposed onto the real MXU:

  * '4m' (default): (Ar+iAi)(Br+iBi) = (ArBr - AiBi) + i(ArBi + AiBr) —
    4 real GEMMs, one rounding per output component (each component is a
    single f32-accumulated GEMM pair).
  * '3m' (the cgemm3m trick): K1 = Ar(Br+Bi), K2 = Bi(Ar+Ai),
    K3 = Br(Ai-Ar) -> re = K1 - K2, im = K1 + K3 — 3 real GEMMs, ~25%
    fewer FLOPs, one extra add-level of rounding (LAPACK ships the same
    trade as *gemm3m).

Pivot scoring uses LAPACK's cgetrf convention cabs1(z) = |re| + |im|
(one VPU add instead of a sqrt per candidate).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jnp.dot(a, b, precision=_PREC)


def cschur_dot(a: jnp.ndarray, b: jnp.ndarray, method: str = "4m"):
    """Complex matmul via real f32 GEMMs (module docstring). Accepts and
    returns complex64; the split/recombine is free on TPU (complex is
    stored as an f32 pair)."""
    ar, ai = jnp.real(a), jnp.imag(a)
    br, bi = jnp.real(b), jnp.imag(b)
    if method == "3m":
        k1 = _dot(ar, br + bi)
        k2 = _dot(ar + ai, bi)
        k3 = _dot(ai - ar, br)
        return jax.lax.complex(k1 - k2, k1 + k3)
    re = _dot(ar, br) - _dot(ai, bi)
    im = _dot(ar, bi) + _dot(ai, br)
    return jax.lax.complex(re, im)


def cabs1(z: jnp.ndarray) -> jnp.ndarray:
    """LAPACK cgetrf pivot magnitude: |re| + |im| (no sqrt)."""
    return jnp.abs(jnp.real(z)) + jnp.abs(jnp.imag(z))


def cpanel_factor(panel: jnp.ndarray, avail: jnp.ndarray, w: int):
    """Masked complex panel factorization with partial pivoting — the c64
    twin of ops.panel.factor_panel (same contract): returns (piv, ok, M)
    where M's non-pivot live rows hold complex multipliers and M[piv] is
    the merged L\\U of the winners. Scoring is cabs1 (cgetrf convention);
    exactly-zero pivots are replaced by 1 (skip-scaling semantics).

    A lax.fori_loop of rank-1 eliminations (w static, j dynamic): the
    complex rank-1 is two real outers per component on the VPU — this
    panel is not the complex path's hot op (the big-K cschur_dot GEMMs
    are), so no fused Mosaic variant exists for it."""
    m = panel.shape[0]
    cols = jnp.arange(w)
    rows = jnp.arange(m)

    def body(j, state):
        M, mask, piv, ok = state
        col = jax.lax.dynamic_slice_in_dim(M, j, 1, axis=1)[:, 0]
        score = jnp.where(mask, cabs1(col), -jnp.inf)
        p = jnp.argmax(score).astype(jnp.int32)
        onehot = rows == p
        prow = jnp.sum(jnp.where(onehot[:, None], M, 0), axis=0)  # [w]
        pv = jax.lax.dynamic_slice_in_dim(prow, j, 1)[0]
        pv = jnp.where(pv == 0, jnp.ones((), pv.dtype), pv)
        mult = col / pv
        elim = mask & ~onehot
        multm = jnp.where(elim, mult, 0)
        # one complex rank-1 on the columns right of j
        tr = jnp.where(cols > j, prow, 0)
        M = M - multm[:, None] * tr[None, :]
        # multiplier write into column j (live non-pivot rows only)
        newcol = jnp.where(elim, mult, col)
        M = jax.lax.dynamic_update_slice_in_dim(M, newcol[:, None], j, axis=1)
        piv = piv.at[j].set(p)
        ok = ok.at[j].set(mask[p])
        return M, mask & ~onehot, piv, ok

    # carries derive from the inputs (not fresh constants) so their
    # varying-manual-axes match under shard_map (CLAUDE.md invariant);
    # the value-preserving where() joins panel's vma with the mask's
    # (under the distributed rank program colk is z-INVARIANT post-psum
    # while the active mask is z-varying — the loop body mixes them, so
    # the initial carry must already carry the join)
    panel = jnp.where(avail[:, None], panel, panel)
    piv0 = jnp.zeros_like(avail[:w], dtype=jnp.int32)
    ok0 = jnp.zeros_like(avail[:w])
    M, _, piv, ok = jax.lax.fori_loop(
        0, w, body, (panel, avail, piv0, ok0),
    )
    return piv, ok, M


def _cinv_unit_lower_small(L: jnp.ndarray) -> jnp.ndarray:
    """Unit-lower complex inverse by nilpotent squaring (cschur_dot twin of
    tri._inv_unit_lower_small); NEVER call on triangles wider than the
    c^32 stability bound (tri.py module note)."""
    n = L.shape[0]
    eye = jnp.eye(n, dtype=L.dtype)
    M = eye - L
    acc = eye + M
    span = 2
    while span < n:
        M = cschur_dot(M, M)
        acc = acc + cschur_dot(acc, M)
        span *= 2
    return acc


_SUB = 32
_OUTER = 256


def ctrsm_left_lower_unit(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """X = L^{-1} B, L complex unit-lower: two-level blocked forward
    substitution (tri._solve_unit_lower_blocked structure) with every dot
    routed through cschur_dot — only <= 32-wide diagonal blocks are
    inverted (pivot-multiplier triangles are c^n ill-conditioned)."""
    n = L.shape[0]
    if n <= _SUB:
        return cschur_dot(_cinv_unit_lower_small(L), B)
    X = jnp.zeros_like(B)
    for o0 in range(0, n, _OUTER):
        o1 = min(o0 + _OUTER, n)
        rhs_o = B[o0:o1]
        if o0 > 0:
            rhs_o = rhs_o - cschur_dot(L[o0:o1, :o0], X[:o0])
        Xo = jnp.zeros_like(rhs_o)
        for i0 in range(o0, o1, _SUB):
            i1 = min(i0 + _SUB, o1)
            rhs = rhs_o[i0 - o0 : i1 - o0]
            if i0 > o0:
                rhs = rhs - cschur_dot(L[i0:i1, o0:i0], Xo[: i0 - o0])
            Xi = cschur_dot(_cinv_unit_lower_small(L[i0:i1, i0:i1]), rhs)
            Xo = jax.lax.dynamic_update_slice(Xo, Xi, (i0 - o0, 0))
        X = X.at[o0:o1].set(Xo)
    return X


def ctrsm_right_upper(B: jnp.ndarray, U: jnp.ndarray) -> jnp.ndarray:
    """X = B U^{-1}, U complex upper (zero diagonals replaced by 1)."""
    n = U.shape[0]
    d = jnp.diagonal(U)
    d = jnp.where(d == 0, jnp.ones((), U.dtype), d)
    Uu = U / d[:, None]  # unit upper
    # X Uu = B / then col-scale: transpose to a left unit-lower solve
    Xt = ctrsm_left_lower_unit(Uu.T, B.T)
    return Xt.T / d[None, :]
