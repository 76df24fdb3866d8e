"""Distributed COMPLEX (c64) 2.5D LU — the rank-program instantiation of
the complex dtype, completing capability parity with the reference's
complex template instantiations of the distributed stack (the reference
instantiates its layout adapter and BLAS shim for std::complex —
src/conflux/lu/layout.cpp:138-192, blas.cpp:15-122 — so its LU_rep runs
at any dtype the shim links).

Structure is the fori rank program of lu/p25d._local_lu_25d with every
real kernel swapped for its c64 twin from ops/cplx.py:

  * panel factorization / tournament merges: cpanel_factor (cabs1 pivot
    scoring — LAPACK cgetrf convention) through the SAME butterfly
    exchange machinery (_round_exchange is dtype-agnostic: ppermute and
    masked-psum move complex64 pairs as-is);
  * TRSMs: ctrsm_left_lower_unit / ctrsm_right_upper (blocked
    substitution, <=32-wide inverted diagonal blocks);
  * trailing update: cschur_dot — 4 (or 3m: 3) real f32 MXU GEMMs with
    f32 accumulation per complex product; the 2.5D split-K layer slicing
    is unchanged (each z layer updates with its l = ceil(v/Pz) slice).

The z-partial invariant carries over verbatim: complex local blocks are
z-partial sums (psum over 'z' == truth), finals live on layer z == 0.
Supported surface: tournament pivoting, fori variant, f32-pair storage
(no bf16 mode — complex bf16 has no LAPACK analog), square or tall
(M >= N; the tall epilogue _tall_tail is dtype-agnostic and reused).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from conflux_tpu.errors import ConfluxError, ErrorCode
from conflux_tpu.layout import BlockCyclic, local_row_to_global, local_tile_to_global
from conflux_tpu.lu.p25d import (
    _find_local_rows,
    _merge_round_generic,
    _round_exchange,
    _tall_tail,
)
from conflux_tpu.ops.cplx import (
    cpanel_factor,
    cschur_dot,
    ctrsm_left_lower_unit,
    ctrsm_right_upper,
)
from conflux_tpu.ops.tri import unit_lower, upper


def cselect_pivots(panel, active, npiv):
    """Complex twin of ops.panel.select_pivots: (piv, ok, lu) with lu the
    merged L\\U rows of the winners (cpanel_factor leaves them in place)."""
    piv, ok, M = cpanel_factor(panel, active, npiv)
    return piv, ok, M[piv]


def _ctournament(colk, active, gri, v: int, Px: int):
    """Tournament pivot selection over 'x' on a complex panel — the
    butterfly/merge schedule of p25d._tournament with cselect_pivots as
    the round kernel (cabs1 scoring everywhere)."""
    pi = jax.lax.axis_index("x")
    piv, ok, lu = cselect_pivots(colk, active, v)
    cand_vals = jnp.where(ok[:, None], colk[piv], 0)
    cand_idx = jnp.where(ok, gri[piv], -1)
    if Px == 1:
        return cand_idx, lu

    rounds = (Px - 1).bit_length()
    lu00 = lu
    for r in range(rounds):
        (recv_vals, recv_idx), src_of = _round_exchange(
            pi, (cand_vals, cand_idx), r, Px
        )
        src = jnp.array(src_of)[pi]
        recv_vals = jnp.where(src == pi, 0, recv_vals)
        recv_idx = jnp.where(src == pi, -1, recv_idx)
        low_first = src > pi
        a_vals = jnp.where(low_first, cand_vals, recv_vals)
        a_idx = jnp.where(low_first, cand_idx, recv_idx)
        b_vals = jnp.where(low_first, recv_vals, cand_vals)
        b_idx = jnp.where(low_first, recv_idx, cand_idx)
        cand_vals, cand_idx, lu00 = _merge_round_generic(
            a_vals, a_idx, b_vals, b_idx, v, cselect_pivots
        )
    return cand_idx, lu00


def _local_clu_25d(desc: BlockCyclic, method: str, Aloc, Floc, piv0):
    """Per-device SPMD program (complex64). Aloc/Floc: (1, Ml, Nl)."""
    v = desc.v
    Px, Py, Pz = desc.grid.Px, desc.grid.Py, desc.grid.Pz
    Ml, Nl = desc.Ml, desc.Nl
    Nt = desc.Nt
    l = desc.nlayr
    kpad = Pz * l - v

    pi = jax.lax.axis_index("x")
    pj = jax.lax.axis_index("y")
    pz = jax.lax.axis_index("z")

    gri = local_row_to_global(pi, Px, v, Ml)
    gt_col = local_tile_to_global(pj, Py, v, Nl)
    cdot = partial(cschur_dot, method=method)

    def step(k, state):
        A, F, active, pivots = state
        k = jnp.asarray(k, jnp.int32)
        z0 = jnp.int32(0)
        lj_k = k // Py
        li_k = k // Px
        own_y = pj == k % Py
        own_x = pi == k % Px

        # step 0: lazy z-reduction (complex psum = componentwise add)
        colk = jax.lax.psum(
            jax.lax.dynamic_slice(A, (z0, lj_k * v), (Ml, v)), "z")

        # step 1: tournament over 'x' on the owner column, bcast over 'y'
        win_idx, lu00 = _ctournament(colk, active, gri, v, Px)
        win_idx = jax.lax.psum(jnp.where(own_y, win_idx, 0), "y")
        lu00 = jax.lax.psum(jnp.where(own_y, lu00, 0), "y")

        pivots = jax.lax.dynamic_update_slice(pivots, win_idx, (k * v,))
        mine = ((win_idx // v) % Px == pi) & (win_idx >= 0)
        active = active & ~(gri[:, None] == win_idx[None, :]).any(axis=1)

        # steps 2+3: full-width pivot rows to everyone
        lr = jnp.clip((win_idx // v) // Px * v + win_idx % v, 0, Ml - 1)
        contrib = jnp.where(mine[:, None], jnp.take(A, lr, axis=0), 0)
        raw = jax.lax.psum(contrib, ("x", "z"))  # [v, Nl]

        # step 5: U row TRSM (redundant per device)
        L00 = unit_lower(lu00)
        U00 = upper(lu00)
        dU = jnp.diagonal(U00)
        U00 = U00 + jnp.diag(jnp.where(dU == 0, 1, 0).astype(U00.dtype))
        Y = ctrsm_left_lower_unit(L00, raw)  # [v, Nl]

        rownew = jnp.where(gt_col[None, :] > k, Y, raw)
        rownew = jnp.where(
            own_y, jax.lax.dynamic_update_slice(rownew, lu00, (z0, lj_k * v)),
            rownew)
        rowz = jnp.where(pz == 0, rownew, jnp.zeros_like(rownew))
        curF = jax.lax.dynamic_slice(F, (li_k * v, z0), (v, Nl))
        F = jax.lax.dynamic_update_slice(
            F, jnp.where(own_x, rowz, curF), (li_k * v, z0))

        # step 4: L column TRSM on the owner column
        L10 = ctrsm_right_upper(colk, U00)
        L10 = jnp.where(active[:, None], L10, 0)
        newpanel = jnp.where((pz == 0) & own_y, L10, jnp.zeros_like(L10))
        curp = jax.lax.dynamic_slice(A, (z0, lj_k * v), (Ml, v))
        A = jax.lax.dynamic_update_slice(
            A, jnp.where(own_y, newpanel, curp), (z0, lj_k * v))

        # step 6: split-K trailing update (layer pz takes its l slice)
        sl = (pz * l).astype(jnp.int32)
        L10p = jnp.pad(L10, ((0, 0), (0, kpad))) if kpad else L10
        Lk = jax.lax.psum(
            jnp.where(own_y,
                      jax.lax.dynamic_slice(L10p, (z0, sl), (Ml, l)), 0),
            "y")
        Ymask = jnp.where(gt_col[None, :] > k, Y, 0)
        Ymaskp = jnp.pad(Ymask, ((0, kpad), (0, 0))) if kpad else Ymask
        Yk = jax.lax.dynamic_slice(Ymaskp, (sl, z0), (l, Nl))
        upd = cdot(Lk, Yk)
        A = A - jnp.where(active[:, None], upd, 0)

        return A, F, active, pivots

    A0 = Aloc[0]
    F0 = Floc[0]
    # carries must derive from shard_map inputs (varying-manual-axes check)
    init = (A0, F0, jnp.ones_like(A0[:, 0], dtype=bool), piv0[0, 0, 0])
    A, F, active, pivots = jax.lax.fori_loop(0, Nt, step, init)
    if desc.M > desc.N:
        F, pivots = _tall_tail(desc, A, F, active, pivots, pi, pz, gri)
    return F[None], pivots[None, None, None]


def clu_25d(G, desc: BlockCyclic, method: str = "4m"):
    """Distributed complex LU: G (Pz, Px*Ml, Py*Nl) complex64 tile-cyclic
    (layout.distribute) -> (F, pivots) with the same contract as lu_25d —
    F holds the merged factor rows in pivot order, A[perm] = L @ U.
    `method` picks the complex-GEMM decomposition ('4m' / '3m')."""
    if not jnp.issubdtype(G.dtype, jnp.complexfloating):
        raise ConfluxError(ErrorCode.INVALID_TYPE,
                           f"complex input expected, got {G.dtype}")
    if desc.M < desc.N:
        raise ConfluxError(ErrorCode.INVALID_SHAPE,
                           "distributed LU requires M >= N")
    body = partial(_local_clu_25d, desc, method)
    fn = shard_map(
        body,
        mesh=desc.grid.mesh,
        in_specs=(P("z", "x", "y"), P("z", "x", "y"), P("z", "x", "y", None)),
        out_specs=(P("z", "x", "y"), P("z", "x", "y", None)),
    )
    zeros = jnp.zeros(desc.global_shape(), G.dtype)
    piv0 = jnp.zeros(
        (desc.grid.Pz, desc.grid.Px, desc.grid.Py, desc.M), jnp.int32)
    F, pivots = fn(G, zeros, piv0)
    return F, pivots[0, 0, 0]
