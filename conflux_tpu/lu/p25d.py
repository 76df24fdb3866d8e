"""2.5D distributed LU with tournament pivoting (CONFLUX capability) as one
SPMD program.

TPU-native redesign of `conflux::LU_rep` (src/conflux/lu/conflux_opt.hpp:343-
1830).  The reference's seven sub-steps per iteration map as follows:

  step 0  panel reduce over k_comm (conflux_opt.hpp:618-648)
          -> `psum` of the step-k tile column over mesh axis 'z'
             (lazy 2.5D reduction; trailing matrix stays as z-partials).
  step 1  tournament pivoting (conflux_opt.hpp:693-838, tournament_rounds
          :220-336, butterfly_pair conflux_opt.cpp:59-72)
          -> local masked-argmax candidate selection + `ppermute` butterfly
             over 'x' (power-of-two Px) or a single `all_gather` merge
             (general Px / 'gather' mode). Candidates carry their global row
             index in a side array instead of a glued index column
             (`prepend_column`, utils.hpp:120-160).
  step 2  pivot-row reduction over z (conflux_opt.hpp:1137-1174)
          -> folded into the pivot-row gather: one masked psum over
             ('x','z') of the v selected rows, full width.
  step 3  pivot-row routing to the owner row (conflux_opt.hpp:1186-1260)
          -> the same psum delivers the rows to *every* device; the owner
             row pi == k%Px writes them into the output buffer (replacing
             the reference's MPI_Put window, conflux_opt.hpp:36-55).
  step 4  A10 TRSM + scatter over jk_comm (conflux_opt.hpp:1329-1434)
          -> TRSM against U00 on the owner column, psum-broadcast over 'y';
             the z-split happens at the GEMM (each layer consumes an
             nlayr = v/Pz column slice — lu_params.hpp:73).
  step 5  A01 TRSM + scatter over ik_comm (conflux_opt.hpp:1522-1592)
          -> every device TRSMs its own column slice of the gathered pivot
             rows against L00 redundantly (no communication at all).
  step 6  trailing GEMM (conflux_opt.hpp:1626-1634)
          -> one [Ml, l] x [l, Nl] MXU `dot` per device per step, masked to
             live rows/columns.

The reference's physical row compaction (`push_pivots_up`,
`first_non_pivot_row`, analyze_pivots — conflux_opt.hpp:176-218,1036-1124) is
replaced by a static-shape `active` row mask: pivoted rows simply stop
participating, and their factor content is relocated once, at selection time,
into the permuted-order output buffer. The output therefore matches the
reference's result layout: merged LU factors of P·A in block-cyclic order plus
the global pivot vector (`pivotIndsBuff`, conflux_opt.hpp:497-503).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from conflux_tpu.errors import ConfluxError, ErrorCode
from conflux_tpu.layout import (
    BlockCyclic,
    butterfly_pair,
    distribute,
    local_row_to_global,
    local_tile_to_global,
    undistribute,
)
from conflux_tpu.ops.panel import factor_panel_raw, select_pivots, lu_nopivot
from conflux_tpu.ops.tri import (
    schur_dot,
    trsm_left_lower_unit,
    trsm_right_upper,
    unit_lower,
    upper,
)

_PREC = jax.lax.Precision.HIGHEST


def _is_pow2(n: int) -> bool:
    return n & (n - 1) == 0


def _compute_dtype(dt):
    """Panel-math dtype: f32 for bf16 STORAGE (slices upcast before every
    psum — CLAUDE.md invariant), otherwise the storage dtype itself (f32
    normally; f64 under the jax_enable_x64 CPU validation mode, which
    sharpens every parity test's ground truth to ~1e-15)."""
    return jnp.float32 if dt == jnp.bfloat16 else dt


def _round_exchange(pi, arrays, r: int, Px: int):
    """One butterfly round of candidate exchange over mesh axis 'x' for
    ARBITRARY Px (the reference's non-power-of-two scheme: receive map
    `butterfly_pair`, conflux_opt.cpp:59-72, extra multicast sends
    conflux_opt.hpp:270-281).

    Device d receives from butterfly_pair(d, r, Px).  The receive map is
    decomposed at trace time into (a) one `ppermute` carrying all pairs whose
    source sends to exactly one destination and (b) one masked-psum broadcast
    per source with several destinations (ppermute sources must be unique).
    For power-of-two Px this is exactly one bijective ppermute per round.

    arrays: tuple of per-device buffers to exchange (same receive pattern).
    Returns (recv_arrays, src_ids [Px] host list).
    """
    from collections import Counter

    src_of = [butterfly_pair(d, r, Px) for d in range(Px)]
    pairs = [(s, d) for d, s in enumerate(src_of) if s != d]
    cnt = Counter(s for s, _ in pairs)
    bij = [(s, d) for s, d in pairs if cnt[s] == 1]
    multi = sorted({s for s, _ in pairs if cnt[s] > 1})

    recvs = list(arrays)  # self-receive default
    if bij:
        bij_dsts = jnp.array([d for _, d in bij])
        take = jnp.any(pi == bij_dsts)
        moved = [jax.lax.ppermute(a, "x", bij) for a in arrays]
        recvs = [jnp.where(take, m, rv) for m, rv in zip(moved, recvs)]
    for s in multi:
        dsts = jnp.array([d for ss, d in pairs if ss == s])
        take = jnp.any(pi == dsts)
        bcast = [jax.lax.psum(jnp.where(pi == s, a, 0), "x") for a in arrays]
        recvs = [jnp.where(take, b, rv) for b, rv in zip(bcast, recvs)]
    return tuple(recvs), src_of


def _merge_round_generic(vals_a, idx_a, vals_b, idx_b, v, select):
    """One tournament merge: select the v best rows among 2v candidates.
    Candidates keep their ORIGINAL panel values (the reference re-permutes
    back with inverse_permute_rows, conflux_opt.hpp:300-330); the merged LU
    is only used in the final round. `select` is the round kernel —
    ops.panel.select_pivots for real panels, lu.cp25d.cselect_pivots
    (cabs1 scoring) for the complex rank program."""
    vals = jnp.concatenate([vals_a, vals_b], axis=0)
    idx = jnp.concatenate([idx_a, idx_b], axis=0)
    piv, ok, lu = select(vals, idx >= 0, v)
    win_vals = jnp.where(ok[:, None], vals[piv], 0)
    win_idx = jnp.where(ok, idx[piv], -1)
    return win_vals, win_idx, lu


def _merge_round(vals_a, idx_a, vals_b, idx_b, v):
    return _merge_round_generic(vals_a, idx_a, vals_b, idx_b, v,
                                select_pivots)


def _tournament(colk, active, gri, v: int, Px: int, mode: str):
    """Select the v pivot rows of the step panel across mesh axis 'x'.

    colk: [Ml, v] updated panel column (true values, post z-reduction);
    active: [Ml] live-row mask; gri: [Ml] global row index of local rows.
    Returns (win_idx [v] global row ids, lu00 [v, v] merged factors of the
    winners in pivot order). Every device on the x axis ends with identical
    results (butterfly = all-exchange; merges use a canonical order so
    floating-point ties break identically everywhere).
    """
    pi = jax.lax.axis_index("x")
    # local round: best v of my rows (reference: LUP on [n_local_rows x v],
    # conflux_opt.hpp:727)
    piv, ok, lu = select_pivots(colk, active, v)
    cand_vals = jnp.where(ok[:, None], colk[piv], 0)
    cand_idx = jnp.where(ok, gri[piv], -1)

    if Px == 1:
        return cand_idx, lu

    if mode == "butterfly":
        # log-round tournament for ARBITRARY Px (reference: tournament_rounds
        # conflux_opt.hpp:220-336 with butterfly_pair; for power-of-two Px
        # every round is one bijective ppermute)
        rounds = (Px - 1).bit_length()
        lu00 = lu
        for r in range(rounds):
            (recv_vals, recv_idx), src_of = _round_exchange(
                pi, (cand_vals, cand_idx), r, Px
            )
            # canonical order: the lower-ORIGIN list first, so every device
            # (and every z/y replica) computes the identical merge
            src = jnp.array(src_of)[pi]
            # a self-receive round (src == pi, only for non-pow2 Px) would
            # merge a duplicated list; deliver an empty list instead
            recv_vals = jnp.where(src == pi, 0, recv_vals)
            recv_idx = jnp.where(src == pi, -1, recv_idx)
            low_first = src > pi
            a_vals = jnp.where(low_first, cand_vals, recv_vals)
            a_idx = jnp.where(low_first, cand_idx, recv_idx)
            b_vals = jnp.where(low_first, recv_vals, cand_vals)
            b_idx = jnp.where(low_first, recv_idx, cand_idx)
            cand_vals, cand_idx, lu00 = _merge_round(a_vals, a_idx, b_vals, b_idx, v)
        return cand_idx, lu00

    # general Px: single all_gather merge (the analog of the reference's
    # collectives path, use_collectives lu_params.hpp:60-65)
    all_vals = jax.lax.all_gather(cand_vals, "x").reshape(Px * v, v)
    all_idx = jax.lax.all_gather(cand_idx, "x").reshape(Px * v)
    piv2, ok2, lu00 = select_pivots(all_vals, all_idx >= 0, v)
    win_idx = jnp.where(ok2, all_idx[piv2], -1)
    return win_idx, lu00


def _full_pivot(colk, active, gri, v: int, Px: int):
    """Exact partial pivoting: gather the whole panel over 'x' and select.
    Matches single-device blocked LU pivot-for-pivot; used as a parity oracle
    and as the 'full' strategy."""
    Ml = colk.shape[0]
    allc = jax.lax.all_gather(colk, "x")  # [Px, Ml, v]
    alla = jax.lax.all_gather(active, "x")
    allg = jax.lax.all_gather(gri, "x")
    # reorder to global row order by sorting on the global id (gri is unique
    # over live rows, so this is exact for ANY row layout — block-cyclic or
    # rebalanced; gri = -1 pad slots sort last and are inactive anyway),
    # keeping tie-breaks pivot-for-pivot identical to the single-chip oracle
    flatc = allc.reshape(Px * Ml, v)
    flata = alla.reshape(Px * Ml)
    flatg = allg.reshape(Px * Ml)
    order = jnp.argsort(jnp.where(flatg >= 0, flatg, jnp.iinfo(jnp.int32).max))
    panel = flatc[order]
    act = flata[order]
    gidx = flatg[order]
    piv, ok, lu00 = select_pivots(panel, act, v)
    return jnp.where(ok, gidx[piv], -1), lu00


def _find_local_rows(gri, win_idx):
    """Locate the v winner rows among MY local rows by global row id.
    Works for ANY row layout (the closed form lr = (g//v)//Px*v + g%v holds
    only for the initial block-cyclic placement — rebalanced layouts carry
    their placement in `gri`). Returns (mine [v] bool, lr [v] local rows)."""
    eq = gri[:, None] == win_idx[None, :]            # [Ml, v]
    mine = eq.any(axis=0) & (win_idx >= 0)
    lr = jnp.argmax(eq, axis=0).astype(jnp.int32)    # 0 when absent (masked)
    return mine, lr


def _rebalance_rows(A, active, gri, Mg: int, Mlp: int, Px: int,
                    chunk: int = 4096):
    """Shrink the local working rows from Ml to Mlp by redistributing the
    globally-live rows (ascending original-row order) evenly over mesh axis
    'x' — the DISTRIBUTED analog of the single-chip flat kernel's band
    emission and of the reference's shrinking per-rank working set
    (first_non_pivot_row / push_pivots_up, conflux_opt.hpp:176-218,535-648):
    dead rows' factor content already lives in F (written at selection), so
    they simply leave the working set and every later panel/TRSM/GEMM runs
    on [Mlp, .] instead of masked full height.

    Data movement is gathers + 1-D index scatters + one psum_scatter per
    column chunk (a direct 2-D row scatter would lower to a serial loop,
    CLAUDE.md): each device places its live rows at their global live-rank
    slot in a [Px*Mlp, chunk] contribution (zeros elsewhere) and
    `psum_scatter` over 'x' hands device pi slots [pi*Mlp, (pi+1)*Mlp) —
    ring reduce-scatter volume ~ live*Nl/Px per device, one local-slab
    read per rebalance. Column chunking bounds the contribution temp to
    [live, chunk] (the unchunked [live, Nl] temp is Px times the local
    slab). Identical across 'y'/'z' replicas; z layers move their own
    partial sums, preserving the z-partial invariant.

    Returns (A' [Mlp, Nl], active' [Mlp], gri' [Mlp]); pad slots (when
    Px*Mlp > live) carry gri = -1, active = False."""
    i32 = jnp.int32
    Ml, Nl = A.shape
    T = Px * Mlp
    # global live mask, identical on every device: 1-D scatter by global id
    g = jnp.where(gri >= 0, gri, Mg)
    cnt = jnp.zeros(Mg, i32).at[g].add(active.astype(i32), mode="drop")
    act_g = jax.lax.psum(cnt, "x") > 0
    rank_g = jnp.cumsum(act_g.astype(i32)) - 1       # live rank by global id
    slot = jnp.where(active, rank_g[jnp.clip(g, 0, Mg - 1)], T)
    # invert the (injective on live rows) slot map with 1-D index scatters
    inv = jnp.zeros(T, i32).at[slot].set(jnp.arange(Ml, dtype=i32),
                                         mode="drop")
    has = jnp.zeros(T, jnp.bool_).at[slot].set(True, mode="drop")
    if Px == 1:
        return (jnp.where(has[:, None], A[inv], 0), has,
                jnp.where(has, gri[inv], -1))
    g2 = jax.lax.psum_scatter(
        jnp.where(has, gri[inv] + 1, 0), "x", scatter_dimension=0, tiled=True
    ) - 1
    cols = []
    for c0 in range(0, Nl, chunk):
        c1 = min(c0 + chunk, Nl)
        As = jax.lax.slice(A, (0, c0), (Ml, c1))  # slice BEFORE the gather:
        C = jnp.where(has[:, None], As[inv], 0)   # the temp stays [T, chunk]
        cols.append(jax.lax.psum_scatter(C, "x", scatter_dimension=0,
                                         tiled=True))
    A2 = cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=1)
    return A2, g2 >= 0, g2


def _row_frontier(Mg: int, steps_done: int, v: int, Px: int) -> int:
    """Static per-device working-row height once steps_done panels have been
    selected: ceil(live/Px) rounded up to the 8-row sublane tile, floored at
    v rows — the local tournament round (select_pivots) draws v candidates
    from the local block, so the block may never shrink below v."""
    live = Mg - steps_done * v
    return max(-(-v // 8) * 8, -(-live // Px // 8) * 8)


def _tall_tail(desc: BlockCyclic, A, F, active, pivots, pi, pz, gri):
    """Epilogue for rectangular (tall, M > N) LU: the M - N rows never
    selected as pivots hold their completed multiplier rows in A (layer 0);
    scatter them into the factor's tail slots N..M-1 in ascending global-row
    order and extend the pivot vector to length M (LAPACK trapezoid
    semantics; reference: rectangular padding lu_params.hpp:67-82)."""
    v = desc.v
    Px = desc.grid.Px
    Ml, Nl = desc.Ml, desc.Nl
    Mg, Ng = desc.M, desc.N
    tail = Mg - Ng
    # global active mask in global row order (identical on every device):
    # a 1-D count scatter by global row id + psum over 'x' — valid for ANY
    # row layout (the working set may have been rebalanced away from
    # block-cyclic), with gri = -1 pad slots dropped
    g = jnp.where(gri >= 0, gri, Mg)
    cnt = jnp.zeros(Mg, jnp.int32).at[g].add(active.astype(jnp.int32),
                                             mode="drop")
    act_g = jax.lax.psum(cnt, "x") > 0
    rank_g = jnp.cumsum(act_g.astype(jnp.int32)) - 1  # rank among active rows
    gidx = jnp.arange(Mg, dtype=jnp.int32)
    # pivots tail: slot Ng + r holds the r-th (ascending) active global row
    tailpiv = jnp.zeros(tail, jnp.int32).at[
        jnp.where(act_g, rank_g, tail)
    ].set(gidx, mode="drop")
    pivots = jax.lax.dynamic_update_slice(pivots, tailpiv, (Ng,))
    # tail values: every device contributes its active rows (multipliers live
    # on layer 0), one psum over ('x','z') delivers the tail block everywhere
    myrank = rank_g[jnp.clip(g, 0, Mg - 1)]            # [local rows]
    vals = jnp.where((active & (pz == 0))[:, None], A, 0)
    contrib = jnp.zeros((tail, Nl), A.dtype).at[
        jnp.where(active, myrank, tail)
    ].set(vals, mode="drop")
    rows = jax.lax.psum(contrib, ("x", "z"))           # [tail, Nl]
    # write the slots this device row owns (layer 0 only; F is 0 elsewhere)
    gslot = Ng + jnp.arange(tail)
    lrow = (gslot // v) // Px * v + gslot % v
    dest = jnp.where(((gslot // v) % Px == pi) & (pz == 0), lrow, Ml)
    F = F.at[dest].set(rows, mode="drop")
    return F, pivots


def _local_lu_25d(desc: BlockCyclic, pivoting: str, precision: str, Aloc, Floc, piv0):
    """Per-device SPMD program. Aloc/Floc: (1, Ml, Nl); piv0: (1,1,1,N)."""
    v = desc.v
    Px, Py, Pz = desc.grid.Px, desc.grid.Py, desc.grid.Pz
    Ml, Nl = desc.Ml, desc.Nl
    Nt = desc.Nt
    l = desc.nlayr  # per-layer update rank ceil(v/Pz) (lu_params.hpp:73)
    kpad = Pz * l - v  # zero pad so the last layer's slice is in bounds

    pi = jax.lax.axis_index("x")
    pj = jax.lax.axis_index("y")
    pz = jax.lax.axis_index("z")

    gri = local_row_to_global(pi, Px, v, Ml)    # global row of local row
    gt_col = local_tile_to_global(pj, Py, v, Nl)  # global tile col of local col
    cdt = _compute_dtype(Aloc.dtype)

    def step(k, state):
        A, F, active, pivots = state
        k = jnp.asarray(k, jnp.int32)  # x64 mode makes fori counters int64
        lj_k = k // Py
        li_k = k // Px
        own_y = pj == k % Py
        own_x = pi == k % Px

        # -- step 0: lazy z-reduction of the panel column --------------------
        # (bf16-STORAGE blocks are bf16 z-partials; the reduction and all
        # panel math run f32 — same contract as the single-chip bf16s mode)
        z0 = jnp.int32(0)  # typed zero: bare 0 canonicalizes to int64
        #                         under the f64-on-CPU x64 validation mode
        with jax.named_scope("step0_reduce"):
            colk = jax.lax.psum(
                jax.lax.dynamic_slice(A, (z0, lj_k * v), (Ml, v)).astype(
                    cdt), "z")

        # -- step 1: pivot selection over 'x' ---------------------------------
        with jax.named_scope("step1_pivot"):
            if pivoting == "tournament":
                win_idx, lu00 = _tournament(colk, active, gri, v, Px,
                                            "butterfly")
            elif pivoting == "gather":
                win_idx, lu00 = _tournament(colk, active, gri, v, Px,
                                            "gather")
            elif pivoting == "full":
                win_idx, lu00 = _full_pivot(colk, active, gri, v, Px)
            elif pivoting == "none":
                # round-robin: pivots are the natural diagonal-tile rows
                # (EmptyPivot, python/pivoting.py:17-76)
                win_idx = k * v + jnp.arange(v, dtype=jnp.int32)
                diag = jax.lax.dynamic_slice(colk, (li_k * v, z0),
                                             (v, v))
                a00 = jax.lax.psum(jnp.where(own_x & own_y, diag, 0),
                                   ("x", "y"))
                lu00 = lu_nopivot(a00)
            else:  # pragma: no cover
                raise ValueError(f"unknown pivoting {pivoting!r}")

            if pivoting in ("tournament", "gather", "full"):
                # selection ran on owner-column data; broadcast results over
                # 'y' (reference: gpivots bcast, conflux_opt.hpp:863-872)
                win_idx = jax.lax.psum(jnp.where(own_y, win_idx, 0), "y")
                lu00 = jax.lax.psum(jnp.where(own_y, lu00, 0), "y")

        pivots = jax.lax.dynamic_update_slice(pivots, win_idx, (k * v,))
        # win_idx == -1 (globally rank-deficient panel) must not alias to
        # device row Px-1 via floor-mod: invalid slots contribute zeros
        mine = ((win_idx // v) % Px == pi) & (win_idx >= 0)
        active = active & ~(gri[:, None] == win_idx[None, :]).any(axis=1)

        # -- steps 2+3: gather the v pivot rows, full width, to everyone -----
        # each row lives on one device row; trailing columns are z-partials
        # and frozen L columns live on layer 0 only, so one masked psum over
        # ('x','z') reconstructs the true full-width rows everywhere.
        with jax.named_scope("step23_rows"):
            lr = jnp.clip((win_idx // v) // Px * v + win_idx % v, 0, Ml - 1)
            contrib = jnp.where(
                mine[:, None], jnp.take(A, lr, axis=0), 0).astype(cdt)
            raw = jax.lax.psum(contrib, ("x", "z"))  # [v, Nl] pivot rows

        # -- step 5: A01 TRSM (redundant per device, zero communication) -----
        L00 = unit_lower(lu00)
        U00 = upper(lu00)
        # exactly-zero pivots (rank-deficient panel) are replaced by 1 for the
        # solves so factors stay finite — LAPACK getrf's skip-scaling semantics
        dU = jnp.diagonal(U00)
        U00 = U00 + jnp.diag(jnp.where(dU == 0, 1, 0).astype(U00.dtype))
        with jax.named_scope("step45_trsm"):
            Y = trsm_left_lower_unit(L00, raw, method="invert")  # [v, Nl]

            # assemble the output block row: L columns keep raw values, the
            # panel tile becomes merged lu00, trailing columns become U01 = Y
            rownew = jnp.where(gt_col[None, :] > k, Y, raw)
            rownew = jnp.where(
                own_y,
                jax.lax.dynamic_update_slice(rownew, lu00, (z0, lj_k * v)),
                rownew
            )
            rowz = jnp.where(pz == 0, rownew, jnp.zeros_like(rownew))
            # select on the row block, not the whole matrix (a full-size
            # where materializes two extra [Ml, Nl] temps — OOM at N=32768)
            curF = jax.lax.dynamic_slice(F, (li_k * v, z0), (v, Nl))
            F = jax.lax.dynamic_update_slice(
                F, jnp.where(own_x, rowz.astype(F.dtype), curF),
                (li_k * v, z0)
            )

            # -- step 4: A10 TRSM on the owner column, broadcast over 'y' ----
            L10 = trsm_right_upper(colk, U00, method="invert")
            L10 = jnp.where(active[:, None], L10, 0)
            newpanel = jnp.where((pz == 0) & own_y, L10, jnp.zeros_like(L10))
            curp = jax.lax.dynamic_slice(A, (z0, lj_k * v), (Ml, v))
            A = jax.lax.dynamic_update_slice(
                A, jnp.where(own_y, newpanel.astype(A.dtype), curp),
                (z0, lj_k * v)
            )
        # -- step 6: split-K trailing update (layer pz takes an l slice) -----
        # only the per-layer slice of L10 is broadcast over 'y' — the
        # reference's per-layer Iscatterv on jk_comm (conflux_opt.hpp:
        # 1424-1434) — v/Pz of the full-panel volume
        with jax.named_scope("step6_update"):
            sl = (pz * l).astype(jnp.int32)
            L10p = jnp.pad(L10, ((0, 0), (0, kpad))) if kpad else L10
            Lk = jax.lax.psum(
                jnp.where(own_y,
                          jax.lax.dynamic_slice(L10p, (z0, sl), (Ml, l)), 0),
                "y",
            )  # [Ml, l]
            Ymask = jnp.where(gt_col[None, :] > k, Y, 0)
            Ymaskp = jnp.pad(Ymask, ((0, kpad), (0, 0))) if kpad else Ymask
            Yk = jax.lax.dynamic_slice(Ymaskp, (sl, z0), (l, Nl))
            mode = "bf16out" if A.dtype == jnp.bfloat16 else precision
            upd = schur_dot(Lk, Yk, mode)
            A = A - jnp.where(active[:, None], upd, 0)

        return A, F, active, pivots

    A0 = Aloc[0]
    F0 = Floc[0]
    init = (A0, F0, jnp.ones_like(A0[:, 0], dtype=bool), piv0[0, 0, 0])
    A, F, active, pivots = jax.lax.fori_loop(0, Nt, step, init)
    if desc.M > desc.N:
        F, pivots = _tall_tail(desc, A, F, active, pivots, pi, pz, gri)
    return F[None], pivots[None, None, None]


def _trailing_sub(A, Lk, Yk, c0: int, c1: int, precision: str, active):
    """A[:, c0:c1] -= where(active, Lk @ Yk, 0): the distributed step-6
    trailing update (conflux_opt.hpp:1626-1634 analog). On real TPU
    backends with 512-divisible static shapes this is the fused Mosaic
    accumulate (ops/pallas_gemm.schur_update_pallas, measured 2.1x over
    the dot_general + aliased-add arrangement at trailing shapes); the
    row mask folds into Lk's rows (exact — 0/1 multiply). Otherwise the
    dot_general fallback. Only static-k variants can call this (c0/c1
    must be Python ints). A bfloat16 A selects the bf16-STORAGE update
    (one bf16 MXU pass, f32 accumulation, bf16-rounded result)."""
    from conflux_tpu.lu.single import _PALLAS_R_LIMIT, _pallas_mode_ok

    m, n = A.shape
    l = Lk.shape[1]
    mode = "bf16out" if A.dtype == jnp.bfloat16 else precision
    if (c1 == n and _pallas_mode_ok(A, mode, c0, n)
            and l % 128 == 0
            and m * n * A.dtype.itemsize <= _PALLAS_R_LIMIT):
        from conflux_tpu.ops.pallas_gemm import schur_update_pallas

        return schur_update_pallas(
            A, jnp.where(active[:, None], Lk, 0), Yk, c0, mode)
    upd = schur_dot(Lk, Yk, mode)
    return A.at[:, c0:c1].add(-jnp.where(active[:, None], upd, 0))


def _local_lu_25d_unrolled(
    desc: BlockCyclic, pivoting: str, precision: str, Aloc, Floc, piv0,
    lookahead: bool = False, rowpart: "int | None" = None,
):
    """Unrolled-step variant of the LU rank program: `k` is a Python int, so
    the dead column prefix (tiles < k — frozen L columns) is excluded by a
    *static* slice instead of a mask, AND the working rows shrink on a
    static schedule: every `rowpart` steps (default Px — about v dead rows
    shed per device per event; 0 disables) the globally-live rows are
    rebalanced evenly over 'x' by `_rebalance_rows`, so panels, TRSMs and
    trailing GEMMs all run at the shrunk height — the distributed analog of
    the flat single-chip kernel's per-step band emission and of the
    reference's first_non_pivot_row compaction (conflux_opt.hpp:176-218,
    535-648). Row placement is carried in `gri` (winner lookup by global id,
    _find_local_rows), so no closed-form block-cyclic row math survives past
    the first rebalance. ~2x fewer trailing-GEMM FLOPs than the fori version
    plus cross-step collective overlap; trace size grows with Nt.

    lookahead=True splits every trailing update in two: the NEXT step's panel
    column is updated (and z-reduced) by a small [Ml,l]x[l,v] GEMM *before*
    the bulk update of the rest of the window, so step k+1's tournament
    collectives (the latency-bound ppermute butterfly) depend only on the
    small GEMM and are schedulable concurrently with step k's bulk GEMM —
    the dependence-structure realization of the reference's comm/compute
    overlap (`updateComputeA10`, Cholesky.cpp:380-564; the LU Waitany loop,
    conflux_opt.hpp:1613-1634). XLA's latency-hiding scheduler needs the
    independence to exist in the dataflow; this variant creates it."""
    v = desc.v
    Px, Py, Pz = desc.grid.Px, desc.grid.Py, desc.grid.Pz
    Ml, Nl = desc.Ml, desc.Nl
    Nt = desc.Nt
    l = desc.nlayr
    kpad = Pz * l - v
    if rowpart is None:
        rowpart = Px  # ~v dead rows shed per device per rebalance

    pi = jax.lax.axis_index("x")
    pj = jax.lax.axis_index("y")
    pz = jax.lax.axis_index("z")

    gri = local_row_to_global(pi, Px, v, Ml)
    gt_col = local_tile_to_global(pj, Py, v, Nl)

    A = Aloc[0]
    F = Floc[0]
    cdt = _compute_dtype(A.dtype)
    active = jnp.ones_like(A[:, 0], dtype=bool)
    pivots = piv0[0, 0, 0]

    colnext = (jax.lax.psum(A[:, :v].astype(cdt), "z")
               if lookahead else None)
    for k in range(Nt):
        mr = A.shape[0]        # static working height (shrinks at rebalance)
        c0 = (k // Py) * v     # static frozen-column frontier
        r0f = (k // Px) * v    # static output-block row offset
        own_y = pj == k % Py
        own_x = pi == k % Px

        with jax.named_scope("step0_reduce"):
            colk = colnext if lookahead else jax.lax.psum(
                A[:, c0 : c0 + v].astype(cdt), "z")

        with jax.named_scope("step1_pivot"):
            if pivoting == "tournament":
                win_idx, lu00 = _tournament(colk, active, gri, v, Px,
                                            "butterfly")
            elif pivoting == "gather":
                win_idx, lu00 = _tournament(colk, active, gri, v, Px,
                                            "gather")
            elif pivoting == "full":
                win_idx, lu00 = _full_pivot(colk, active, gri, v, Px)
            elif pivoting == "none":
                win_idx = k * v + jnp.arange(v, dtype=jnp.int32)
                # diagonal-tile rows located by global id (they may sit
                # anywhere after a rebalance); each on exactly one x device
                mine_n, dlr = _find_local_rows(gri, win_idx)
                dcontrib = jnp.where(mine_n[:, None],
                                     jnp.take(colk, dlr, axis=0), 0)
                a00 = jax.lax.psum(jnp.where(own_y, dcontrib, 0), ("x", "y"))
                lu00 = lu_nopivot(a00)
            else:  # pragma: no cover
                raise ValueError(f"unknown pivoting {pivoting!r}")

            if pivoting in ("tournament", "gather", "full"):
                win_idx = jax.lax.psum(jnp.where(own_y, win_idx, 0), "y")
                lu00 = jax.lax.psum(jnp.where(own_y, lu00, 0), "y")

        pivots = jax.lax.dynamic_update_slice(pivots, win_idx, (k * v,))
        # winner lookup by global id (valid for any row layout); invalid
        # slots (win_idx == -1, rank-deficient panel) contribute zeros
        mine, lr = _find_local_rows(gri, win_idx)
        active = active & ~(gri[:, None] == win_idx[None, :]).any(axis=1)

        with jax.named_scope("step23_rows"):
            contrib = jnp.where(
                mine[:, None], jnp.take(A, lr, axis=0), 0).astype(cdt)
            raw = jax.lax.psum(contrib, ("x", "z"))  # [v, Nl]

        with jax.named_scope("step45_trsm"):
            L00 = unit_lower(lu00)
            U00 = upper(lu00)
            dU = jnp.diagonal(U00)
            U00 = U00 + jnp.diag(jnp.where(dU == 0, 1, 0).astype(U00.dtype))
            # TRSM only the live window; frozen L columns pass through
            Y = trsm_left_lower_unit(L00, raw[:, c0:], method="invert")

            rowwin = jnp.where(gt_col[None, c0:] > k, Y, raw[:, c0:])
            rowwin = jnp.where(
                own_y, jax.lax.dynamic_update_slice(rowwin, lu00, (0, 0)),
                rowwin
            )
            rownew = jnp.concatenate([raw[:, :c0], rowwin], axis=1)
            rowz = jnp.where(pz == 0, rownew, jnp.zeros_like(rownew))
            # block-local select (a full-size where costs two [Ml, Nl] temps)
            F = F.at[r0f : r0f + v, :].set(
                jnp.where(own_x, rowz.astype(F.dtype), F[r0f : r0f + v, :])
            )

            L10 = trsm_right_upper(colk, U00, method="invert")
            L10 = jnp.where(active[:, None], L10, 0)
            newpanel = jnp.where((pz == 0) & own_y, L10, jnp.zeros_like(L10))
            A = A.at[:, c0 : c0 + v].set(
                jnp.where(own_y, newpanel.astype(A.dtype), A[:, c0 : c0 + v])
            )
        with jax.named_scope("step6_update"):
            # per-layer slice broadcast (see the fori variant)
            sl = (pz * l).astype(jnp.int32)
            z0 = jnp.int32(0)  # typed zero (x64 validation mode)
            L10p = jnp.pad(L10, ((0, 0), (0, kpad))) if kpad else L10
            Lk = jax.lax.psum(
                jnp.where(own_y,
                          jax.lax.dynamic_slice(L10p, (z0, sl), (mr, l)), 0),
                "y",
            )
            Ymask = jnp.where(gt_col[None, c0:] > k, Y, 0)
            Ymaskp = jnp.pad(Ymask, ((0, kpad), (0, 0))) if kpad else Ymask
            if lookahead and k + 1 < Nt:
                # small update + z-reduction of ONLY step k+1's panel column:
                # everything step k+1's tournament needs, independent of the
                # bulk
                c1 = ((k + 1) // Py) * v
                Yn = jax.lax.dynamic_slice(Ymaskp,
                                           (sl, jnp.int32(c1 - c0)), (l, v))
                A = _trailing_sub(A, Lk, Yn, c1, c1 + v, precision, active)
                colnext = jax.lax.psum(
                    A[:, c1 : c1 + v].astype(cdt), "z")
                # bulk update of the rest of the window (the already-updated
                # next-column slice is zeroed so it is not applied twice)
                Yk = jax.lax.dynamic_slice(Ymaskp, (sl, z0), (l, Nl - c0))
                Yk = Yk.at[:, c1 - c0 : c1 - c0 + v].set(0)
                A = _trailing_sub(A, Lk, Yk, c0, Nl, precision, active)
            else:
                Yk = jax.lax.dynamic_slice(Ymaskp, (sl, z0), (l, Nl - c0))
                A = _trailing_sub(A, Lk, Yk, c0, Nl, precision, active)

        # ROW FRONTIER: shed the dead rows on a static cadence (module
        # docstring). Skipped on the last step (the tall tail still reads A).
        if rowpart and (k + 1) % rowpart == 0 and k + 1 < Nt:
            Mlp = _row_frontier(desc.M, k + 1, v, Px)
            if Mlp < mr:
                with jax.named_scope("rebalance"):
                    A, active, gri = _rebalance_rows(A, active, gri, desc.M,
                                                     Mlp, Px)
                if lookahead:
                    # colnext rows were permuted with A; its column c1 is
                    # already fully updated, so one z-reduction refreshes it
                    c1 = ((k + 1) // Py) * v
                    colnext = jax.lax.psum(
                        A[:, c1 : c1 + v].astype(cdt), "z")

    if desc.M > desc.N:
        F, pivots = _tall_tail(desc, A, F, active, pivots, pi, pz, gri)
    return F[None], pivots[None, None, None]


def crout_rowpart_default(Px: int, Nt: int) -> int:
    """Measured rebalance-cadence default for the crout rank program
    (results/r5_experiments.md cadence sweeps): the optimum tracks ~Nt/4
    rebalances, capped at a 4-panel-per-device frontier shrink —
    N=16384 v=1024 (Nt=16): rp=4 216.0 ms (rp=2 222.5, rp=3 239.1,
    rp=8 229.3); v=2048 (Nt=8): rp=2 222.9 (rp=4 237.3); N=32768 v=1024
    (Nt=32): rp=4 1140.5 == rp=8 1140.7. The crout program has no
    trailing update, so its masked-FLOP surplus from stale frontiers
    grows slower than the right-looking variants' (whose default stays
    Px)."""
    return max(Px, min(4 * Px, -(-Nt // 4)))


def _local_lu_25d_crout(
    desc: BlockCyclic, pivoting: str, precision: str, Aloc, Floc, piv0,
    rowpart: "int | None" = None,
):
    """LEFT-LOOKING (crout) variant of the LU rank program: there is NO
    trailing update. Each step's panel column is assembled by ONE big-K
    GEMM against the frozen L columns (local) and the U row-blocks already
    in F, and the winners' U12 row is finished immediately by a second
    distributed big-K GEMM — so every GEMM has K proportional to k*v
    (compute-bound on the MXU), not the right-looking variants'
    K = nlayr = v/Pz re-read-bound trailing shape (measured 17-25 TF/s vs
    the 56.2 TF/s envelope, experiments/prof_k_sweep.py). The distributed
    port of lu/single._getrf_crout and the structural completion of the
    reference's own lazy panel reduction (conflux_opt.hpp:618-648 already
    reduces only the step column — this variant also COMPUTES only the
    step column).

    Data placement invariants (shared with the other variants):
      * A's frozen panel columns hold L multipliers on (z == 0, owner y)
        and exact zeros on z > 0; its un-factored columns hold raw
        z-partials that are NEVER written (left-looking: no trailing
        traffic at all);
      * F's row block li holds step (li*Px + pi)'s pivot rows for the
        device's local columns — F IS the U cache the big-K GEMMs read;
        it lives on layer z == 0.

    Per step k (Python int — operand K grows with k, so shapes must be
    per-step static):

      step 0 (panel assembly): the panel column's U slab is psum'd over
        'y' from the owner column and all_gather'd over 'x' into global
        step order ([~k*v, v], ~N^2/2 total over the run — the same order
        as one right-looking step-0 reduction stream); each device then
        contributes Lfrozen_local @ Uslab[my column tiles] and ONE
        [mr, v] psum over ('y', 'z') delivers
        colk = sum_z raw - sum_y L@U to every device (z > 0 layers
        contribute their raw partials, layer 0 the correction — the
        2.5D lazy reduction and the left-looking update fused into one
        collective).
      step 1 (pivoting): unchanged machinery; colk is already identical
        on every device, so the owner-column y-broadcast of the winners
        disappears.
      steps 2+3 (pivot rows): the raw psum over ('x','z') (unchanged) now
        carries RAW trailing values; the winners' L history is
        all_gather'd over 'y' ([v, ~k*v]) and each device computes
        Lpiv[my F row blocks] @ F[:, window] — a [v, k*v/Px] x
        [k*v/Px, Nl] GEMM — and one [v, nw] psum over 'x' completes
        U12's correction.
      steps 4+5 (TRSMs) and the F/panel writes: unchanged.
      step 6: none. The trailing matrix is never touched.

    rowpart: rebalance cadence exactly as in the unrolled variant
    (default Px); _rebalance_rows moves z-layer partials and L columns
    with the rows, so the invariants survive compaction.

    CONFLUX_CROUT_FMODE (trace-time env, chip A/B for the SPMD-vs-single
    gap attribution): 'row' writes each finished factor row block with a
    ROW-offset dus into a monolithic F; 'col' carries F transposed
    (COLUMN-offset dus + transposed-contraction reads, schur_dot
    bt=True); 'skip' drops the write entirely (results wrong —
    cost-ablation arm only); 'bands' carries F as a list of
    [v, Nl] row-block values concatenated once at the end — no big-array
    dus exists at all. Measured (r4_experiments.md): row 279.4 / col
    281.4 / bands 278.1 ms at the N=16384 proxy — a TIE, the F carry was
    never the gap (the skip arm's 184.5 ms is XLA DCE-ing the whole U12
    cone once its only consumer disappears, not write cost).

    CONFLUX_CROUT_ABLATE (trace-time env, attribution probes ONLY —
    factors become wrong): 'slab' zeroes the panel-assembly correction
    (drops the step-0 big-K GEMM and the slab collectives), 'corr'
    zeroes the U12 correction (drops the steps-2/3 big-K GEMM and the L
    history gather), 'trsm' skips the U12 solve. Each isolates one
    component of the U12 cone the skip arm measured at ~95 ms.

    FUSED PANEL PATH (Px == 1, round 5 — results/r5_experiments.md): on
    single-column grids the local selection round IS the final
    tournament, so the masked elimination's multiplier panel is reused
    as L10 (no trsm_right_upper recompute), identity gather/reshape
    reorders are elided, and — for f32/f64 storage — the elimination
    FINISHES the pivot lanes (merged=False): the panel write lands the
    winners' merged rows in A before the pivot-row psum and lu00 rides
    back out of `raw` via one [v, v] psum over 'y' (modeled as
    pivot_bcast_y, jaxpr-enforced), eliminating _pivot_factors' per-step
    narrow gather. Measured at the N=16384 1x1x1 'high' proxy:
    273.6 (r4) -> 216.0 ms at the rowpart=4*Px default, vs the 174 ms
    single-chip kernel."""
    import os

    fmode = os.environ.get("CONFLUX_CROUT_FMODE", "row")
    ablate = os.environ.get("CONFLUX_CROUT_ABLATE", "")
    v = desc.v
    Px, Py, Pz = desc.grid.Px, desc.grid.Py, desc.grid.Pz
    Ml, Nl = desc.Ml, desc.Nl
    Nt = desc.Nt
    bf16s = Aloc.dtype == jnp.bfloat16
    gmode = "bf16" if bf16s else precision   # big-K GEMM mode (f32 accum)
    f32 = _compute_dtype(Aloc.dtype)  # f32, or f64 in the x64 mode
    if rowpart is None:
        rowpart = crout_rowpart_default(Px, Nt)

    pi = jax.lax.axis_index("x")
    pj = jax.lax.axis_index("y")
    pz = jax.lax.axis_index("z")

    gri = local_row_to_global(pi, Px, v, Ml)
    gt_col = local_tile_to_global(pj, Py, v, Nl)

    A = Aloc[0]
    F = Floc[0]
    if fmode == "col":
        F = F.T   # [Nl, Ml] carry; every write below is a column dus
    # 'bands': F carried as a Python LIST of [v, Nl] row blocks (block li
    # = this device's step li*Px+pi row), concatenated ONCE at the end —
    # the faithful port of the single-chip crout band list. Measured on
    # the monolithic carry: the per-step F row-block dus costs ~95 ms of
    # the 279 ms N=16384 proxy (fmode=skip ablation, r4_experiments.md)
    # and the transposed carry does NOT recover it — the fix is to never
    # dus a big F at all. Reads become per-block slice+concat (bounded,
    # ~67 MB/step) and the owner-merge a [v, Nl] block where().
    fbands = []
    _fzero = jnp.zeros_like(F[:v])          # vma-correct placeholder

    def _fband(li):
        return fbands[li] if li < len(fbands) else _fzero

    active = jnp.ones_like(A[:, 0], dtype=bool)
    pivots = piv0[0, 0, 0]

    for k in range(Nt):
        mr = A.shape[0]
        lj_k = k // Py
        li_k = k // Px
        c0 = lj_k * v          # static live-window column frontier
        own_y = pj == k % Py
        own_x = pi == k % Px
        nbf = -(-k // Py)      # frozen local column blocks (upper bound;
        #                        boundary tiles >= k pair with zero U rows)
        nmy = -(-k // Px)      # my F row blocks (upper bound; unwritten
        #                        blocks >= k are exact zeros)
        NB = max(nbf * Py, nmy * Px)   # padded global-tile block count

        # -- step 0: left-looking panel assembly -----------------------------
        with jax.named_scope("step0_panel_assembly"):
            if k > 0 and ablate != "slab":
                # U slab of the panel column: owner-y column holds it in F;
                # psum over 'y' (disjoint - exact in bf16 storage), then
                # all_gather over 'x' and reorder to global step order
                # (step r = li*Px + pix sits at [pix, li])
                if fmode == "bands":
                    slab_my = jnp.concatenate(
                        [jax.lax.slice(_fband(li), (0, c0), (v, c0 + v))
                         for li in range(nmy)])
                elif fmode == "col":
                    slab_my = jax.lax.dynamic_slice(
                        F, (c0, 0), (v, nmy * v)).T
                else:
                    slab_my = jax.lax.dynamic_slice(F, (0, c0), (nmy * v, v))
                slab_my = jnp.where(own_y, slab_my, jnp.zeros_like(slab_my))
                slab_my = jax.lax.psum(slab_my, "y")
                if Px == 1 and Py == 1:
                    # 1-column grids: the gather/transpose/take reorder is
                    # an identity — elide its [k*v, v] copies
                    slab_sel = slab_my
                else:
                    slab = jax.lax.all_gather(slab_my, "x")  # [Px, nmy*v, v]
                    slab = slab.reshape(Px, nmy, v, v).transpose(1, 0, 2, 3)
                    slab = slab.reshape(nmy * Px, v, v)
                    if NB > nmy * Px:
                        slab = jnp.concatenate(
                            [slab,
                             jnp.zeros((NB - nmy * Px, v, v), slab.dtype)])
                    # my frozen local columns' global tiles are lj*Py + pj
                    idx = jnp.arange(nbf, dtype=jnp.int32) * Py + pj
                    slab_sel = jnp.take(slab, idx, axis=0).reshape(nbf * v, v)
                Lfro = jax.lax.slice(A, (0, 0), (mr, nbf * v))
                partial = schur_dot(Lfro, slab_sel, gmode)  # [mr, v] f32
                # z > 0 frozen columns are exact zeros; the mask documents it
                partial = jnp.where(pz == 0, partial, 0)
            else:
                partial = jnp.zeros((mr, v), f32)
            rawp = jax.lax.dynamic_slice(A, (0, c0), (mr, v)).astype(f32)
            colk = jax.lax.psum(
                jnp.where(own_y, rawp, 0) - partial, ("y", "z"))

        # -- step 1: pivot selection (colk is identical on EVERY device, so
        #    the winners need no owner-column y-broadcast) --------------------
        # Px == 1 multiplier reuse (round-5 row-path fusion): the local
        # selection round IS the final tournament round, so the masked
        # elimination's multiplier panel M is exactly L10 — the
        # trsm_right_upper recompute below (~2*mr*v^2 FLOPs/step) is pure
        # waste on single-column grids. At Px > 1 the local elimination's
        # winner set differs from the global winners, so the TRSM against
        # the merged U00 is the correct (and necessary) construction.
        fused_panel = Px == 1 and pivoting in ("tournament", "gather")
        # merged=False finishing (f32/f64 storage only): the elimination
        # FINISHES the pivot lanes inside the panel kernel, the panel
        # write lands those merged rows in A BEFORE the pivot-row psum,
        # and lu00 comes back out of `raw` via one tiny [v, v] psum over
        # 'y' — eliminating _pivot_factors' per-step narrow [v]-row
        # gather (~3.5 ms fixed cost, CLAUDE.md gather economics) + its
        # second elimination chain. bf16 STORAGE keeps merged=True: lu00
        # must stay f32 for the TRSMs and a round-trip through bf16 A
        # would round it (CLAUDE.md multiplier-path invariant) — same
        # contract as the single-chip kernel's merged= choice.
        fin = fused_panel and not bf16s
        Mloc = None
        with jax.named_scope("step1_pivot"):
            if fused_panel:
                # block=128: the single-chip crout's measured rank-1 block
                # width at these panel heights (182 vs 193 ms at N=16384,
                # lu/single.py) — the default _BLOCK=64 doubles the
                # per-block dispatch count
                piv_l, ok_l, Mloc, lu00 = factor_panel_raw(colk, active, v,
                                                           block=128,
                                                           merged=not fin)
                win_idx = jnp.where(ok_l, gri[piv_l], -1)
            elif pivoting == "tournament":
                win_idx, lu00 = _tournament(colk, active, gri, v, Px,
                                            "butterfly")
            elif pivoting == "gather":
                win_idx, lu00 = _tournament(colk, active, gri, v, Px,
                                            "gather")
            elif pivoting == "full":
                win_idx, lu00 = _full_pivot(colk, active, gri, v, Px)
            elif pivoting == "none":
                win_idx = k * v + jnp.arange(v, dtype=jnp.int32)
                mine_n, dlr = _find_local_rows(gri, win_idx)
                dcontrib = jnp.where(mine_n[:, None],
                                     jnp.take(colk, dlr, axis=0), 0)
                a00 = jax.lax.psum(jnp.where(own_y, dcontrib, 0),
                                   ("x", "y"))
                lu00 = lu_nopivot(a00)
            else:  # pragma: no cover
                raise ValueError(f"unknown pivoting {pivoting!r}")

        pivots = jax.lax.dynamic_update_slice(pivots, win_idx, (k * v,))
        if fused_panel:
            # the local selection already knows the winners' local rows —
            # no [Ml, v] global-id match matrix needed
            mine, lr = ok_l, piv_l
        else:
            mine, lr = _find_local_rows(gri, win_idx)
        active = active & ~(gri[:, None] == win_idx[None, :]).any(axis=1)

        if fin:
            # moved-up panel write (merged=False finishing): live rows get
            # multipliers, the winners their finished merged rows — which
            # the raw psum below then carries out, so lu00 needs no
            # separate extraction. Dead rows receive stale panel values
            # (garbage), which is safe: every consumer is row-masked and
            # the next rebalance drops dead rows entirely.
            with jax.named_scope("step45_trsm_writes"):
                newpanel = jnp.where((pz == 0) & own_y, Mloc,
                                     jnp.zeros_like(Mloc))
                A = A.at[:, c0 : c0 + v].set(
                    jnp.where(own_y, newpanel.astype(A.dtype),
                              A[:, c0 : c0 + v]))

        # -- steps 2+3: raw pivot rows + their U12 finish ---------------------
        with jax.named_scope("step23_rows"):
            contrib = jnp.where(
                mine[:, None], jnp.take(A, lr, axis=0), 0).astype(f32)
            raw = jax.lax.psum(contrib, ("x", "z"))  # [v, Nl]: L cols + raw
            if fin:
                # the winners' merged rows ride in raw's panel block on
                # the owner column — one [v, v] psum replicates lu00
                # (modeled as pivot_bcast_y in spec.model_comm_volume)
                lu00 = jax.lax.psum(
                    jnp.where(own_y,
                              jax.lax.slice(raw, (0, c0), (v, c0 + v)), 0),
                    "y")

            if k > 0 and ablate != "corr":
                # the winners' L history, global column order: all_gather
                # the local L column slices over 'y' (disjoint - exact)
                Lloc = jax.lax.slice(raw, (0, 0), (v, nbf * v))
                if Px == 1 and Py == 1:
                    # 1-column grids: the gather/reshape/take reorder is an
                    # identity (local order == global order) — elide the
                    # [v, k*v] copies it would materialize
                    Lmy = Lloc
                else:
                    Lg = jax.lax.all_gather(Lloc, "y")  # [Py, v, nbf*v]
                    Lg = Lg.reshape(Py, v, nbf, v).transpose(1, 2, 0, 3)
                    Lg = Lg.reshape(v, nbf * Py * v)
                    if NB > nbf * Py:
                        Lg = jnp.pad(Lg, ((0, 0), (0, (NB - nbf * Py) * v)))
                    idxm = jnp.arange(nmy, dtype=jnp.int32) * Px + pi
                    Lmy = jnp.take(Lg.reshape(v, NB, v), idxm,
                                   axis=1).reshape(v, nmy * v)
                # my U rows for the live window; rows of unwritten steps are
                # zero, columns with gt_col <= k produce junk that the
                # gt_col mask below discards (as in the other variants)
                if fmode == "bands":
                    Fmy = jnp.concatenate(
                        [jax.lax.slice(_fband(li), (0, c0), (v, Nl))
                         for li in range(nmy)])
                    corr = jax.lax.psum(schur_dot(Lmy, Fmy, gmode), "x")
                elif fmode == "col":
                    Ftmy = jax.lax.slice(F, (c0, 0), (Nl, nmy * v))
                    corr = jax.lax.psum(
                        schur_dot(Lmy, Ftmy, gmode, bt=True), "x")
                else:
                    Fmy = jax.lax.slice(F, (0, c0), (nmy * v, Nl))
                    corr = jax.lax.psum(schur_dot(Lmy, Fmy, gmode), "x")
                rhs = raw[:, c0:] - corr
            else:
                rhs = raw[:, c0:]

        # -- steps 4+5: TRSMs and the factor/panel writes ---------------------
        with jax.named_scope("step45_trsm_writes"):
            L00 = unit_lower(lu00)
            U00 = upper(lu00)
            dU = jnp.diagonal(U00)
            U00 = U00 + jnp.diag(jnp.where(dU == 0, 1, 0).astype(U00.dtype))
            Y = (rhs if ablate == "trsm" else
                 trsm_left_lower_unit(L00, rhs, method="invert"))  # [v, nw]

            rowwin = jnp.where(gt_col[None, c0:] > k, Y, raw[:, c0:])
            if not fin:
                # merged=True paths: splice lu00 into the owner's panel
                # block (under `fin` raw already carries it there)
                rowwin = jnp.where(
                    own_y, jax.lax.dynamic_update_slice(rowwin, lu00, (0, 0)),
                    rowwin)
            rownew = jnp.concatenate([raw[:, :c0], rowwin], axis=1)
            r0f = li_k * v
            # emit-once: the pz/own_x masks fold into the single F write
            # (the old separate rowz = where(pz == 0, ...) pass cost one
            # extra [v, Nl] materialization per step)
            wmask = own_x & (pz == 0)
            if fmode == "bands":
                # block-value merge, no big-array dus: non-owner devices
                # keep their prior block (zeros if their own step for this
                # block index is still ahead)
                blk = jnp.where(wmask, rownew.astype(F.dtype), _fband(li_k))
                if li_k < len(fbands):
                    fbands[li_k] = blk
                else:
                    fbands.append(blk)
            elif fmode == "col":
                F = F.at[:, r0f : r0f + v].set(
                    jnp.where(wmask, rownew.T.astype(F.dtype),
                              F[:, r0f : r0f + v]))
            elif fmode == "skip":
                pass   # ablation arm: write cost isolated, factors wrong
            else:
                F = F.at[r0f : r0f + v, :].set(
                    jnp.where(wmask, rownew.astype(F.dtype),
                              F[r0f : r0f + v, :]))

            if not fin:
                if fused_panel:
                    # Px == 1 (bf16s): the elimination's multiplier panel
                    # IS L10 (see step 1) — dead rows masked exactly as
                    # below
                    L10 = jnp.where(active[:, None], Mloc, 0)
                else:
                    L10 = trsm_right_upper(colk, U00, method="invert")
                    L10 = jnp.where(active[:, None], L10, 0)
                newpanel = jnp.where((pz == 0) & own_y, L10,
                                     jnp.zeros_like(L10))
                A = A.at[:, c0 : c0 + v].set(
                    jnp.where(own_y, newpanel.astype(A.dtype),
                              A[:, c0 : c0 + v])
                )

        # row frontier (same cadence semantics as the unrolled variant)
        if rowpart and (k + 1) % rowpart == 0 and k + 1 < Nt:
            Mlp = _row_frontier(desc.M, k + 1, v, Px)
            if Mlp < mr:
                with jax.named_scope("rebalance"):
                    A, active, gri = _rebalance_rows(A, active, gri, desc.M,
                                                     Mlp, Px)

    if fmode == "bands":
        Ntl = Ml // v
        fbands += [_fzero] * (Ntl - len(fbands))
        F = jnp.concatenate(fbands) if fbands else F
    elif fmode == "col":
        F = F.T   # one full transpose back at the end
    if desc.M > desc.N:
        F, pivots = _tall_tail(desc, A, F, active, pivots, pi, pz, gri)
    return F[None], pivots[None, None, None]


def _local_lu_25d_windowed(
    desc: BlockCyclic, pivoting: str, precision: str, windows: int,
    Aloc, Floc, piv0, rowpart: "int | None" = None,
):
    """Windowed variant: steps split into `windows` segments
    (dispatch.segment_bounds), each ONE `fori_loop` body whose live COLUMN
    window [:, c0:] is sliced statically at the segment's first step, and
    whose working ROWS were rebalanced down to the segment's static row
    frontier at its entry (`_rebalance_rows`; rows dying inside a segment
    stay masked until its end). Bounded trace for any Nt with
    near-unrolled trailing-GEMM FLOPs — the scalable analog of the
    reference's shrinking working set (conflux_opt.hpp:535-648)."""
    from conflux_tpu.dispatch import segment_bounds

    v = desc.v
    Px, Py, Pz = desc.grid.Px, desc.grid.Py, desc.grid.Pz
    Ml, Nl = desc.Ml, desc.Nl
    l = desc.nlayr
    kpad = Pz * l - v

    pi = jax.lax.axis_index("x")
    pj = jax.lax.axis_index("y")
    pz = jax.lax.axis_index("z")

    gri = local_row_to_global(pi, Px, v, Ml)
    gt_col = local_tile_to_global(pj, Py, v, Nl)

    A = Aloc[0]
    cdt = _compute_dtype(A.dtype)
    active = jnp.ones_like(A[:, 0], dtype=bool)
    state = (A, Floc[0], active, piv0[0, 0, 0])
    for k_lo, k_hi in segment_bounds(desc.Nt, windows):
        # static frozen-column frontier: local tile col < k_lo//Py is a
        # global tile < k_lo on every device (lj*Py + pj <= (k_lo//Py)*Py - 1)
        c0 = (k_lo // Py) * v
        nw = Nl - c0
        if k_lo > 0 and (rowpart is None or rowpart):
            # static ROW frontier: shed the k_lo*v globally-dead rows at the
            # window boundary (skipped when the tail would not shrink;
            # rowpart=0 disables — rows then stay masked at full height)
            A, F, active, pivots = state
            Mlp = _row_frontier(desc.M, k_lo, v, Px)
            if Mlp < A.shape[0]:
                A, active, gri = _rebalance_rows(A, active, gri, desc.M,
                                                 Mlp, Px)
            state = (A, F, active, pivots)
        mr = state[0].shape[0]

        def step(k, state, c0=c0, nw=nw, gri=gri, mr=mr):
            A, F, active, pivots = state
            k = jnp.asarray(k, jnp.int32)  # x64: fori counters are int64
            lj_k = k // Py
            li_k = k // Px
            own_y = pj == k % Py
            own_x = pi == k % Px

            z0 = jnp.int32(0)  # typed zero (x64 validation mode)
            with jax.named_scope("step0_reduce"):
                colk = jax.lax.psum(
                    jax.lax.dynamic_slice(A, (z0, lj_k * v), (mr, v)).astype(
                        cdt), "z"
                )

            with jax.named_scope("step1_pivot"):
                if pivoting == "tournament":
                    win_idx, lu00 = _tournament(colk, active, gri, v, Px,
                                                "butterfly")
                elif pivoting == "gather":
                    win_idx, lu00 = _tournament(colk, active, gri, v, Px,
                                                "gather")
                elif pivoting == "full":
                    win_idx, lu00 = _full_pivot(colk, active, gri, v, Px)
                elif pivoting == "none":
                    win_idx = k * v + jnp.arange(v, dtype=jnp.int32)
                    # diagonal-tile rows located by global id (any layout)
                    mine_n, dlr = _find_local_rows(gri, win_idx)
                    dcontrib = jnp.where(
                        mine_n[:, None], jnp.take(colk, dlr, axis=0), 0
                    )
                    a00 = jax.lax.psum(jnp.where(own_y, dcontrib, 0),
                                       ("x", "y"))
                    lu00 = lu_nopivot(a00)
                else:  # pragma: no cover
                    raise ValueError(f"unknown pivoting {pivoting!r}")

                if pivoting in ("tournament", "gather", "full"):
                    win_idx = jax.lax.psum(jnp.where(own_y, win_idx, 0), "y")
                    lu00 = jax.lax.psum(jnp.where(own_y, lu00, 0), "y")

            pivots = jax.lax.dynamic_update_slice(pivots, win_idx, (k * v,))
            mine, lr = _find_local_rows(gri, win_idx)
            active = active & ~(gri[:, None] == win_idx[None, :]).any(axis=1)

            with jax.named_scope("step23_rows"):
                contrib = jnp.where(
                    mine[:, None],
                    jnp.take(A, lr, axis=0), 0).astype(cdt)
                raw = jax.lax.psum(contrib, ("x", "z"))  # [v, Nl] pivot rows

            with jax.named_scope("step45_trsm"):
                L00 = unit_lower(lu00)
                U00 = upper(lu00)
                dU = jnp.diagonal(U00)
                U00 = U00 + jnp.diag(
                    jnp.where(dU == 0, 1, 0).astype(U00.dtype))
                # TRSM only the live window; frozen L columns pass through
                Y = trsm_left_lower_unit(L00, raw[:, c0:], method="invert")

                rowwin = jnp.where(gt_col[None, c0:] > k, Y, raw[:, c0:])
                rowwin = jnp.where(
                    own_y,
                    jax.lax.dynamic_update_slice(rowwin, lu00,
                                                 (z0, lj_k * v - c0)),
                    rowwin,
                )
                rownew = jnp.concatenate([raw[:, :c0], rowwin], axis=1)
                rowz = jnp.where(pz == 0, rownew, jnp.zeros_like(rownew))
                curF = jax.lax.dynamic_slice(F, (li_k * v, z0), (v, Nl))
                F = jax.lax.dynamic_update_slice(
                    F, jnp.where(own_x, rowz.astype(F.dtype), curF),
                    (li_k * v, z0)
                )

                L10 = trsm_right_upper(colk, U00, method="invert")
                L10 = jnp.where(active[:, None], L10, 0)
                newpanel = jnp.where((pz == 0) & own_y, L10,
                                     jnp.zeros_like(L10))
                curp = jax.lax.dynamic_slice(A, (z0, lj_k * v), (mr, v))
                A = jax.lax.dynamic_update_slice(
                    A, jnp.where(own_y, newpanel.astype(A.dtype), curp),
                    (z0, lj_k * v)
                )

            with jax.named_scope("step6_update"):
                sl = (pz * l).astype(jnp.int32)
                L10p = jnp.pad(L10, ((0, 0), (0, kpad))) if kpad else L10
                Lk = jax.lax.psum(
                    jnp.where(own_y,
                              jax.lax.dynamic_slice(L10p, (z0, sl), (mr, l)),
                              0),
                    "y",
                )
                Ymask = jnp.where(gt_col[None, c0:] > k, Y, 0)
                Ymaskp = jnp.pad(Ymask, ((0, kpad), (0, 0))) if kpad else Ymask
                Yk = jax.lax.dynamic_slice(Ymaskp, (sl, z0), (l, nw))
                # static column frontier -> the fused Mosaic path applies
                # here too (k itself is dynamic inside the fori body, but
                # c0/Nl are Python ints per window)
                A = _trailing_sub(A, Lk, Yk, c0, Nl, precision, active)
            return A, F, active, pivots

        state = jax.lax.fori_loop(k_lo, k_hi, step, state)

    A, F, active, pivots = state
    if desc.M > desc.N:
        F, pivots = _tall_tail(desc, A, F, active, pivots, pi, pz, gri)
    return F[None], pivots[None, None, None]


@partial(jax.jit, static_argnames=("desc", "pivoting", "precision", "unroll",
                                   "windows", "rowpart"))
def lu_25d(
    G: jax.Array,
    desc: BlockCyclic,
    pivoting: str = "tournament",
    precision: str = "highest",
    unroll: "bool | str | None" = None,
    windows: int = 8,
    rowpart: "int | None" = None,
) -> Tuple[jax.Array, jax.Array]:
    """Distributed LU of a block-cyclic (Pz, Px*Ml, Py*Nl) matrix.

    Returns (F, pivots): F holds the merged LU factors of P·A in the same
    block-cyclic representation (rows in *pivot order* — the reference's
    validation-window layout, conflux_opt.hpp:1660-1696); pivots[s] is the
    original global row at permuted slot s (`pivotIndsBuff`).

    pivoting: 'tournament' (butterfly CALU — the reference algorithm),
    'gather' (single-merge CALU, any Px), 'full' (exact partial pivoting,
    parity oracle), 'none' (EmptyPivot round-robin).
    precision: trailing-GEMM mode ('highest'/'high'/'bf16'); panel math and
    TRSMs stay f32 (BASELINE config 5).
    bf16 STORAGE mode: a bfloat16 G halves every device's HBM footprint —
    local blocks, z-partials, and the factor F are stored bf16 while panel
    factorization, pivot selection, TRSMs, and every z/x reduction run in
    f32 (slices are upcast before each psum; trailing updates accumulate
    f32 on the MXU and round once per step). Same contract and ~2e-5
    normalized-residual plateau as the single-chip mode (lu/single.py
    _getrf_flat bf16s) — the per-chip-memory half of the 2.5D scaling
    story (lu_params.hpp:73) for multi-chip meshes.
    unroll: None auto-selects the rank-program variant
    (dispatch.choose_variant — the measured analog of the reference's
    variant table); True/False force 'unrolled'/'fori'; a variant name
    ('fori'/'unrolled'/'windowed') forces that variant. `windows` sets the
    segment count of the windowed variant.
    rowpart: row-rebalance cadence (_rebalance_rows). unrolled/lookahead:
    steps between rebalances (None = Px, 0 = never); windowed: any truthy
    value or None rebalances at each window boundary, 0 disables. NOTE:
    rebalancing moves rows across 'x', which changes the tournament/gather
    pivot GROUPS — pivots differ from the rowpart=0 run (both are valid
    CALU factorizations; CALU pivots are tree-shape-dependent by
    construction, conflux_opt.hpp:220-336). 'full' and 'none' pivoting are
    layout-independent and stay bit-identical across cadences.
    """
    from conflux_tpu.dispatch import normalize_variant

    variant = normalize_variant(unroll, desc, "lu")
    if desc.M < desc.N:
        raise ConfluxError(ErrorCode.INVALID_SHAPE, "distributed LU requires M >= N (tall or square)")
    if desc.grid.P == 1 and pivoting in ("tournament", "gather", "full"):
        # variant dispatch (the reference keys variants on (P, N) too,
        # Cholesky.cpp:857-921): on a 1x1x1 grid every pivoting strategy
        # degenerates to exact partial pivoting and no collective is needed —
        # run the single-chip kernel, which produces the same pivot-order
        # factor layout (measured faster than the SPMD rank program on one
        # chip: 55 vs 79 ms at N=8192 v=512 bf16x3;
        # results/variant_dispatch.csv)
        from conflux_tpu.lu.single import (_getrf_crout, _getrf_flat,
                                           _getrf_rec, auto_scheme)

        # bf16 STORAGE inputs use the crout kernel (the bf16-STORAGE
        # default: one rounding per stored entry, like lu_factor)
        if G.dtype == jnp.bfloat16:
            kern = _getrf_crout
        else:
            kern = {"recursive": _getrf_rec, "crout": _getrf_crout,
                    "flat": _getrf_flat}[auto_scheme(desc.M)]
        F0, perm = kern(G[0], desc.v, precision)
        return F0[None], perm
    if variant == "windowed":
        body = partial(_local_lu_25d_windowed, desc, pivoting, precision,
                       windows, rowpart=rowpart)
    elif variant == "crout":
        body = partial(_local_lu_25d_crout, desc, pivoting, precision,
                       rowpart=rowpart)
    elif variant == "unrolled":
        body = partial(_local_lu_25d_unrolled, desc, pivoting, precision,
                       rowpart=rowpart)
    elif variant == "lookahead":
        body = partial(
            _local_lu_25d_unrolled, desc, pivoting, precision, lookahead=True,
            rowpart=rowpart,
        )
    else:
        body = partial(_local_lu_25d, desc, pivoting, precision)
    fn = shard_map(
        body,
        mesh=desc.grid.mesh,
        in_specs=(P("z", "x", "y"), P("z", "x", "y"), P("z", "x", "y", None)),
        out_specs=(P("z", "x", "y"), P("z", "x", "y", None)),
    )
    zeros = jnp.zeros(desc.global_shape(), G.dtype)
    piv0 = jnp.zeros(
        (desc.grid.Pz, desc.grid.Px, desc.grid.Py, desc.M), jnp.int32
    )
    F, pivots = fn(G, zeros, piv0)
    return F, pivots[0, 0, 0]


def plu(A, grid, v: int = 128, pivoting: str = "tournament", precision: str = "highest"):
    """Convenience API: dense [N, N] -> (F dense merged LU of PA, perm).

    The distributed analog of `LU_rep` + the miniapp validation assembly
    (examples/conflux_miniapp.cpp:349-507).

    NOTE: when N is not a multiple of the grid tiling, the returned factors
    and pivots describe the identity-PADDED problem (`layout.pad_like(A,
    desc)`), exactly like the reference (lu_params.hpp:67-71): pivoting can
    interleave padding rows, so an LU factorization cannot be cropped back.
    Compute residuals against `pad_like(A, desc)`."""
    desc = BlockCyclic.create(A.shape[0], A.shape[1], v, grid)
    G = distribute(A, desc)
    F, pivots = lu_25d(G, desc, pivoting, precision)
    Fh = undistribute(F, desc)
    return Fh, pivots
