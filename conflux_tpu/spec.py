"""Executable specification: serial numpy simulation of the distributed
algorithms.

Capability parity with the reference's Python prototype layer
(python/conflux.py, python/pivoting.py, python/reference_lu.py): the
distributed tournament LU simulated rank-by-rank in one numpy process, with
per-collective communication-volume counters. The SPMD programs are tested
pivot-for-pivot against this module (tests/test_spec_parity.py), exactly the
role `python/conflux.py` plays for the C++ code.

Communication accounting (the analog of the reference's measureComm,
python/conflux.py:114-119,345-360): every counter is derived from the ACTUAL
shape of the ACTUAL collective the SPMD program issues at that step, under a
bandwidth-optimal ring model:

  psum of E elements over a group of g ranks  -> 2*E*(g-1) total elements
    moved per group (reduce-scatter + all-gather);
  ppermute of E elements                      -> E per (src, dst) pair.

Counters are totals over all ranks; divide by P for the per-rank volume
(`CommVolume.per_rank`). The 2.5D scaling law — per-rank panel traffic
shrinking with the replication factor Pz — is asserted in
tests/test_spec_comm.py.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

from conflux_tpu.layout import butterfly_pair


@dataclasses.dataclass
class CommVolume:
    """Per-collective communication volumes (elements moved, summed over all
    ranks) for one simulated factorization."""

    psum_z: float = 0.0          # step-0 lazy z-reduction of the panel column
    tournament_x: float = 0.0    # butterfly candidate exchange over 'x'
    pivot_bcast_y: float = 0.0   # win_idx + lu00 broadcast over 'y'
    row_gather_xz: float = 0.0   # pivot-row gather psum over ('x','z')
    panel_slice_y: float = 0.0   # per-layer L10 slice broadcast over 'y'
    rebalance_x: float = 0.0     # row-frontier rebalance (cnt psum +
    #                              gri/slab psum_scatter over 'x')
    # crout (left-looking) variant classes (_local_lu_25d_crout): the
    # trailing-update broadcasts disappear; the U history moves instead
    panel_asm_yz: float = 0.0    # fused raw-partials + L@U correction psum
    #                              of the panel column over ('y','z')
    uslab_y: float = 0.0         # panel-column U slab psum over 'y'
    uslab_ag_x: float = 0.0      # panel-column U slab all_gather over 'x'
    lpiv_ag_y: float = 0.0       # winners' L history all_gather over 'y'
    u12_corr_x: float = 0.0      # U12 big-K correction psum over 'x'
    rounds_x: int = 0            # number of butterfly rounds executed

    def total(self) -> float:
        return (self.psum_z + self.tournament_x + self.pivot_bcast_y
                + self.row_gather_xz + self.panel_slice_y
                + self.rebalance_x + self.panel_asm_yz + self.uslab_y
                + self.uslab_ag_x + self.lpiv_ag_y + self.u12_corr_x)

    def per_rank(self, P: int) -> float:
        return self.total() / P


def _ring_psum(E: int, g: int) -> float:
    """Total elements moved by one psum of E elements over g ranks."""
    return 2.0 * E * (g - 1)


def _ring_rs(E: int, g: int) -> float:
    """Total elements moved by one tiled psum_scatter (ring reduce-scatter)
    of a per-rank [E]-element contribution over g ranks: each rank forwards
    g-1 chunks of E/g."""
    return float(E) * (g - 1)


def _ring_ag(E: int, g: int) -> float:
    """Total elements moved by one all_gather of a per-rank [E]-element
    shard over g ranks: each rank receives g-1 foreign shards."""
    return float(E) * (g - 1) * g


def select_pivots_np(panel, active, npiv):
    """Masked partial-pivoting selection — numpy twin of
    ops.panel.select_pivots."""
    M = panel.astype(np.float64).copy()
    m = M.shape[0]
    sel = np.zeros(m, bool)
    piv, ok = [], []
    for j in range(npiv):
        score = np.where(active & ~sel, np.abs(M[:, j]), -np.inf)
        p = int(np.argmax(score))
        piv.append(p)
        ok.append(bool(active[p] and not sel[p]))
        pv = M[p, j] if M[p, j] != 0 else 1.0
        mult = M[:, j] / pv
        elim = active & ~sel
        elim[p] = False
        M[elim, j + 1 :] -= np.outer(mult[elim], M[p, j + 1 :])
        M[elim, j] = mult[elim]
        sel[p] = True
    return np.array(piv), np.array(ok), M[np.array(piv)]


def _merge_np(a_vals, a_idx, b_vals, b_idx, v):
    """Canonical tournament merge — numpy twin of lu.p25d._merge_round."""
    vals = np.concatenate([a_vals, b_vals])
    idx = np.concatenate([a_idx, b_idx])
    piv, ok, lu = select_pivots_np(vals, idx >= 0, v)
    win_vals = np.where(ok[:, None], vals[piv], 0.0)
    win_idx = np.where(ok, idx[piv], -1)
    return win_vals, win_idx, lu


def tournament_np(cands, v: int, Px: int, comm: "CommVolume", replicas: int = 1):
    """Simulate the general-Px log-round butterfly (lu.p25d._tournament with
    mode='butterfly'): receive map `butterfly_pair` (conflux_opt.cpp:59-72),
    lower-ORIGIN list first, self-receive rounds deliver an empty list.

    cands: {pi: (vals [v, v], idx [v])}. Returns (win_idx, lu00) — identical
    on every rank (asserted). `replicas` = how many mesh columns/layers run
    the same exchange (the SPMD program tournaments on every (y, z) copy).
    """
    if Px == 1:
        raise ValueError("tournament needs Px > 1")
    rounds = (Px - 1).bit_length()
    lu00 = {pi: None for pi in range(Px)}
    for r in range(rounds):
        src_of = [butterfly_pair(d, r, Px) for d in range(Px)]
        pairs = [(s, d) for d, s in enumerate(src_of) if s != d]
        from collections import Counter

        cnt = Counter(s for s, _ in pairs)
        E = v * (v + 1)  # vals [v, v] + idx [v]
        for s, d in pairs:
            if cnt[s] == 1:
                comm.tournament_x += E * replicas            # ppermute pair
        for s in {s for s, _ in pairs if cnt[s] > 1}:
            comm.tournament_x += _ring_psum(E, Px) * replicas  # masked psum
        comm.rounds_x += 1
        nxt = {}
        for pi in range(Px):
            s = src_of[pi]
            if s == pi:  # self-receive: empty list
                rv = np.zeros((v, v))
                ri = -np.ones(v, dtype=int)
            else:
                rv, ri = cands[s]
            ov, oi = cands[pi]
            if s > pi:
                a_vals, a_idx, b_vals, b_idx = ov, oi, rv, ri
            else:
                a_vals, a_idx, b_vals, b_idx = rv, ri, ov, oi
            wv, wi, lu = _merge_np(a_vals, a_idx, b_vals, b_idx, v)
            nxt[pi] = (wv, wi)
            lu00[pi] = lu
        cands = nxt
    win0 = cands[0][1]
    for pi in range(1, Px):
        assert np.array_equal(cands[pi][1], win0), (
            "tournament failed to converge to identical winners on all ranks"
        )
        assert np.allclose(lu00[pi], lu00[0]), "merged factors diverge"
    return win0, lu00[0]


def model_cholesky_comm_volume(
    N: int, v: int, Px: int, Py: int = 1, Pz: int = 1,
    variant: str = "rightlook",
) -> dict:
    """Closed-form TOTAL ring volumes (elements moved, summed over all
    devices) of the 2.5D Cholesky rank programs, per collective class —
    the Cholesky sibling of model_comm_volume. The SAME formulas are
    asserted against the traced programs' collectives
    (tests/test_spec_comm.py::test_cholesky_spmd_jaxpr_collectives_closed_form
    and ..._crout_...), so projections at reference-matrix scales carry
    the enforcement. 'rightlook' models the fori schedule (full-Ml
    operands; the unrolled/windowed variants shrink the Ml terms by the
    static frontier). Volume convention: one psum over a group of g
    devices moves 2*E*(g-1) elements (ring all-reduce), an all_gather
    E*(g-1)*g."""
    Nt = N // v
    Ml = N // Px
    l = -(-v // Pz)
    out: dict = {}
    if variant == "crout":
        out = {"slab_xz": 0.0, "col_yz": 0.0, "a00_x": 0.0}
        for k in range(Nt):
            if k:
                out["slab_xz"] += (
                    2.0 * v * (-(-k // Py) * v) * (Px * Pz - 1) * Py)
            out["col_yz"] += (
                2.0 * (Ml - (k // Px) * v) * v * (Py * Pz - 1) * Px)
            out["a00_x"] += 2.0 * v * v * (Px - 1) * Py * Pz
    else:
        out = {
            "reduce_z": Nt * 2.0 * Ml * v * (Pz - 1) * Px * Py,
            "a00_xy": Nt * 2.0 * v * v * (Px * Py - 1) * Pz,
            "slice_y": Nt * 2.0 * Ml * l * (Py - 1) * Px * Pz,
            "panel_ag_x": Nt * float(Ml * l) * (Px - 1) * Px * Py * Pz,
        }
    out["total"] = sum(out.values())
    return out


def model_comm_volume(
    N: int, v: int, Px: int, Pz: int = 1, Py: int = 1,
    rowpart: int = 0, variant: str = "rightlook",
) -> CommVolume:
    """The communication-volume MODEL alone — the same counter arithmetic
    as tournament_lu_np (which is jaxpr-enforced against the SPMD
    programs, tests/test_spec_comm.py) without simulating the
    factorization, so it evaluates in O(Nt) at ANY size. This is what
    projects multi-chip scaling beyond the hardware available here
    (README projected-scaling table): volumes are exact; times depend on
    the interconnect.

    Equality with the simulator's counters is tested
    (tests/test_spec_comm.py::test_model_comm_matches_simulator)."""
    Nt = N // v
    l = -(-v // Pz)
    Ml = N // Px
    Nl = N // Py
    mr = Ml
    comm = CommVolume()
    crout = variant == "crout"
    rounds = (Px - 1).bit_length() if Px > 1 else 0
    # per-round ppermute/psum volume (butterfly_pair receive map)
    per_round = []
    for r in range(rounds):
        from collections import Counter

        src_of = [butterfly_pair(d, r, Px) for d in range(Px)]
        pairs = [(s, d) for d, s in enumerate(src_of) if s != d]
        cnt = Counter(s for s, _ in pairs)
        E = v * (v + 1)
        vol = sum(E for s, _ in pairs if cnt[s] == 1)
        vol += sum(_ring_psum(E, Px)
                   for s in {s for s, _ in pairs if cnt[s] > 1})
        per_round.append(vol)
    for k in range(Nt):
        if crout:
            comm.panel_asm_yz += _ring_psum(mr * v, Py * Pz) * Px
            if k > 0:
                nmy = -(-k // Px)
                comm.uslab_y += _ring_psum(nmy * v * v, Py) * Px * Pz
                comm.uslab_ag_x += _ring_ag(nmy * v * v, Px) * Py * Pz
        else:
            comm.psum_z += _ring_psum(mr * v, Pz) * Px * Py
        if Px > 1:
            comm.tournament_x += sum(per_round) * Py * Pz
            comm.rounds_x += rounds
        if not crout:
            comm.pivot_bcast_y += _ring_psum(v * v + v, Py) * Px * Pz
        elif Px == 1:
            # fused-panel crout: the [v, v] lu00 replication over 'y'
            # (see tournament_lu_np and p25d.py's `fin` path)
            comm.pivot_bcast_y += _ring_psum(v * v, Py) * Px * Pz
        comm.row_gather_xz += _ring_psum(v * Nl, Px * Pz) * Py
        if crout and k > 0:
            nbf = -(-k // Py)
            nw = Nl - (k // Py) * v
            comm.lpiv_ag_y += _ring_ag(v * nbf * v, Py) * Px * Pz
            comm.u12_corr_x += _ring_psum(v * nw, Px) * Py * Pz
        if not crout:
            comm.panel_slice_y += _ring_psum(mr * l, Py) * Px * Pz
        if rowpart and (k + 1) % rowpart == 0 and k + 1 < Nt:
            live = N - (k + 1) * v
            Mlp = max(-(-v // 8) * 8, -(-live // Px // 8) * 8)
            if Mlp < mr:
                mr = Mlp
                if Px > 1:
                    T = Px * Mlp
                    comm.rebalance_x += (
                        _ring_psum(N, Px) + _ring_rs(T, Px)
                        + _ring_rs(T * Nl, Px)
                    ) * Py * Pz
    return comm


def tournament_lu_np(
    A: np.ndarray, v: int, Px: int, Pz: int = 1, Py: int = 1,
    rowpart: int = 0, variant: str = "rightlook",
) -> Tuple[np.ndarray, np.ndarray, CommVolume]:
    """Serial simulation of the distributed tournament-pivoted LU.

    Returns (F merged LU of PA in permuted row order, pivots, comm volume).
    Rows are tile-cyclic over Px virtual device rows; the butterfly uses the
    SPMD program's canonical merge order, so pivot decisions match lu_25d
    exactly (modulo fp ties). Pz and Py only affect the communication model
    (the arithmetic is replicated).

    rowpart > 0 models the unrolled variants' static row frontier: every
    `rowpart` steps the per-device working height shrinks to
    max(ceil8(v), ceil8(live/Px)) via one cnt-psum over 'x' plus
    psum_scatters of the gri vector and the live row slab
    (p25d._rebalance_rows) — accounted in `rebalance_x`; the later panel
    z-reductions and L10 slice broadcasts then move the SHRUNK height.

    variant='crout' switches the communication accounting to the
    left-looking rank program's schedule (_local_lu_25d_crout): the
    step-0 z-reduction becomes the fused ('y','z') panel-assembly psum,
    the U slab moves (psum over 'y' + all_gather over 'x'), the winners'
    L history all_gathers over 'y' and the U12 correction psums over 'x';
    the pivot y-broadcast and the per-layer L10 slice broadcast disappear.
    The arithmetic (and hence pivots/factors) is identical — the variants
    differ only in WHEN each sum is evaluated, not in its value (up to fp
    reassociation, which this f64 simulator does not model).
    """
    N = A.shape[0]
    Nt = N // v
    l = -(-v // Pz)  # nlayr = ceil(v/Pz), lu_params.hpp:73
    Ml = N // Px     # local rows per device row
    Nl = N // Py     # local cols per device column
    mr = Ml          # current per-device working height (row frontier)
    M = A.astype(np.float64).copy()
    active = np.ones(N, bool)
    owner = (np.arange(N) // v) % Px
    pivots_all = []
    F = np.zeros_like(M)
    comm = CommVolume()
    crout = variant == "crout"
    for k in range(Nt):
        colk = M[:, k * v : (k + 1) * v]
        if crout:
            # fused panel assembly: one [mr, v] psum over ('y','z') per
            # device row; the U slab (psum 'y' + all_gather 'x') moves the
            # owner column's [nmy*v, v] F prefix (nmy = ceil(k/Px))
            comm.panel_asm_yz += _ring_psum(mr * v, Py * Pz) * Px
            if k > 0:
                nmy = -(-k // Px)
                comm.uslab_y += _ring_psum(nmy * v * v, Py) * Px * Pz
                comm.uslab_ag_x += _ring_ag(nmy * v * v, Px) * Py * Pz
        else:
            # step 0: lazy z-reduction of the panel column, on every (x, y)
            # column
            comm.psum_z += _ring_psum(mr * v, Pz) * Px * Py
        cands = {}
        for pi in range(Px):
            rows = np.where(owner == pi)[0]
            piv, ok, lu = select_pivots_np(colk[rows], active[rows], v)
            idx = np.where(ok, rows[piv], -1)
            vals = np.where(ok[:, None], colk[rows][piv], 0.0)
            cands[pi] = (vals, idx)
            if Px == 1:
                lu00 = lu
                win = idx
        if Px > 1:
            win, lu00 = tournament_np(cands, v, Px, comm, replicas=Py * Pz)
        if not crout:
            # win_idx + lu00 broadcast over 'y' (psum groups: Px*Pz); the
            # crout variant's colk is already replicated over 'y'
            comm.pivot_bcast_y += _ring_psum(v * v + v, Py) * Px * Pz
        elif Px == 1:
            # fused-panel crout (Px == 1, merged=False finishing): lu00
            # rides the raw psum on the owner column and is replicated by
            # one [v, v] psum over 'y' (p25d.py `fin` path)
            comm.pivot_bcast_y += _ring_psum(v * v, Py) * Px * Pz
        pivots_all.extend(win.tolist())

        L00 = np.tril(lu00[:, :v], -1) + np.eye(v)
        U00 = np.triu(lu00[:, :v])
        dU = np.diag(U00).copy()
        U00[np.diag_indices(v)] = np.where(dU == 0, 1, dU)
        raw = M[win]
        # pivot-row gather: psum of [v, Nl] over ('x','z'), groups: Py
        comm.row_gather_xz += _ring_psum(v * Nl, Px * Pz) * Py
        if crout and k > 0:
            # winners' L history over 'y' + the U12 correction over 'x'
            nbf = -(-k // Py)
            nw = Nl - (k // Py) * v
            comm.lpiv_ag_y += _ring_ag(v * nbf * v, Py) * Px * Pz
            comm.u12_corr_x += _ring_psum(v * nw, Px) * Py * Pz
        Y = np.linalg.solve(L00, raw)
        F[k * v : (k + 1) * v, : k * v] = raw[:, : k * v]
        F[k * v : (k + 1) * v, k * v : (k + 1) * v] = lu00[:, :v]
        F[k * v : (k + 1) * v, (k + 1) * v :] = Y[:, (k + 1) * v :]
        active[win] = False
        L10 = colk @ np.linalg.inv(U00)
        if not crout:
            # per-layer L10 slice broadcast: psum of [mr, l] over 'y',
            # groups: Px*Pz (the reference's Iscatterv over jk_comm).
            # The crout variant has NO trailing update to broadcast for.
            comm.panel_slice_y += _ring_psum(mr * l, Py) * Px * Pz
        rest = slice((k + 1) * v, N)
        M[active, rest] -= L10[active] @ Y[:, rest]
        M[active, k * v : (k + 1) * v] = L10[active]
        # row-frontier rebalance (p25d._rebalance_rows, unrolled variants)
        if rowpart and (k + 1) % rowpart == 0 and k + 1 < Nt:
            live = N - (k + 1) * v
            Mlp = max(-(-v // 8) * 8, -(-live // Px // 8) * 8)
            if Mlp < mr:
                mr = Mlp
                if Px > 1:
                    T = Px * Mlp
                    # cnt psum over 'x' ([N] int, every (y,z) replica) +
                    # psum_scatter of gri [T] and the [T, Nl] contribution
                    comm.rebalance_x += (
                        _ring_psum(N, Px)
                        + _ring_rs(T, Px)
                        + _ring_rs(T * Nl, Px)
                    ) * Py * Pz
    return F, np.array(pivots_all), comm
