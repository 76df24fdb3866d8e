"""Executable specification: serial numpy simulation of the distributed
algorithms.

Capability parity with the reference's Python prototype layer
(python/conflux.py, python/pivoting.py, python/reference_lu.py): the
distributed tournament LU simulated rank-by-rank in one numpy process, with
per-rank communication-volume counters. The SPMD programs are tested
pivot-for-pivot against this module (tests/test_spec_parity.py), exactly the
role `python/conflux.py` plays for the C++ code.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import numpy as np


@dataclasses.dataclass
class CommVolume:
    """Per-collective communication-volume counters (elements moved), the
    analog of the reference's measureComm machinery (python/conflux.py:
    114-119,345-360)."""

    psum_z: int = 0
    tournament_x: int = 0
    bcast_y: int = 0
    row_gather_xz: int = 0

    def total(self) -> int:
        return self.psum_z + self.tournament_x + self.bcast_y + self.row_gather_xz


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


def tournament_lu_np(
    A: np.ndarray, v: int, Px: int, Pz: int = 1
) -> Tuple[np.ndarray, np.ndarray, CommVolume]:
    """Serial simulation of the distributed tournament-pivoted LU.

    Returns (F merged LU of PA in permuted row order, pivots, comm volume).
    Rows are tile-cyclic over Px virtual device rows; the butterfly uses the
    SPMD program's canonical merge order, so pivot decisions match lu_25d
    exactly (modulo fp ties). Pz only affects the communication model.
    """
    N = A.shape[0]
    Nt = N // v
    M = A.astype(np.float64).copy()
    active = np.ones(N, bool)
    owner = (np.arange(N) // v) % Px
    pivots_all = []
    F = np.zeros_like(M)
    comm = CommVolume()
    for k in range(Nt):
        colk = M[:, k * v : (k + 1) * v]
        comm.psum_z += (Pz - 1) * (N // max(Px, 1)) * v
        cands: Dict[int, tuple] = {}
        for pi in range(Px):
            rows = np.where(owner == pi)[0]
            piv, ok, _ = select_pivots_np(colk[rows], active[rows], v)
            idx = np.where(ok, rows[piv], -1)
            vals = np.where(ok[:, None], colk[rows][piv], 0.0)
            cands[pi] = (vals, idx)
        lu00 = None
        if Px == 1:
            piv, ok, lu00 = select_pivots_np(colk, active, v)
            win = np.where(ok, piv, -1)
        else:
            rounds = Px.bit_length() - 1
            for r in range(rounds):
                comm.tournament_x += Px * v * (v + 1)
                nxt = {}
                for pi in range(Px):
                    partner = pi ^ (1 << r)
                    mine, theirs = cands[pi], cands[partner]
                    a, b = (mine, theirs) if (pi & (1 << r)) == 0 else (theirs, mine)
                    vals = np.concatenate([a[0], b[0]])
                    idx = np.concatenate([a[1], b[1]])
                    piv, ok, lu = select_pivots_np(vals, idx >= 0, v)
                    nxt[pi] = (
                        np.where(ok[:, None], vals[piv], 0.0),
                        np.where(ok, idx[piv], -1),
                    )
                    if pi == 0:
                        lu00 = lu
                cands = nxt
            win = cands[0][1]
        comm.bcast_y += v * v
        pivots_all.extend(win.tolist())

        L00 = np.tril(lu00[:, :v], -1) + np.eye(v)
        U00 = np.triu(lu00[:, :v])
        dU = np.diag(U00).copy()
        U00[np.diag_indices(v)] = np.where(dU == 0, 1, dU)
        raw = M[win]
        comm.row_gather_xz += v * N
        Y = np.linalg.solve(L00, raw)
        # output block row in permuted order
        F[k * v : (k + 1) * v, : k * v] = raw[:, : k * v]
        F[k * v : (k + 1) * v, k * v : (k + 1) * v] = lu00[:, :v]
        F[k * v : (k + 1) * v, (k + 1) * v :] = Y[:, (k + 1) * v :]
        active[win] = False
        L10 = colk @ np.linalg.inv(U00)
        comm.bcast_y += (N // max(Px, 1)) * v
        rest = slice((k + 1) * v, N)
        M[active, rest] -= L10[active] @ Y[:, rest]
        M[active, k * v : (k + 1) * v] = L10[active]
    return F, np.array(pivots_all), comm
