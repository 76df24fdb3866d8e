"""Executable-spec parity: a pure-numpy simulator of the distributed
tournament-pivoted LU must agree pivot-for-pivot with the shard_map SPMD
program.

This mirrors the role of the reference's Python rank simulator
(python/conflux.py + python/pivoting.py TournPivot): same candidate
selection, same butterfly reduction tree with the same canonical merge
order, simulated serially in numpy.  Residual tests check "some valid
factorization"; this checks the *pivot decisions* themselves.
"""

import numpy as np
import pytest

from conflux_tpu.grid import make_grid
from conflux_tpu.layout import BlockCyclic, distribute
from conflux_tpu.lu.p25d import lu_25d


def np_select(panel, active, npiv):
    """Masked partial-pivoting selection (numpy twin of ops.panel.select_pivots)."""
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


def np_tournament_lu(A, v, Px):
    """Serial simulation of the distributed tournament LU's pivot decisions.

    Rows are tile-cyclic over Px virtual device rows; each step runs local
    selection per device row, then the canonical-order butterfly."""
    N = A.shape[0]
    Nt = N // v
    M = A.astype(np.float64).copy()
    active = np.ones(N, bool)
    gtile = np.arange(N) // v
    owner = gtile % Px
    pivots_all = []
    for k in range(Nt):
        colk = M[:, k * v : (k + 1) * v]
        cands = {}
        for pi in range(Px):
            rows = np.where(owner == pi)[0]
            piv, ok, _ = np_select(colk[rows], active[rows], v)
            idx = np.where(ok, rows[piv], -1)
            vals = np.where(ok[:, None], colk[rows][piv], 0.0)
            cands[pi] = (vals, idx)
        rounds = Px.bit_length() - 1
        lu00 = None
        for r in range(rounds):
            nxt = {}
            for pi in range(Px):
                partner = pi ^ (1 << r)
                mine, theirs = cands[pi], cands[partner]
                a, b = (mine, theirs) if (pi & (1 << r)) == 0 else (theirs, mine)
                vals = np.concatenate([a[0], b[0]])
                idx = np.concatenate([a[1], b[1]])
                piv, ok, lu = np_select(vals, idx >= 0, v)
                nxt[pi] = (
                    np.where(ok[:, None], vals[piv], 0.0),
                    np.where(ok, idx[piv], -1),
                )
                if pi == 0:
                    lu00 = lu
            cands = nxt
        if Px == 1:
            rows = np.arange(N)
            piv, ok, lu00 = np_select(colk, active, v)
            win = np.where(ok, piv, -1)
        else:
            win = cands[0][1]
        pivots_all.extend(win.tolist())
        # factor update (same math as the SPMD program's steps 4-6)
        L00 = np.tril(lu00[:, :v], -1) + np.eye(v)
        U00 = np.triu(lu00[:, :v])
        U00[np.diag_indices(v)] = np.where(np.diag(U00) == 0, 1, np.diag(U00))
        raw = M[win]
        Y = np.linalg.solve(L00, raw)
        active[win] = False
        L10 = colk @ np.linalg.inv(U00)
        rest = slice((k + 1) * v, N)
        M[active, rest] -= L10[active] @ Y[:, rest]
        M[active, k * v : (k + 1) * v] = L10[active]
    return np.array(pivots_all)


@pytest.mark.parametrize("shape,n,v", [((2, 2, 1), 64, 8), ((4, 2, 1), 64, 8),
                                       ((2, 2, 2), 64, 8)])
def test_tournament_pivots_match_numpy_spec(rng, shape, n, v):
    grid = make_grid(shape)
    A = rng.standard_normal((n, n)).astype(np.float32)
    desc = BlockCyclic.create(n, n, v, grid)
    _, perm = lu_25d(distribute(A, desc), desc, "tournament")
    expect = np_tournament_lu(A, v, grid.Px)
    np.testing.assert_array_equal(np.asarray(perm), expect)
