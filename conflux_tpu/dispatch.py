"""Rank-program variant dispatch — the analog of the reference's
(P, N)-keyed `parallelCholesky` variant table
(src/conflux/cholesky/Cholesky.cpp:857-921).

Three variants of each distributed factorization exist:

  * 'fori'     — one `lax.fori_loop` body for all Nt steps: bounded trace,
                 but every trailing update is a masked FULL-SIZE GEMM
                 (~3x the true FLOPs summed over steps).
  * 'unrolled' — `k` is a Python int: every step slices its exact
                 statically-shrinking live window (minimal FLOPs, maximal
                 scheduler freedom), but trace size grows with Nt — remote
                 compile time explodes past a few hundred steps.
  * 'windowed' — the middle ground: the step range is split into `windows`
                 segments; each segment is ONE fori body whose live window
                 is sliced statically at the segment's first step. Trace
                 size is bounded by `windows` bodies while the summed GEMM
                 FLOPs approach the unrolled variant's (within ~(1 + 1/W)x
                 for W windows on the column frontier).
  * 'lookahead' — unrolled + split trailing updates: the next step's panel
                 column is updated and z-reduced by a small GEMM before the
                 bulk of the window, making the next step's selection
                 collectives independent of the bulk GEMM so XLA's
                 latency-hiding scheduler can overlap them — the
                 dependence-structure form of the reference's
                 `updateComputeA10` comm/compute overlap
                 (Cholesky.cpp:380-564).

`choose_variant` encodes the measured rule (v5e 2026-08-20, regenerated
under the K-amortized protocol for N <= 8192 and single-shot above —
experiments/prof_dispatch2.py + prof_dispatch2_crout_addon.py; every
number below is a row in results/variant_dispatch.csv):
  lu: fori for small N (4096 v=512: 14.1 ms vs 18.2 windowed; at v=256
    windowed already edges it, 11.9 vs 15.3 — the rule keys on N only
    and takes the tie); WINDOWED from N >= 8192 — the per-window
    row-frontier rebalance (the first_non_pivot_row analog) shrinks
    panels and trailing GEMMs while fori/unrolled mask dead rows forever
    (8192 v=512: 55.8 ms vs 71.4 fori / 77.2 unrolled; v=256: 65.4 vs
    103.6 / 112.4). The crout (left-looking) LU rank program loses at
    these sizes (8192 v=512: 81.5 ms — its U12-finish GEMMs are narrow
    at small v) and beats windowed from N=16384 v=1024 (216.0 ms vs 281,
    results/variant_dispatch.csv) — but only its COMPUTE side: the crout
    schedule moves 1.8-4.8x the rightlook comm volume on real grids
    (spec.model_comm_volume, enforced), so `_lu_crout_grid_ok` admits it
    only on essentially-premium-free grids (P=1 today).
  cholesky: CROUT from N >= 8192 — no pivot rows and no U history, so
    the left-looking column assembly beats every right-looking variant
    on both compute shape and collectives (8192 v=512: 12.5 ms vs 16.3
    lookahead / 17.3 unrolled, v=256: 9.8 vs 18.4; 16384 v=512
    single-shot: 76.3 ms vs 102.0 unrolled / 106.5 lookahead — 19.2
    TF/s; the comm model also makes it strictly cheaper at every mesh
    scale, README projection table); LOOKAHEAD below (4096 v=256:
    3.6 ms, v=512: 3.7 — crout 4.7/3.8 — and its split trailing update
    keeps the proven-independent collective/GEMM pairs,
    tests/test_overlap_dep.py).
  beyond Nt = 256 steps the unrolled/lookahead trace/compile cost
  explodes — the windowed variant takes over for LU (bounded trace,
  near-unrolled FLOPs); cholesky crout's trace grows with Nt too, so
  past 256 steps cholesky also falls back to windowed.
"""

from __future__ import annotations

from typing import List, Tuple

VARIANTS = ("fori", "unrolled", "windowed", "lookahead", "crout")

# Max modeled comm premium (crout total volume / rightlook total volume,
# spec.model_comm_volume — the jaxpr-ENFORCED counters) the LU crout
# variant is allowed before the dispatch falls back to windowed: the
# measured compute win of the left-looking program (216.0 ms vs 281
# windowed at the N=16384 1-device proxy after the round-5 row-path
# fusions, results/variant_dispatch.csv) is a per-chip effect
# while the modeled premium is large on real grids (1.83x at 2x2x1,
# 2.9x at 8x8x1, 4.1x at 16x16x1 for N=16384 v=1024 — the README
# projection table), so only essentially-premium-free grids qualify.
LU_CROUT_COMM_PREMIUM = 1.2

# Trace-size ceiling (steps) past which every Python-unrolled variant
# (unrolled / lookahead / crout) is replaced by the windowed fallback:
# remote compile time explodes beyond a few hundred unrolled step bodies
# (compile-helper kills observed at ~Nt >= 512, CLAUDE.md). Per-algorithm
# constants: LU step bodies are ~2x the Cholesky ones (pivot machinery),
# but both fit comfortably at 256 (Nt=128 windowed compile-proven,
# tests/test_lu_dist.py:248), so the measured ceiling is shared today.
MAX_UNROLLED_STEPS = {"lu": 256, "cholesky": 256}


def _lu_crout_grid_ok(desc) -> bool:
    """Grid gate for the LU crout variant: modeled comm premium vs the
    right-looking schedule stays under LU_CROUT_COMM_PREMIUM (P == 1 is
    premium-free by definition — no collective moves any bytes)."""
    g = desc.grid
    if g.P == 1:
        return True
    from conflux_tpu.spec import model_comm_volume

    c = model_comm_volume(desc.N, desc.v, g.Px, Pz=g.Pz, Py=g.Py,
                          variant="crout").total()
    r = model_comm_volume(desc.N, desc.v, g.Px, Pz=g.Pz, Py=g.Py,
                          variant="rightlook").total()
    return c <= LU_CROUT_COMM_PREMIUM * r


def choose_variant(desc, algorithm: str = "cholesky") -> str:
    """Pick the rank-program variant for a problem descriptor — keyed on
    BOTH the problem size and the grid, like the reference's (P, N) table
    (Cholesky.cpp:857-921): the grid enters through the enforced comm
    model (`_lu_crout_grid_ok`), not a hand-tuned rank list."""
    if desc.Nt > MAX_UNROLLED_STEPS[algorithm]:
        return "windowed"
    if algorithm == "lu":
        if desc.N < 8192:
            return "fori"
        if desc.N >= 16384 and _lu_crout_grid_ok(desc):
            return "crout"
        return "windowed"
    # cholesky: crout is comm-cheaper than every right-looking variant at
    # EVERY modeled grid (model_cholesky_comm_volume, README projection
    # table) — no grid gate needed
    return "lookahead" if desc.N < 8192 else "crout"


def normalize_variant(unroll, desc, algorithm: str) -> str:
    """Map the public `unroll` argument (None | bool | variant name) to a
    variant name.  None auto-selects; the bools keep the round-1 API."""
    if unroll is None:
        return choose_variant(desc, algorithm)
    if unroll is True:
        return "unrolled"
    if unroll is False:
        return "fori"
    if unroll in VARIANTS:
        return unroll
    raise ValueError(f"unknown variant {unroll!r}; expected None, bool or one of {VARIANTS}")


def segment_bounds(Nt: int, windows: int) -> List[Tuple[int, int]]:
    """Split steps [0, Nt) into <= `windows` contiguous segments of
    near-equal size: the static window frontiers of the windowed variant."""
    w = max(1, min(windows, Nt))
    chunk = -(-Nt // w)  # ceil
    return [(lo, min(lo + chunk, Nt)) for lo in range(0, Nt, chunk)]
