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

`choose_variant` encodes the measured rule (v5e 2026-08-19, K-amortized
chained timing — experiments/prof_dispatch2.py, which cancels the ~24 ms
tunnel dispatch latency that made the first sweep's N=4096 rows noise ->
results/variant_dispatch.csv):
  lu: WINDOWED wins from N >= 4096 — it carries the per-window row-
    frontier rebalance (the first_non_pivot_row analog), so its panel
    heights and trailing GEMMs shrink while fori/unrolled mask dead rows
    forever (amortized N=4096 v=256: 3.0 ms windowed vs 15.8 fori /
    19.7 unrolled; N=16384 v=512 single-shot: 190 ms — parity with the
    single-chip flat kernel — vs 333 unrolled, prof_spmd_windows);
    below that the fixed rebalance gathers dominate tiny problems (fori).
  cholesky: no pivoting -> no row frontier, so windowed only pays its
    window bookkeeping (41 vs 17.5 ms unrolled at N=8192): LOOKAHEAD/
    unrolled win — lookahead edges out unrolled at every amortized size
    (4.45 vs 5.59 ms at 4096 v=256, 17.9 vs 17.5 at 8192 — a tie there)
    and its split trailing update is what multi-chip meshes want anyway
    (the freed collective/GEMM pairs are proven independent,
    tests/test_overlap_dep.py); unrolled from N >= 8192 (tie, fewer
    moving parts).
  beyond Nt = 256 steps the unrolled/lookahead trace/compile cost
  explodes — the windowed variant takes over for both algorithms
  (bounded trace, near-unrolled FLOPs).
"""

from __future__ import annotations

from typing import List, Tuple

VARIANTS = ("fori", "unrolled", "windowed", "lookahead", "crout")


def choose_variant(desc, algorithm: str = "cholesky") -> str:
    """Pick the rank-program variant for a problem descriptor."""
    if desc.Nt > 256:
        return "windowed"
    if algorithm == "lu":
        return "fori" if desc.N < 4096 else "windowed"
    return "lookahead" if desc.N < 8192 else "unrolled"


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
