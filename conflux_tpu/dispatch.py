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

`choose_variant` encodes the measured rule (v5e 2026-08-17,
experiments/prof_dispatch.py -> results/variant_dispatch.csv):
  cholesky: unrolled wins at every measured (N, v) with Nt <= 256
    (N=8192 v=512: 42 vs 79 ms fori; N=16384 v=512: 108 vs 424 ms);
  lu: unrolled wins from N >= 8192 (78 vs 99 ms fori at v=512; 333 vs
    484 ms at N=16384) but loses at N=4096 (45 vs 39 ms fori — per-step
    slice overhead dominates tiny problems);
  lookahead ties unrolled on ONE chip (cholesky 42.3/111.6 ms, lu
    372 ms at 16384 — the split GEMM is pure overhead without real
    collectives to hide); it exists for multi-chip meshes, where the
    freed collective/GEMM pairs are proven independent
    (tests/test_overlap_dep.py);
  beyond Nt = 256 steps the unrolled trace/compile cost explodes — the
  windowed variant takes over there (bounded trace, near-unrolled FLOPs).
"""

from __future__ import annotations

from typing import List, Tuple

VARIANTS = ("fori", "unrolled", "windowed", "lookahead")


def choose_variant(desc, algorithm: str = "cholesky") -> str:
    """Pick the rank-program variant for a problem descriptor."""
    if desc.Nt > 256:
        return "windowed"
    if algorithm == "lu" and desc.N < 8192:
        return "fori"
    return "unrolled"


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
