"""Benchmark harness: strong/weak scaling sweeps + benchmarks.csv writer.

Reproduces the reference's experiment pipeline (SURVEY.md §6): the SLURM
launch generators (scripts/generate_launch_files*.py) become a sweep driver,
and results accumulate in the same CSV schema as results/benchmarks.csv:

    algorithm,library,N,N_base,P,grid,unit,type,value,blocksize,chol_vers

so the reference's R plotting scripts would ingest our numbers unchanged.
"""

from __future__ import annotations

import csv
import dataclasses
import os
from typing import Iterable, List, Optional

import jax
import jax.numpy as jnp

CSV_HEADER = [
    "algorithm", "library", "N", "N_base", "P", "grid", "unit", "type",
    "value", "blocksize", "chol_vers",
]


@dataclasses.dataclass
class Result:
    algorithm: str
    library: str
    N: int
    N_base: int
    P: int
    grid: str
    unit: str
    type: str
    value: float
    blocksize: int
    chol_vers: str = ""

    def row(self) -> List[str]:
        return [str(getattr(self, k)) for k in CSV_HEADER]


def append_results(path: str, results: Iterable[Result]) -> None:
    new = not os.path.exists(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a", newline="") as f:
        w = csv.writer(f)
        if new:
            w.writerow(CSV_HEADER)
        for r in results:
            w.writerow(r.row())


def _timed(fn, *args, reps: int = 3) -> List[float]:
    """Wall times (ms): shared timing protocol (conflux_tpu.timing)."""
    from conflux_tpu.timing import timed_reps

    times, _ = timed_reps(fn, *args, reps=reps)
    return times


def bench_lu_single(
    sizes: Iterable[int] = (2048, 4096, 8192),
    v: int = 512,
    precision: str = "highest",
    reps: int = 3,
    csv_path: Optional[str] = None,
) -> List[Result]:
    """Single-chip strong-scaling-in-N sweep of the flagship LU."""
    import numpy as np

    from conflux_tpu.io import random_matrix
    from conflux_tpu.lu.single import lu_factor

    results = []
    for n in sizes:
        A = jnp.asarray(random_matrix(n, n, seed=42))
        fn = jax.jit(lambda a, vv=min(v, n): lu_factor(a, v=vv, precision=precision))
        for ms in _timed(fn, A, reps=reps):
            results.append(
                Result("lu", "conflux-tpu", n, n, 1, "1x1x1", "time",
                       "strong", round(ms, 3), min(v, n), precision)
            )
    if csv_path:
        append_results(csv_path, results)
    return results


def bench_distributed(
    algorithm: str,
    grid,
    sizes: Iterable[int],
    v: int = 256,
    precision: str = "highest",
    pivoting: str = "tournament",
    scaling: str = "strong",
    reps: int = 3,
    csv_path: Optional[str] = None,
) -> List[Result]:
    """Strong or weak scaling sweep of the distributed factorizations on the
    given Grid (virtual CPU meshes work; pass `type` parity via `scaling`)."""
    from conflux_tpu.cholesky.p25d import cholesky_25d
    from conflux_tpu.io import random_matrix, spd_matrix
    from conflux_tpu.layout import BlockCyclic, distribute
    from conflux_tpu.lu.p25d import lu_25d

    results = []
    for n_base in sizes:
        n = n_base
        if scaling == "weak":
            n = n_base * max(1, int(round((grid.Px * grid.Py) ** 0.5)))
        vv = min(v, n)  # v need not divide Pz (nlayr = ceil(v/Pz))
        desc = BlockCyclic.create(n, n, vv, grid)
        if algorithm == "lu":
            A = random_matrix(n, n, seed=42)
            G = distribute(A, desc)
            fn = jax.jit(
                lambda g: lu_25d(g, desc, pivoting, precision),
                static_argnums=(),
            )
            lib = "conflux-tpu"
        else:
            A = spd_matrix(n, v=min(vv, 256), seed=42)
            G = distribute(A, desc)
            fn = jax.jit(lambda g: cholesky_25d(g, desc, precision))
            lib = "psychol"
        for ms in _timed(fn, G, reps=reps):
            results.append(
                Result(algorithm, lib, n, n_base, grid.P, str(grid), "time",
                       scaling, round(ms, 3), vv, precision)
            )
    if csv_path:
        append_results(csv_path, results)
    return results
