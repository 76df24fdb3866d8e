"""Cholesky miniapp — CLI parity with examples/cholesky_miniapp.cpp.

Flags mirror the reference (cholesky_miniapp.cpp:67-76): -N/--dim, -v/--tile,
-g/--grid PxxPyxPz, -r/--run; output is the `printTimings` block
(cholesky_miniapp.cpp:34-50) plus the same `_result_` protocol the LU miniapp
uses (library tag `psychol` kept for plot-script compatibility,
results/benchmarks.csv header).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="cholesky_miniapp")
    ap.add_argument("-N", "--dim", type=int, default=4096)
    ap.add_argument("-v", "--tile", type=int, default=0, help="0 = auto heuristic")
    ap.add_argument("-g", "--grid", type=str, default=None, help="PxxPyxPz")
    ap.add_argument("-r", "--run", type=int, default=2, help="repetitions")
    ap.add_argument("--validate", action="store_true")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--force_devices", type=int, default=None)
    ap.add_argument("--profile", action="store_true")
    args = ap.parse_args(argv)

    from conflux_tpu.cli._common import parse_grid, setup_platform, timed_run

    setup_platform(args.platform, args.force_devices)

    from conflux_tpu import profiler
    from conflux_tpu.cholesky.p25d import cholesky_25d
    from conflux_tpu.grid import choose_tile_cholesky, make_grid
    from conflux_tpu.io import spd_matrix
    from conflux_tpu.layout import BlockCyclic, distribute, undistribute
    from conflux_tpu.pgemm import pchol_residual_25d

    if args.profile:
        profiler.enable(True)

    N = args.dim
    grid = make_grid(parse_grid(args.grid), N=N, algorithm="cholesky")
    v = args.tile or choose_tile_cholesky(N, (grid.Px, grid.Py, grid.Pz), grid.P)
    v = min(v, N)

    with profiler.region("init_matrix"):
        A = spd_matrix(N, v=min(v, 256), seed=42)
        desc = BlockCyclic.create(N, N, v, grid)
        G = distribute(A, desc)

    run = lambda g: cholesky_25d(g, desc)
    _, L = timed_run(run, G)  # warm-up (reference: cholesky_miniapp.cpp:105-107)

    times = []
    for rep in range(args.run):
        ms, L = timed_run(run, G)
        times.append(ms)
        print(f"_result_ cholesky,psychol,{N},{N},{grid.P},{grid},"
              f"time,strong,{ms:.3f},{v}")

    # printTimings parity (cholesky_miniapp.cpp:34-50)
    print(f"N={N}, v={v}, grid={grid}, P={grid.P}")
    if times:
        print(f"runs={len(times)} min={min(times):.3f}ms "
              f"mean={sum(times)/len(times):.3f}ms max={max(times):.3f}ms")

    if args.validate:
        # distributed residual on the user's unpadded N (padding masked)
        res = float(pchol_residual_25d(G, L, desc, n_true=N))
        print(f"_result_ cholesky,psychol,{N},{N},{grid.P},{grid},"
              f"residual,strong,{res:.3e},{v}")

    if args.profile:
        # per-substep attribution (reference: PE(reduceA11_reduction) /
        # PE(choleskyA00_compute) / PE(updateA10_*) / PE(computeA11_dgemm)
        # throughout Cholesky.cpp:188-715 + PP(), CholeskyProfiler.h:17-32):
        # one fenced run of the substep-split driver — bit-identical math
        # to the fori rank program; per-substep RATIOS are the signal
        # (each fence pays one dispatch latency, cholesky/profiled.py)
        from conflux_tpu.cholesky.profiled import cholesky_25d_profiled

        cholesky_25d_profiled(G, desc)   # warm-up/compile
        profiler.PC()
        with profiler.region("cholesky_profiled_total"):
            cholesky_25d_profiled(G, desc)
        profiler.PP()
    return 0


if __name__ == "__main__":
    sys.exit(main())
