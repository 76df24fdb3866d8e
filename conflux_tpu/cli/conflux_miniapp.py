"""LU miniapp — CLI parity with examples/conflux_miniapp.cpp.

Flags mirror the reference (conflux_miniapp.cpp:42-84): -M/--rows, -N/--cols,
-b/--block_size, -p/--p_grid PxxPyxPz, -r/--n_rep, -t/--type weak|strong,
-l/--print_limit; plus TPU-era additions (--pivoting, --validate,
--platform/--force_devices for virtual-mesh runs).

Output protocol parity (conflux_miniapp.cpp:156-165): one machine-parsable
line per repetition:
  _result_ lu,conflux-tpu,<N>,<N_base>,<P>,<PxxPyxPz>,time,<type>,<ms>,<v>
"""

from __future__ import annotations

import argparse
import math
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="conflux_miniapp")
    ap.add_argument("-M", "--rows", type=int, default=0)
    ap.add_argument("-N", "--cols", type=int, default=4096)
    ap.add_argument("-b", "--block_size", type=int, default=256)
    ap.add_argument("-p", "--p_grid", type=str, default=None, help="PxxPyxPz")
    ap.add_argument("-r", "--n_rep", type=int, default=2)
    ap.add_argument("-t", "--type", choices=["weak", "strong"], default="strong")
    ap.add_argument("-l", "--print_limit", type=int, default=32,
                    help="print matrices when N <= limit (debug)")
    ap.add_argument("--pivoting", default="tournament",
                    choices=["tournament", "gather", "full", "none"])
    ap.add_argument("--validate", action="store_true",
                    help="compute ||PA-LU||/(N||A||) (reference: "
                         "CONFLUX_WITH_VALIDATION build)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--force_devices", type=int, default=None)
    ap.add_argument("--profile", action="store_true")
    args = ap.parse_args(argv)

    from conflux_tpu.cli._common import parse_grid, setup_platform, timed_run

    setup_platform(args.platform, args.force_devices)

    import jax
    import numpy as np

    from conflux_tpu import profiler
    from conflux_tpu.grid import make_grid
    from conflux_tpu.io import random_matrix
    from conflux_tpu.layout import BlockCyclic, distribute, undistribute
    from conflux_tpu.lu.p25d import lu_25d
    from conflux_tpu.pgemm import plu_residual_25d

    if args.profile:
        profiler.enable(True)

    N = args.cols
    M = args.rows or N
    v = args.block_size
    shape = parse_grid(args.p_grid)
    grid = make_grid(shape, M=M, N=N, algorithm="lu")
    # weak scaling: exactly like the reference (conflux_miniapp.cpp:136-137),
    # -N is the GLOBAL problem and N_base = N/sqrt(P) is derived for the
    # _result_ line; the problem itself is never rescaled
    N_base = N // max(1, math.isqrt(grid.P)) if args.type == "weak" else N

    with profiler.region("init_matrix"):
        A = random_matrix(M, N, seed=42)
        desc = BlockCyclic.create(M, N, v, grid)
        G = distribute(A, desc)

    if N <= args.print_limit:
        print(A)

    run = lambda g: lu_25d(g, desc, args.pivoting)

    # warm-up (compile) + timed repetitions, reference loop shape
    # (conflux_miniapp.cpp:138-167)
    with profiler.region("warmup_compile"):
        _, (F, perm) = timed_run(run, G)
    for rep in range(args.n_rep):
        with profiler.region("lu_rep"):
            ms, (F, perm) = timed_run(run, G)
        print(
            f"_result_ lu,conflux-tpu,{N},{N_base},{grid.P},{grid},"
            f"time,{args.type},{ms:.3f},{v}"
        )

    if args.validate:
        # fully distributed ||PA-LU||/(N||A||) — the in-framework version of
        # the reference's ScaLAPACK validation plane (padding masked)
        res = float(plu_residual_25d(G, F, perm, desc, n_true=N, m_true=M))
        print(f"_result_ lu,conflux-tpu,{N},{N_base},{grid.P},{grid},"
              f"residual,{args.type},{res:.3e},{v}")
        if N <= args.print_limit:
            print(np.asarray(undistribute(F, desc)))

    if args.profile:
        if M == N:
            # per-substep attribution (reference: PE(step0_reduce)... +
            # PP(), src/conflux/lu/profiler.hpp:5-19): one fenced run of
            # the substep-split driver — bit-identical math to the fori
            # rank program; per-substep RATIOS are the signal (each fence
            # pays one dispatch latency, lu/profiled.py docstring)
            from conflux_tpu.lu.profiled import lu_25d_profiled

            lu_25d_profiled(G, desc, args.pivoting)   # warm-up/compile
            profiler.PC()
            with profiler.region("lu_profiled_total"):
                lu_25d_profiled(G, desc, args.pivoting)
        profiler.PP()
    return 0


if __name__ == "__main__":
    sys.exit(main())
