"""Driver benchmark: one JSON line on stdout.

Runs the flagship pipeline (single-chip blocked LU with partial pivoting —
auto scheme: crout left-looking at this size — bf16x3 update GEMMs) on real
TPU hardware at a FIXED size
N=32768 and reports GFLOP/s (2N^3/3 over the median wall time of 5 reps).
The size never changes silently: a failed compile is retried once (the
remote compile helper is occasionally flaky on large programs, see
CLAUDE.md) and then allowed to fail loudly, so BENCH_r{N}.json files stay
round-comparable. Median-of-5 with the min/max spread recorded guards
against the documented HBM-pressure run-to-run variance of this backend.

vs_baseline compares against the reference CONFLUX at N=16384
(BASELINE.md: LU N=16384, 4x4x1 grid, 16 ranks / 8 Piz Daint nodes,
b=128-512: best mean 1290 ms -> ~2270 GFLOP/s). One TPU chip vs their
16-rank cluster; note the precision difference — the reference runs f64,
this measurement uses bf16x3 trailing updates (panels, pivot selection and
TRSMs stay f32) — and the measured configuration itself meets the 1e-6
residual gate: full in-jit blocked ||PA-LU||/(N||A||) = 1.2e-8 at N=32768
'high' (experiments/prof_r3i.py; 3.0e-11 at 'highest').
"""

import json
import statistics
import sys
import time

# v=1536 is the measured headline tile (crout + two-level TRSM sweep,
# experiments/prof_r3g/r3i/r3k: 888.1 ms vs 943 at v=1024 / 894.2 at
# v=2048); the full in-jit blocked residual of this exact config is
# 1.217e-08 at 'high' (prof_r3i) — under the 1e-6 gate
N, V, REPS = 32768, 1536, 5


def _measure(n: int, v: int, reps: int) -> list:
    import jax
    import jax.numpy as jnp

    from conflux_tpu.lu.single import lu_factor

    # A is generated ON DEVICE *inside the timed jit*. The reference times
    # only LU_rep (InitMatrix is outside the repetition timer,
    # conflux_miniapp.cpp:138-167), but that protocol is unreachable here:
    # a 4 GB argument stays allocated for the whole program (XLA accounts
    # arguments separately from temps), and donating it is useless — the
    # outputs are scalars, and donation only aliases inputs to OUTPUTS
    # (re-verified 2026-08-19: the donated-arg variant peaks at 17.28 GB
    # and OOMs, /tmp/bench_protocol.log). As an in-jit temp, A instead
    # dies into the first compaction gather and peak HBM stays ~9 GB. The
    # uniform fill costs ~22 ms of the measured time (device trace,
    # /tmp/jaxtrace_crout) — ~2.5% charged AGAINST this framework relative
    # to the reference's protocol; accepted for round-comparability.
    @jax.jit
    def run(key):
        A = 5.0 + jax.random.uniform(key, (n, n), jnp.float32)
        F, perm = lu_factor(A, v=v, precision="high")
        # scalar summary keeps the timed readback to 4 bytes (the result
        # matrix itself would cost seconds over the device tunnel)
        return jnp.sum(F), perm[0]

    key = jax.random.key(42)

    def one():
        t0 = time.perf_counter()
        s, _ = run(key)
        float(s)
        return time.perf_counter() - t0

    one()  # warm-up + compile
    return [one() for _ in range(reps)]


def main() -> int:
    import jax

    # persistent compile cache: the first run pays the (slow, remote)
    # compile; later runs load the executable in seconds
    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 1)[0] + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    try:
        times = _measure(N, V, REPS)
    except Exception as e:  # one retry for the flaky remote compile helper,
        # with the Mosaic trailing path disabled in case IT is what the
        # helper rejects (same N either way — sizes never change silently)
        print(f"bench: first attempt failed ({e!r}); retrying once "
              f"with CONFLUX_NO_PALLAS_TRAILING=1", file=sys.stderr)
        import os

        os.environ["CONFLUX_NO_PALLAS_TRAILING"] = "1"
        jax.clear_caches()
        times = _measure(N, V, REPS)
    med = statistics.median(times)
    gflops = (2.0 / 3.0 * N**3) / med / 1e9
    baseline_gflops = 2270.0  # reference f64 on 16 Broadwell ranks, N=16384
    print(
        json.dumps(
            {
                "metric": f"LU N={N} bf16x3-trailing GFLOP/s (single chip, "
                          f"median of {REPS}; baseline is the reference's "
                          f"f64 16-rank figure)",
                "value": round(gflops, 1),
                "unit": "GFLOP/s",
                "vs_baseline": round(gflops / baseline_gflops, 3),
                "median_s": round(med, 4),
                "spread_s": [round(min(times), 4), round(max(times), 4)],
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
