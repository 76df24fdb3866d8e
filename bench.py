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
TRSMs stay f32; the f32 'highest' mode meets the 1e-6 residual gate at
~20% more time).
"""

import json
import statistics
import sys
import time

N, V, REPS = 32768, 1024, 5


def _measure(n: int, v: int, reps: int) -> list:
    import jax
    import jax.numpy as jnp

    from conflux_tpu.lu.single import lu_factor

    # A is generated ON DEVICE *inside the timed jit*: a 4 GB non-donated
    # argument stays allocated for the whole program (XLA accounts
    # "arguments" separately from temps, and donation only aliases inputs
    # to outputs — the outputs here are scalars), which at N=32768 pushed
    # the peak past the 15.75 GB HBM ceiling. As a temp, A instead dies
    # into step 0's gather-subtract compaction (lu/single.py splice path)
    # and peak HBM stays near ~9 GB. The uniform RNG adds ~1% to the
    # measured time (noted here, accepted for round-comparability).
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
