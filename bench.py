"""Driver benchmark: one JSON line on stdout.

Runs the flagship pipeline (single-chip flat in-place blocked LU with
partial pivoting, bf16x3 trailing updates — residual well inside the
reference's 1e-6 gate) on real TPU hardware at N=16384 and reports GFLOP/s
(2N^3/3 over min wall time).

vs_baseline compares against the reference CONFLUX at the same N
(BASELINE.md: LU N=16384, 4x4x1 grid, 16 ranks / 8 Piz Daint nodes,
b=128-512: best mean 1290 ms -> ~2270 GFLOP/s). One TPU chip vs their
16-rank cluster; note the precision difference — the reference runs f64,
this measurement uses bf16x3 (~f32-faithful) trailing updates with f32
panels/TRSMs, the mixed-precision mode BASELINE config 5 targets.
"""

import json
import sys
import time


def main() -> int:
    import jax

    # persistent compile cache: the first run pays the (slow, remote)
    # compile; later runs load the executable in seconds
    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 1)[0] + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from conflux_tpu.lu.single import lu_factor

    n, v = 16384, 512
    rng = np.random.default_rng(42)
    A = jnp.asarray(5.0 + rng.random((n, n), dtype=np.float32), jnp.float32)

    @jax.jit
    def run(A):
        # 'high' (bf16x3) trailing updates: residual ~1e-8..1e-7 at this
        # size — inside the reference's 1e-6 validation gate
        F, perm = lu_factor(A, v=v, precision="high")
        # scalar summary keeps the timed readback to 4 bytes (the result
        # matrix itself would cost seconds over the device tunnel)
        return jnp.sum(F), perm[0]

    s, _ = run(A)
    float(s)  # warm-up + compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        s, _ = run(A)
        float(s)
        times.append(time.perf_counter() - t0)
    t = min(times)
    gflops = (2.0 / 3.0 * n**3) / t / 1e9
    baseline_gflops = 2270.0  # reference f64 on 16 Broadwell ranks
    print(
        json.dumps(
            {
                "metric": f"LU N={n} bf16x3-trailing GFLOP/s (single chip; "
                          f"baseline is the reference's f64 16-rank figure)",
                "value": round(gflops, 1),
                "unit": "GFLOP/s",
                "vs_baseline": round(gflops / baseline_gflops, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
