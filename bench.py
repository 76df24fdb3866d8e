"""Driver benchmark: one JSON line on stdout.

Runs the flagship pipeline (single-chip blocked LU with partial pivoting) on
real TPU hardware at N=8192 and reports GFLOP/s (2N^3/3 over min wall time).

vs_baseline compares against the reference CONFLUX's *best mean* at the same
N across all its grids (results/benchmarks.csv rows `lu,conflux,8192,...`):
285-294 ms on 64-512 Piz Daint ranks -> ~1280 GFLOP/s. The reference
saturates there (communication-bound); one TPU chip is the comparison unit.
"""

import json
import sys
import time


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from conflux_tpu.lu.single import lu_factor

    n, v = 8192, 512
    rng = np.random.default_rng(42)
    A = jnp.asarray(5.0 + rng.random((n, n), dtype=np.float32), jnp.float32)

    @jax.jit
    def run(A):
        # 'high' (bf16x3) trailing updates: residual 2.7e-7 at this size —
        # inside the reference's 1e-6 validation gate — and ~9% faster than
        # 6-pass f32
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
    baseline_gflops = 1280.0
    print(
        json.dumps(
            {
                "metric": f"LU N={n} f32 GFLOP/s (single chip)",
                "value": round(gflops, 1),
                "unit": "GFLOP/s",
                "vs_baseline": round(gflops / baseline_gflops, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
