"""Append the CURRENT headline rows to results/benchmarks.csv: crout
left-looking LU at the measured-best tile (v=1536) for N=32768 and
N=16384, tagged `crout-high` in the chol_vers column so they are
distinguishable from the round-2 flat-scheme rows that the rest of the
archive still carries (the full regeneration is hours of remote compiles;
the README table cites these tagged rows).

Protocol = bench.py exactly: in-jit matrix generation (an A argument stays
allocated for the whole program and pushes N=32768 toward the HBM cliff —
CLAUDE.md donation rules), scalar summary readback, 5 reps.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/run_archive_head.py > /tmp/run_archive_head.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from conflux_tpu.bench.harness import Result, append_results
from conflux_tpu.lu.single import lu_factor

CSV = "/root/repo/results/benchmarks.csv"
REPS = 5


def run(n, v, precision="high"):
    @jax.jit
    def f(key):
        A = 5.0 + jax.random.uniform(key, (n, n), jnp.float32)
        F, perm = lu_factor(A, v=v, precision=precision, scheme="crout")
        return jnp.sum(F), perm[0]

    key = jax.random.key(42)
    for attempt in (1, 2):
        try:
            s, _ = f(key)
            float(s)
            break
        except Exception as e:
            print(f"N={n} attempt {attempt}: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            if attempt == 2:
                return
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        s, _ = f(key)
        float(s)
        ts.append((time.perf_counter() - t0) * 1e3)
    rows = [Result("lu", "conflux-tpu", n, n, 1, "1x1x1", "time", "strong",
                   round(ms, 3), v, f"crout-{precision}") for ms in ts]
    append_results(CSV, rows)
    med = sorted(ts)[len(ts) // 2]
    print(f"lu crout N={n:6d} v={v:5d} {precision}: med {med:9.2f} ms  "
          f"{2 / 3 * n**3 / med / 1e6:9.1f} GF/s  "
          f"[{min(ts):.1f},{max(ts):.1f}]", flush=True)


def main():
    run(32768, 1536, "high")
    run(16384, 1536, "high")
    try:
        from conflux_tpu.bench import plots
        plots.main([CSV, "-o", "/root/repo/results/scaling.png"])
        print("scaling.png regenerated", flush=True)
    except Exception as e:
        print(f"plot failed: {type(e).__name__}: {e}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
