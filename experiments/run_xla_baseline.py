"""Measure the stock-XLA on-chip baselines (jax.lax.linalg.lu,
jnp.linalg.cholesky) at N in {8192, 16384, 32768} on the real TPU chip and
append `library=xla` rows to results/benchmarks.csv — the MKL/SLATE analog
of the reference archive (results/scripts/scaling_plots.R:24-28): without
these rows "fast" is unanchored.

Timing protocol: scalar-summary outputs inside one jit (the factor matrix
never leaves the device — HBM-cliff + 50 MB/s tunnel rules, CLAUDE.md),
median-of-5 written as 5 rows like the rest of the archive.

Run (serialized with other chip jobs):
  nohup python experiments/run_xla_baseline.py > /tmp/xla_baseline.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from conflux_tpu.bench.harness import Result, append_results

CSV = "/root/repo/results/benchmarks.csv"
SIZES = (8192, 16384, 32768)
REPS = 5


def timed(fn, A, reps=REPS):
    s = fn(A)
    float(s)  # compile + warm-up; 4-byte readback is the completion fence
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(A))
        ts.append((time.perf_counter() - t0) * 1e3)
    return ts


def attempt(label, fn, A, n, alg):
    """Measure + append immediately (a later size's compile failure must
    not lose earlier rows), retrying once for the flaky compile helper.
    A reproducible compile failure is itself the comparison result — the
    stock kernel cannot run this size through this toolchain — and is
    printed (not appended) so the README table can cite it."""
    for att in (1, 2):
        try:
            ts = timed(fn, A)
            print(f"xla {alg:8s} N={n}: {['%.1f' % t for t in ts]} ms",
                  flush=True)
            append_results(CSV, [
                Result(alg, "xla", n, n, 1, "1x1x1", "time", "strong",
                       round(t, 3), 0, "f32") for t in ts])
            return
        except Exception as e:
            print(f"xla {alg} N={n} attempt {att} failed: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)


def _have(alg, n):
    """Skip (alg, n) pairs already archived: re-runs fill only the gaps
    (the lu 16384/32768 + cholesky 32768 attempts of the first pass died
    with the session, losing the rows)."""
    import os

    if not os.path.exists(CSV):
        return False
    with open(CSV) as fh:
        return any(ln.startswith(f"{alg},xla,{n},") for ln in fh)


def main():
    for n in SIZES:
        if _have("lu", n) and _have("cholesky", n):
            print(f"xla N={n}: rows present, skipping", flush=True)
            continue
        # A generated ON DEVICE (host upload at N=32768 costs ~80 s over
        # the 50 MB/s tunnel); same 5+U[0,1) family as the archive rows
        A = jax.jit(lambda key: 5.0 + jax.random.uniform(
            key, (n, n), jnp.float32))(jax.random.key(42))
        float(jnp.sum(A[0]))  # completion fence

        @jax.jit
        def xla_lu(a):
            lu, piv, _ = jax.lax.linalg.lu(a)
            return jnp.sum(lu) + piv[0]

        if not _have("lu", n):
            attempt("lu", xla_lu, A, n, "lu")

        # SPD via A A^T/n + I scaling — built on-device to avoid shipping
        # an N^2 host array through the 50 MB/s tunnel. A is freed FIRST
        # and regenerated as an in-jit temp: at N=32768 keeping A + S +
        # the cholesky factor alive is ~13 GB (RESOURCE_EXHAUSTED on the
        # first pass, /tmp/xla_baseline.log 2026-08-19)
        del A

        @jax.jit
        def make_spd(key):
            a = 5.0 + jax.random.uniform(key, (n, n), jnp.float32)
            return jnp.dot(a, a.T, precision=jax.lax.Precision.DEFAULT) / n \
                + n * jnp.eye(n, dtype=jnp.float32)

        S = make_spd(jax.random.key(42))
        float(jnp.sum(S[0]))  # completion fence

        @jax.jit
        def xla_chol(s):
            return jnp.sum(jnp.linalg.cholesky(s))

        if not _have("cholesky", n):
            attempt("cholesky", xla_chol, S, n, "cholesky")
        del S
    print("done", flush=True)


if __name__ == "__main__":
    main()
