"""Produce the real-TPU benchmark archive (results/benchmarks.csv) — the
role of the reference's 6526-row results/benchmarks.csv: measured rows, not
README claims. Covers LU + Cholesky single chip across N / v / precision,
then regenerates results/scaling.png.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/run_archive.py > /tmp/run_archive.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from conflux_tpu.bench.harness import Result, append_results
from conflux_tpu.cholesky.single import cholesky
from conflux_tpu.io import random_matrix, spd_matrix
from conflux_tpu.lu.single import lu_factor

CSV = "/root/repo/results/benchmarks.csv"


def timed(fn, *args, reps=3):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        ts.append((time.perf_counter() - t0) * 1e3)
    return ts


def run_lu(n, v, precision, donate=False, scheme="auto"):
    """`scheme` tags the chol_vers column as '<scheme>-<precision>' when a
    non-auto scheme is forced (e.g. crout rows)."""
    kw = {"donate_argnums": 0} if donate else {}
    if donate:
        # donation needs the factor to be a jit OUTPUT (input/output buffer
        # aliasing): F then reuses A's 4 GB and the in-place updates write
        # into the donated buffer instead of copying it. The checksum output
        # is the 4-byte completion fence.
        f = jax.jit(lambda a: (lambda F, p: (F, p, jnp.sum(F)))(
            *lu_factor(a, v=v, precision=precision)), **kw)
        ts = []
        out = f(jnp.asarray(random_matrix(n, n, seed=1)))  # compile
        float(out[2]); del out
        for i in range(2):
            Ai = jnp.asarray(random_matrix(n, n, seed=i))
            t0 = time.perf_counter()
            out = f(Ai)
            float(out[2])
            ts.append((time.perf_counter() - t0) * 1e3)
            del out
    else:
        A = jnp.asarray(random_matrix(n, n, seed=42))
        f = jax.jit(lambda a: (lambda F, p: (jnp.sum(F), p[0]))(
            *lu_factor(a, v=v, precision=precision, scheme=scheme)), **kw)
        ts = timed(f, A)
    tag = precision if scheme == "auto" else f"{scheme}-{precision}"
    rows = [Result("lu", "conflux-tpu", n, n, 1, "1x1x1", "time", "strong",
                   round(ms, 3), v, tag) for ms in ts]
    append_results(CSV, rows)
    gf = 2 / 3 * n**3 / min(ts) / 1e6
    print(f"lu       N={n:6d} v={v:5d} {precision:7s}: "
          f"{min(ts):9.2f} ms  {gf:9.1f} GF/s", flush=True)


def run_chol(n, v, precision):
    A = jnp.asarray(spd_matrix(n, v=min(v, 256), seed=42))
    f = jax.jit(lambda a: jnp.sum(cholesky(a, v=v, precision=precision)))
    ts = timed(f, A)
    rows = [Result("cholesky", "psychol", n, n, 1, "1x1x1", "time", "strong",
                   round(ms, 3), v, precision) for ms in ts]
    append_results(CSV, rows)
    gf = n**3 / 3 / min(ts) / 1e6
    print(f"cholesky N={n:6d} v={v:5d} {precision:7s}: "
          f"{min(ts):9.2f} ms  {gf:9.1f} GF/s", flush=True)


def run_lu_bf16s(n, v):
    """bf16-STORAGE mode rows (halved HBM; ~2e-5 N-normalized residual
    plateau, documented in README — precision column 'bf16s')."""
    A = jnp.asarray(random_matrix(n, n, seed=42)).astype(jnp.bfloat16)
    f = jax.jit(lambda a: (lambda F, p: (jnp.sum(F.astype(jnp.float32)),
                                         p[0]))(*lu_factor(a, v=v)))
    ts = timed(f, A)
    rows = [Result("lu", "conflux-tpu", n, n, 1, "1x1x1", "time", "strong",
                   round(ms, 3), v, "bf16s") for ms in ts]
    append_results(CSV, rows)
    gf = 2 / 3 * n**3 / min(ts) / 1e6
    print(f"lu-bf16s N={n:6d} v={v:5d}: {min(ts):9.2f} ms  {gf:9.1f} GF/s",
          flush=True)


def main():
    import os

    # fresh regeneration: the measured rows must reflect the CURRENT kernels
    # — but keep the stock-XLA comparison rows (run_xla_baseline.py), which
    # measure XLA, not us
    xla_rows = []
    if os.path.exists(CSV):
        with open(CSV) as fh:
            xla_rows = [ln for ln in fh if ln.split(",")[1:2] == ["xla"]]
        os.rename(CSV, CSV + ".prev")
    if xla_rows:
        with open(CSV, "w") as fh:
            fh.write("algorithm,library,N,N_base,P,grid,unit,type,value,"
                     "blocksize,chol_vers\n")
            fh.writelines(xla_rows)
    # N scan at the headline tile size
    for n in (2048, 4096, 8192, 16384):
        run_lu(n, 512, "high")
        run_chol(n, 512, "high")
    # tile-size scan at N=8192 and N=16384
    for v in (256, 1024):
        run_lu(8192, v, "high")
        run_chol(8192, v, "high")
    run_lu(16384, 1024, "high")
    run_chol(16384, 1024, "high")
    # precision scan at N=8192 and N=16384
    for n in (8192, 16384):
        for prec in ("highest", "bf16"):
            run_lu(n, 512, prec)
    # the memory-ceiling point (flat no-movement scheme, the only one that
    # fits; v=1024 measured best). NO donate mode here: returning the full
    # 4.3 GB factor as a jit output (which donation requires) pushes the
    # peak working set over the ~13 GB HBM degradation cliff — measured
    # 140-845 s vs 0.95 s for the scalar-output program (2026-08-17).
    run_lu(32768, 1024, "high")
    run_chol(32768, 1024, "high")
    run_lu(32768, 1024, "highest")
    run_lu_bf16s(32768, 1024)

    # regenerate the scaling plot from the CSV
    try:
        from conflux_tpu.bench import plots

        plots.main([CSV, "-o", "/root/repo/results/scaling.png"])
        print("scaling.png regenerated", flush=True)
    except Exception as e:
        print(f"plot failed: {type(e).__name__}: {e}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
