"""Amortized variant-dispatch measurement (round 3, VERDICT weak #3/#6).

The original prof_dispatch.py timed one dispatch + one scalar fetch per
rep; at the N=4096 scale (28-48 ms) the ~24 ms tunnel dispatch latency was
half the measurement, so the fori-vs-unrolled verdicts there sat inside
the noise. This harness times a CHAIN of R data-dependent executions
inside ONE jit and reports (T_R - T_1)/(R - 1): the fixed dispatch + fence
cost appears in both terms and cancels, leaving the pure per-execution
device time. The chain feeds each iteration's scalar sum back into the
next input (G + 0*acc) so XLA can neither CSE the repeats nor fold the
dependency away (0*x is not folded — NaN semantics).

Writes results/variant_dispatch.csv (same schema, ms = amortized device
time) and keeps the N>=8192 rows single-shot (signal >> latency there,
and the windowed variant's bounded trace is what matters at scale).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_dispatch2.py > /tmp/prof_dispatch2.log 2>&1 &
"""

import csv
import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from conflux_tpu.cholesky.p25d import (
    _local_cholesky_25d,
    _local_cholesky_25d_unrolled,
    _local_cholesky_25d_windowed,
)
from conflux_tpu.cholesky.single import cholesky
from conflux_tpu.grid import make_grid
from conflux_tpu.layout import BlockCyclic, distribute
from conflux_tpu.lu.p25d import (
    _local_lu_25d,
    _local_lu_25d_crout,
    _local_lu_25d_unrolled,
    _local_lu_25d_windowed,
)

R_CHAIN = 4  # executions per chained program at N=4096
REPS = 3


def _chain(fn, nrep):
    """jit of `nrep` data-dependent executions of fn(first_arg, *rest)."""

    def run(G, *rest):
        acc = jnp.float32(0)
        for _ in range(nrep):
            Gi = (G.astype(jnp.float32) + 0.0 * acc).astype(G.dtype)
            out = fn(Gi, *rest)
            acc = acc + jnp.sum(
                jax.tree.leaves(out)[0].astype(jnp.float32))
        return acc

    return jax.jit(run)


def _best(fn, *args, reps=REPS):
    float(fn(*args))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def timeit_amortized(fn, *args):
    t1 = _best(_chain(fn, 1), *args)
    tR = _best(_chain(fn, R_CHAIN), *args)
    return (tR - t1) / (R_CHAIN - 1) * 1e3


def timeit_single(fn, *args):
    return _best(_chain(fn, 1), *args) * 1e3


def main():
    rng = np.random.default_rng(42)
    grid = make_grid((1, 1, 1))
    rows = []
    for n, v in ((4096, 256), (4096, 512), (8192, 512), (8192, 256),
                 (16384, 512)):
        amortize = n <= 8192
        timer = timeit_amortized if amortize else timeit_single
        tag = "amortized" if amortize else "single"
        desc = BlockCyclic.create(n, n, v, grid)
        A = 5.0 + rng.random((n, n), dtype=np.float32)
        S = (A + A.T) / 2 + 2 * n * np.eye(n, dtype=np.float32)
        G = distribute(A, desc)
        Gs = distribute(S, desc)
        zeros = jnp.zeros(desc.global_shape(), jnp.float32)
        piv0 = jnp.zeros((1, 1, 1, desc.M), jnp.int32)
        for name, body in (
            ("fori", partial(_local_cholesky_25d, desc, "high")),
            ("unrolled", partial(_local_cholesky_25d_unrolled, desc, "high")),
            ("lookahead", partial(_local_cholesky_25d_unrolled, desc, "high",
                                  lookahead=True)),
            ("windowed", partial(_local_cholesky_25d_windowed, desc, "high",
                                 8)),
        ):
            fn = shard_map(body, mesh=desc.grid.mesh,
                           in_specs=P("z", "x", "y"),
                           out_specs=P("z", "x", "y"))
            ms = timer(fn, Gs)
            rows.append(("cholesky", name, n, v, round(ms, 2)))
            print(f"cholesky {name:9s} N={n} v={v}: {ms:8.2f} ms "
                  f"({n**3/3/ms/1e9:.2f} TF/s) [{tag}]", flush=True)
        for name, body in (
            ("fori", partial(_local_lu_25d, desc, "tournament", "high")),
            ("unrolled", partial(_local_lu_25d_unrolled, desc, "tournament",
                                 "high")),
            ("lookahead", partial(_local_lu_25d_unrolled, desc, "tournament",
                                  "high", lookahead=True)),
            ("windowed", partial(_local_lu_25d_windowed, desc, "tournament",
                                 "high", 8)),
            ("crout", partial(_local_lu_25d_crout, desc, "tournament",
                              "high")),
        ):
            fn = shard_map(
                body, mesh=desc.grid.mesh,
                in_specs=(P("z", "x", "y"), P("z", "x", "y"),
                          P("z", "x", "y", None)),
                out_specs=(P("z", "x", "y"), P("z", "x", "y", None)))
            ms = timer(fn, G, zeros, piv0)
            rows.append(("lu", name, n, v, round(ms, 2)))
            print(f"lu       {name:9s} N={n} v={v}: {ms:8.2f} ms "
                  f"({2*n**3/3/ms/1e9:.2f} TF/s) [{tag}]", flush=True)

    # single-chip cholesky: flat (left-looking) vs recursive
    for n in (8192, 16384):
        S = 5.0 + rng.random((n, n), dtype=np.float32)
        S = (S + S.T) / 2 + 2 * n * np.eye(n, dtype=np.float32)
        Sj = jnp.asarray(S)
        timer = timeit_amortized if n <= 8192 else timeit_single
        for scheme in ("flat", "recursive"):
            body = lambda A, s=scheme: cholesky(A, v=512, precision="high",
                                                scheme=s)
            ms = timer(body, Sj)
            rows.append(("cholesky-single", scheme, n, 512, round(ms, 2)))
            print(f"cholesky-single {scheme:10s} N={n}: {ms:8.2f} ms "
                  f"({n**3/3/ms/1e9:.2f} TF/s)", flush=True)

    with open("/root/repo/results/variant_dispatch.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["algorithm", "variant", "N", "v", "ms"])
        w.writerows(rows)
    print("done", flush=True)


if __name__ == "__main__":
    main()
