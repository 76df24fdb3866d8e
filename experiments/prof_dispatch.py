"""Measure the fori vs unrolled SPMD rank programs on the real chip (grid
1x1x1, calling the shard_map kernels directly so the P=1 fast-path dispatch
does not bypass them), plus the flat vs recursive single-chip Cholesky.
Writes results/variant_dispatch.csv — the data behind `choose_unroll`
(the analog of the reference's (P, N) variant table, Cholesky.cpp:857-921).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_dispatch.py > /tmp/prof_dispatch.log 2>&1 &
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
    _local_lu_25d_unrolled,
    _local_lu_25d_windowed,
)


def timeit(fn, *args, reps=3):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    rng = np.random.default_rng(42)
    grid = make_grid((1, 1, 1))
    rows = []
    for n, v in ((4096, 256), (4096, 512), (8192, 512), (8192, 256),
                 (16384, 512)):
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
            ("windowed", partial(_local_cholesky_25d_windowed, desc, "high", 8)),
        ):
            fn = jax.jit(shard_map(
                body, mesh=desc.grid.mesh,
                in_specs=P("z", "x", "y"), out_specs=P("z", "x", "y")))
            ms = timeit(fn, Gs)
            rows.append(("cholesky", name, n, v, round(ms, 2)))
            print(f"cholesky {name:9s} N={n} v={v}: {ms:8.2f} ms "
                  f"({n**3/3/ms/1e9:.2f} TF/s)", flush=True)
        for name, body in (
            ("fori", partial(_local_lu_25d, desc, "tournament", "high")),
            ("unrolled", partial(_local_lu_25d_unrolled, desc, "tournament", "high")),
            ("lookahead", partial(_local_lu_25d_unrolled, desc, "tournament",
                                  "high", lookahead=True)),
            ("windowed", partial(_local_lu_25d_windowed, desc, "tournament", "high", 8)),
        ):
            fn = jax.jit(shard_map(
                body,
                mesh=desc.grid.mesh,
                in_specs=(P("z", "x", "y"), P("z", "x", "y"),
                          P("z", "x", "y", None)),
                out_specs=(P("z", "x", "y"), P("z", "x", "y", None))))
            ms = timeit(fn, G, zeros, piv0)
            rows.append(("lu", name, n, v, round(ms, 2)))
            print(f"lu       {name:9s} N={n} v={v}: {ms:8.2f} ms "
                  f"({2*n**3/3/ms/1e9:.2f} TF/s)", flush=True)

    # single-chip cholesky: flat (left-looking) vs recursive
    for n in (8192, 16384):
        S = 5.0 + rng.random((n, n), dtype=np.float32)
        S = (S + S.T) / 2 + 2 * n * np.eye(n, dtype=np.float32)
        Sj = jnp.asarray(S)
        for scheme in ("flat", "recursive"):
            f = jax.jit(lambda A, s=scheme: jnp.sum(
                cholesky(A, v=512, precision="high", scheme=s)))
            ms = timeit(f, Sj)
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
