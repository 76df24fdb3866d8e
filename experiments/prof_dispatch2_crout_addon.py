"""Cholesky-crout rows for variant_dispatch.csv — the r4 left-looking
Cholesky rank program landed after prof_dispatch2.py's arm list was
frozen into the running regen; this addon appends its rows at the same
(N, v) grid and protocol (K-amortized <= 8192, single-shot above).

Run (after the regen finished — it rewrites the CSV):
PYTHONPATH=/root/repo:/root/.axon_site:/root/repo/experiments nohup \
  python experiments/prof_dispatch2_crout_addon.py > /tmp/prof_dispatch2_addon.log 2>&1 &
"""

import csv
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from conflux_tpu.cholesky.p25d import _local_cholesky_25d_crout
from conflux_tpu.grid import make_grid
from conflux_tpu.layout import BlockCyclic, distribute
from prof_dispatch2 import timeit_amortized, timeit_single

CSV = "/root/repo/results/variant_dispatch.csv"


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
        Gs = distribute(S, desc)
        body = partial(_local_cholesky_25d_crout, desc, "high")
        fn = shard_map(body, mesh=desc.grid.mesh,
                       in_specs=P("z", "x", "y"), out_specs=P("z", "x", "y"))
        ms = timer(fn, Gs)
        rows.append(("cholesky", "crout", n, v, round(ms, 2)))
        print(f"cholesky crout N={n} v={v}: {ms:8.2f} ms "
              f"({n**3/3/ms/1e9:.2f} TF/s) [{tag}]", flush=True)
    with open(CSV, "a", newline="") as f:
        csv.writer(f).writerows(rows)
    print("done", flush=True)


if __name__ == "__main__":
    main()
