"""Trace the no-partition flat LU at N=16384 v=1024 (device-op attribution)
and sweep the panel rank-1 block width on the full factorization.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_flat_trace6.py > /tmp/prof_flat_trace6.log 2>&1 &
"""

import importlib.util
import sys
import time
from functools import partial

spec = importlib.util.spec_from_file_location(
    "pt3", "/root/repo/experiments/prof_trace3.py")
pt3 = importlib.util.module_from_spec(spec)
sys.modules["pt3"] = pt3
spec.loader.exec_module(pt3)

import jax
import jax.numpy as jnp
import numpy as np

import conflux_tpu.ops.panel as panel_mod
from conflux_tpu.lu.single import _getrf_flat


def timeit(f, A, reps=3):
    out = f(A)
    float(out[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(A)
        float(out[0])
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    rng = np.random.default_rng(42)
    n = 16384
    A = jnp.asarray(5.0 + rng.random((n, n), dtype=np.float32))

    # panel rank-1 block-width sweep (VPU work per panel ~ BLOCK * v * m)
    for blk in (32, 64, 128):
        panel_mod._BLOCK = blk
        f = jax.jit(partial(
            lambda a, v: (lambda F, p: (jnp.sum(F), p[0]))(
                *_getrf_flat(a, v, "high")), v=1024))
        ms = timeit(f, A)
        print(f"flat N={n} v=1024 BLOCK={blk:4d}: {ms:8.1f} ms "
              f"{2/3*n**3/ms/1e6:9.1f} GF/s", flush=True)
    panel_mod._BLOCK = 64

    pt3.capture(
        "flat_nopart_16384_v1024",
        jax.jit(lambda A: (lambda F, p: (jnp.sum(F), p[0]))(
            *_getrf_flat(A, 1024, "high"))),
        A,
    )
    print("done", flush=True)


if __name__ == "__main__":
    main()
