"""Trace the NO-ROW-MOVEMENT flat LU at N=16384 v=512 and print aggregated
device-op attribution (shared infra from prof_trace3).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_trace5.py > /tmp/prof_trace5.log 2>&1 &
"""

import importlib.util
import sys

spec = importlib.util.spec_from_file_location(
    "pt3", "/root/repo/experiments/prof_trace3.py")
pt3 = importlib.util.module_from_spec(spec)
sys.modules["pt3"] = pt3
spec.loader.exec_module(pt3)

import jax
import jax.numpy as jnp
import numpy as np

from conflux_tpu.lu.single import lu_factor


def main():
    rng = np.random.default_rng(42)
    n = 16384
    A = jnp.asarray(5.0 + rng.random((n, n), dtype=np.float32))
    pt3.capture(
        "flat_inplace_16384",
        jax.jit(lambda A: (lambda F, p: (jnp.sum(F), p[0]))(
            *lu_factor(A, v=512, precision="high", scheme="flat"))),
        A,
    )
    print("done", flush=True)


if __name__ == "__main__":
    main()
