"""Trace the CURRENT headline kernels at N=16384: recursive LU, flat LU
(in-place update formulation), flat Cholesky. Prints aggregated device-op
attribution from the chrome trace.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_trace4.py > /tmp/prof_trace4.log 2>&1 &
"""

import importlib.util, sys
spec = importlib.util.spec_from_file_location(
    "pt3", "/root/repo/experiments/prof_trace3.py")
pt3 = importlib.util.module_from_spec(spec)
sys.modules["pt3"] = pt3
spec.loader.exec_module(pt3)

import jax, jax.numpy as jnp, numpy as np
from conflux_tpu.lu.single import lu_factor
from conflux_tpu.cholesky.single import cholesky

def quick(tag, f, A, reps=2):
    import time
    out = f(A); float(out[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); out = f(A); float(out[0])
        ts.append(time.perf_counter() - t0)
    print(f"{tag}: {min(ts)*1e3:.1f} ms", flush=True)

def main():
    rng = np.random.default_rng(42)
    # quick flat timings first: is the in-place formulation slow at all sizes?
    for nq in (8192, 16384):
        Aq = jnp.asarray(5.0 + rng.random((nq, nq), dtype=np.float32))
        quick(f"flat_lu_{nq}", jax.jit(lambda A: (lambda F, p: (jnp.sum(F), p[0]))(
            *lu_factor(A, v=512, precision="high", scheme="flat"))), Aq)
        del Aq
    n = 16384
    A = jnp.asarray(5.0 + rng.random((n, n), dtype=np.float32))
    pt3.capture("rec_lu_16384", jax.jit(lambda A: (lambda F, p: (jnp.sum(F), p[0]))(
        *lu_factor(A, v=512, precision="high", scheme="recursive"))), A)
    pt3.capture("flat_lu_16384", jax.jit(lambda A: (lambda F, p: (jnp.sum(F), p[0]))(
        *lu_factor(A, v=512, precision="high", scheme="flat"))), A)
    S = (A + A.T) / 2 + 2 * n * jnp.eye(n, dtype=jnp.float32)
    del A
    pt3.capture("flat_chol_16384", jax.jit(lambda A: jnp.sum(
        cholesky(A, v=512, precision="high", scheme="flat"))), S)
    print("done", flush=True)

if __name__ == "__main__":
    main()
