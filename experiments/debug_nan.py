"""Bisect the real-TPU NaN in the transposed panel pipeline.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/debug_nan.py
"""

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from conflux_tpu.lu.single import lu_factor, lu_residual
from conflux_tpu.ops.panel import factor_panel, select_pivots

rng = np.random.default_rng(0)

# 1. select_pivots on a panel: TPU vs host-numpy spec
m, w = 2048, 512
P = rng.standard_normal((m, w)).astype(np.float32)
piv, ok, lu = select_pivots(jnp.asarray(P), jnp.ones(m, bool), w)
piv = np.asarray(piv)
print("select: ok all:", bool(np.asarray(ok).all()),
      "piv unique:", len(np.unique(piv)) == w,
      "lu finite:", bool(np.isfinite(np.asarray(lu)).all()), flush=True)
L = np.tril(np.asarray(lu), -1) + np.eye(w, dtype=np.float32)
U = np.triu(np.asarray(lu))
res = np.linalg.norm(P[piv] - L @ U) / np.linalg.norm(P)
print(f"select: ||P[piv] - LU||/||P|| = {res:.3e}", flush=True)

# 2. factor_panel multipliers
piv2, ok2, M = factor_panel(jnp.asarray(P), jnp.ones(m, bool), w)
M = np.asarray(M)
print("factor: M finite:", bool(np.isfinite(M).all()), flush=True)
# non-pivot rows: P = Lmul @ U (multiplier check)
mask = np.ones(m, bool); mask[np.asarray(piv2)] = False
recon = M[mask] @ U  # M rows hold multipliers vs the SAME U
res2 = np.linalg.norm(P[mask] - recon) / np.linalg.norm(P)
print(f"factor: multiplier residual = {res2:.3e}", flush=True)

# 3. small full factorizations on chip
for n in (1024, 2048, 4096):
    A = rng.standard_normal((n, n)).astype(np.float32)
    F, p = jax.jit(lambda a, n=n: lu_factor(a, v=256, precision="high",
                                            scheme="flat"))(jnp.asarray(A))
    r = float(lu_residual(A, F, np.asarray(p)))
    print(f"flat N={n}: residual {r:.3e} finite={np.isfinite(np.asarray(F)).all()}",
          flush=True)
print("done", flush=True)
