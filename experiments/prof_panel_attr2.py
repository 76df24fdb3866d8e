"""Panel round 2: merged=False (finished pivot lanes, no _pivot_factors)
and extraction-precision A/B at the crout headline shapes (N=32768,
v=1536, block=128, 21 steps amortized per jit).

Stage attribution from prof_panel_attr (2026-08-19, HIGHEST everything):
  transpose 30.3 / select 222.7 / pivfac 58.1 / full 271.3 ms.
merged=False drops pivfac (58 ms: a ~3.5 ms-fixed narrow [w]-row gather +
a second w-long forced elimination chain per step) but adds finish
scatters; CONFLUX_EXTRACT_PREC=high halves the one-hot extraction dots
(pure selections, <= 2^-25 relative reconstruction error).

Also probes the serial rank-1 chain floor (252 dependent kernel calls, no
loop-level dots) and the e2e crout headline + residual under the new
default path (merged=False for f32 storage).

Run (chain runs both precisions):
  CONFLUX_EXTRACT_PREC=highest python experiments/prof_panel_attr2.py chain
  CONFLUX_EXTRACT_PREC=high    python experiments/prof_panel_attr2.py
"""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from conflux_tpu.lu.single import lu_factor
from conflux_tpu.ops.panel import _rank1_dispatch, factor_panel_raw

N, V = 32768, 1536
STEPS = [(k, min(V, N - k)) for k in range(0, N, V)]
XP = os.environ.get("CONFLUX_EXTRACT_PREC", "highest")
DO_CHAIN = len(sys.argv) > 1 and sys.argv[1] == "chain"


def bench(name, fn, *args, reps=3):
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"[{XP}] {name:16s} {t*1e3:9.1f} ms  (compile {compile_s:.0f}s)",
          flush=True)
    return t


def main():
    @jax.jit
    def mk(key):
        return 5.0 + jax.random.uniform(key, (N, N), jnp.float32)

    R = mk(jax.random.key(0))
    float(R[0, 0])

    @jax.jit
    def full_unmerged(R):
        acc = jnp.float32(0)
        for k, w in STEPS:
            m_r = N - k
            panel = jax.lax.slice(R, (0, k), (m_r, k + w))
            piv, _, M, _ = factor_panel_raw(panel, jnp.ones(m_r, bool), w,
                                            block=128, merged=False)
            acc += jnp.sum(M[::17, ::19]) + jnp.sum(piv)
        return acc

    bench("full_unmerged", full_unmerged, R)

    if DO_CHAIN:
        # serial rank-1 chain floor: 252 dependent unforced kernel calls
        # (the per-step count: 12 blocks x 21 steps) with NO loop-level
        # dots between them — per-call latency of the fused Mosaic kernel
        m = 17408  # the average headline panel height
        Bt0 = jax.lax.slice(R, (0, 0), (128, m)) + 5.0
        av0 = jnp.ones((1, m), jnp.float32)

        @jax.jit
        def kchain(Bt, av):
            acc = jnp.float32(0)
            for _ in range(252):
                Bt, av, pivw, _ = _rank1_dispatch(Bt, av, 0, False)
                acc += jnp.sum(pivw)
            return acc, Bt

        t = bench("kchain252", kchain, Bt0, av0)
        print(f"[{XP}] per-call serial cost {t/252*1e6:.0f} us "
              f"(x252 = {t*1e3:.1f} ms of the 222.7 ms select)", flush=True)

    # e2e crout headline under the NEW default (merged=False for f32)
    @jax.jit
    def e2e(key):
        A = 5.0 + jax.random.uniform(key, (N, N), jnp.float32)
        F, perm = lu_factor(A, v=V, precision="high", scheme="crout",
                            partition=1)
        return jnp.sum(F), perm[0]

    key = jax.random.key(42)
    s, _ = e2e(key)
    float(s)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        s, _ = e2e(key)
        float(s)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[1]
    tf = 2 * N**3 / 3 / med / 1e12
    print(f"[{XP}] e2e crout N={N} v={V} 'high' unmerged: med {med*1e3:8.1f} "
          f"ms {tf:6.1f} TF/s [{min(ts)*1e3:.1f},{max(ts)*1e3:.1f}]",
          flush=True)

    # residual of the shipped config (same protocol as prof_r3i)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "pr3i", "/root/repo/experiments/prof_r3i.py")
    pr3i = importlib.util.module_from_spec(spec)
    sys.modules["pr3i"] = pr3i
    saved = sys.argv
    sys.argv = [saved[0]]
    spec.loader.exec_module(pr3i)
    sys.argv = saved
    pr3i.residual(N, V, 1, "high")
    print("done", flush=True)


if __name__ == "__main__":
    main()
