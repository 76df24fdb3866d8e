"""Three-level panel kernel (leaf=8) A/B at the N=32768 crout headline.

The two-level kernel is VMEM-bandwidth-bound: each rank-1 step RMWs the
[_SUB=32, m] micro-panel and the pivot-lane extraction matvec re-reads it
(~1.4 GB VMEM traffic per [128, 17408] call -> 545 us/call measured,
/tmp/prof_panel_attr2_hi.log kchain252). The leaf level restricts the
per-step slice to [_LEAF=8, m] and fixes the micro-panel rest with one
masked MXU update per leaf boundary (~3x traffic cut, 3 extra short
dot chains per micro-panel).

Measures (CONFLUX_PANEL_LEAF set by the caller):
  kchain252      — the serial kernel floor (545 us/call baseline)
  full_unmerged  — 21-step panel-factorization chain (279.1 ms @ highest)
  e2e            — crout N=32768 v=1536 'high' headline (886 ms baseline)
  residual       — full blocked ||PA-LU||/(N||A||) at the shipped config

Memory hygiene: every stage's buffers are in-jit temps or explicitly
deleted before the e2e (the attr2 probe kept a 4.3 GB warm-up matrix
alive and OOMed the e2e).

Run: CONFLUX_PANEL_LEAF=8 python experiments/prof_r3v_leaf.py
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
LEAF = os.environ.get("CONFLUX_PANEL_LEAF", "8")


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
    print(f"[leaf={LEAF}] {name:14s} {t*1e3:9.1f} ms  (compile {compile_s:.0f}s)",
          flush=True)
    return t


def main():
    m = 17408  # the average headline panel height

    @jax.jit
    def mk_bt(key):
        B = 5.0 + jax.random.uniform(key, (128, m), jnp.float32)
        return B + 5.0, jnp.ones((1, m), jnp.float32)

    Bt0, av0 = mk_bt(jax.random.key(0))
    float(Bt0[0, 0])

    @jax.jit
    def kchain(Bt, av):
        acc = jnp.float32(0)
        for _ in range(252):
            Bt, av, pivw, _ = _rank1_dispatch(Bt, av, 0, False)
            acc += jnp.sum(pivw)
        return acc, Bt

    t = bench("kchain252", kchain, Bt0, av0)
    print(f"[leaf={LEAF}] per-call serial cost {t/252*1e6:.0f} us "
          f"(two-level baseline 545 us)", flush=True)
    del Bt0, av0

    @jax.jit
    def full_unmerged(key):
        R = 5.0 + jax.random.uniform(key, (N, N), jnp.float32)
        acc = jnp.float32(0)
        for k, w in STEPS:
            m_r = N - k
            panel = jax.lax.slice(R, (0, k), (m_r, k + w))
            piv, _, M, _ = factor_panel_raw(panel, jnp.ones(m_r, bool), w,
                                            block=128, merged=False)
            acc += jnp.sum(M[::17, ::19]) + jnp.sum(piv)
        return acc

    bench("full_unmerged", full_unmerged, jax.random.key(0))

    # e2e crout headline (nothing else alive)
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
    for _ in range(5):
        t0 = time.perf_counter()
        s, _ = e2e(key)
        float(s)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    tf = 2 * N**3 / 3 / med / 1e12
    print(f"[leaf={LEAF}] e2e crout N={N} v={V} 'high': med {med*1e3:8.1f} "
          f"ms {tf:6.1f} TF/s [{min(ts)*1e3:.1f},{max(ts)*1e3:.1f}]",
          flush=True)

    # residual of the shipped config (prof_r3i protocol)
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
