"""TRSM outer-GEMM precision A/B at the crout headline: the two-level
substitution's long-K outer subtractions are ~2/3 of the 71.7 ms TRSM
component (prof_crout_components 2026-08-19); HIGH (bf16x3) would halve
them. Gate: the full blocked residual must stay comfortably under 1e-6
(currently 1.2e-8 at 'high' — 83x headroom; the outer chain is only 6
deep per solve, unlike the panel's Nt-deep recurrence that made HIGH
unsafe there).

Run: CONFLUX_TRSM_OUTER_PREC=high PYTHONPATH=/root/repo:/root/.axon_site \
     python experiments/prof_trsm_prec.py > /tmp/prof_trsm_prec.log 2>&1
"""

import importlib.util
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from conflux_tpu.lu.single import lu_factor

N, V = 32768, 1536
OP = os.environ.get("CONFLUX_TRSM_OUTER_PREC", "highest")


def main():
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
    print(f"[trsm={OP}] e2e crout N={N} v={V} 'high': med {med*1e3:8.1f} ms "
          f"{tf:6.1f} TF/s [{min(ts)*1e3:.1f},{max(ts)*1e3:.1f}]", flush=True)

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
