"""Bench-config A/B at the crout headline: RNG impl (threefry vs rbg) and
the r3g/r3h winners. The v=1024 trace (prof_crout_trace) charges ~22.6 ms
to the threefry fusion (190 GB/s) plus a 12.6 ms layout copy of its
{0,1}-laid-out output; XLA's RngBitGenerator (impl='rbg') writes at
streaming rate. Matrix family is unchanged (5 + U[0,1), different bits).

Also measures the full in-jit blocked ||PA-LU||_F/(N*||A||_F) residual at
N=32768 for the winning config ('high' and 'highest') — the headline
number against the 1e-6 gate, same row-keyed-regeneration protocol as
experiments/prof_fused_e2e.py (threefry keys; the residual is a property
of the algorithm, not of which bits filled A).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_r3i.py [v] [part] > /tmp/prof_r3i.log 2>&1 &
"""

import importlib.util
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from conflux_tpu.lu.single import lu_factor

spec = importlib.util.spec_from_file_location(
    "pfe", "/root/repo/experiments/prof_fused_e2e.py")
pfe = importlib.util.module_from_spec(spec)
sys.modules["pfe"] = pfe
spec.loader.exec_module(pfe)

N = 32768
V = int(sys.argv[1]) if len(sys.argv) > 1 else 1536
PART = int(sys.argv[2]) if len(sys.argv) > 2 else 1
_PREC = jax.lax.Precision.HIGHEST
CHUNK = 2048


def timing(n, v, part, impl, precision="high", reps=3):
    @jax.jit
    def run(key):
        A = 5.0 + jax.random.uniform(key, (n, n), jnp.float32)
        F, perm = lu_factor(A, v=v, precision=precision, scheme="crout",
                            partition=part)
        return jnp.sum(F), perm[0]

    key = jax.random.key(42, impl=impl)
    try:
        s, _ = run(key); float(s)
    except Exception as e:
        print(f"bench-ab v={v} part={part} {impl}: FAIL {type(e).__name__} "
              f"{str(e)[:120]}", flush=True)
        return None
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s, _ = run(key); float(s)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    tf = 2 * n**3 / 3 / med / 1e12
    print(f"bench-ab v={v} part={part} {impl:12s} {precision}: "
          f"med {med*1e3:8.1f} ms {tf:6.1f} TF/s "
          f"[{min(ts)*1e3:.1f},{max(ts)*1e3:.1f}]", flush=True)
    return med


def residual(n, v, part, precision):
    """prof_fused_e2e.residual with a partition knob (values are cadence-
    independent — dead rows never feed live rows — but measure the shipped
    config, not a sibling)."""

    @jax.jit
    def run(key):
        F, perm = lu_factor(pfe.gen_A(key, n, n), v=v, precision=precision,
                            scheme="crout", partition=part)
        F = F.astype(jnp.float32)
        U = jnp.triu(F[:n])
        nr2 = jnp.float32(0)
        na2 = jnp.float32(0)
        for r in range(0, n, CHUNK):
            rows = min(CHUNK, n - r)
            pb = jax.lax.dynamic_slice(perm, (r,), (rows,))
            PA = pfe.gen_rows(key, pb, n)
            Fb = jax.lax.dynamic_slice(F, (r, 0), (rows, n))
            Lb = jnp.where(
                jnp.arange(n)[None, :] < r + jnp.arange(rows)[:, None],
                Fb, 0.0,
            )
            Lb = Lb.at[jnp.arange(rows), r + jnp.arange(rows)].set(1.0)
            Rb = PA - jnp.dot(Lb, U, precision=_PREC)
            nr2 += jnp.sum(Rb * Rb)
            na2 += jnp.sum(PA * PA)
        return jnp.sqrt(nr2) / (n * jnp.sqrt(na2))

    key = jax.random.key(42)
    try:
        res = float(run(key))
        gate = "PASS" if res <= 1e-6 else "FAIL"
        print(f"resid N={n} v={v} part={part} crout {precision:7s}: "
              f"{res:.3e}  gate(1e-6) {gate}", flush=True)
    except Exception as e:
        print(f"resid N={n} v={v} part={part} crout {precision}: FAIL "
              f"{type(e).__name__} {str(e)[:120]}", flush=True)


def main():
    timing(N, V, PART, "threefry2x32")
    timing(N, V, PART, "rbg")
    residual(N, V, PART, "high")
    residual(N, V, PART, "highest")
    print("done", flush=True)


if __name__ == "__main__":
    main()
