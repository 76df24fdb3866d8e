"""Component attribution for the crout headline (N=32768, v=1536,
'high', partition=1): each sub-component of _getrf_crout is timed as ONE
jit that replays that component at every step's exact shape (21 steps),
so the measurement carries the same shape mix as the real run and the
~24 ms dispatch latency is amortized across the whole sweep.

Components (names match lu/single._getrf_crout):
  gemm_panel : P = R[:, :k] @ F[:k, k:k+w]   (big-K, pallas_bigk-routed)
  gemm_u12   : rhs -= R_piv[:, :k] @ F[:k, k+w:]
  trsm       : U12 = L11^{-1} rhs             (two-level substitution)
  panel_fac  : factor_panel_raw on [m_r, w]   (masked-argmax + Mosaic)
  compaction : live-row full-width gather R[live_idx] (shrinking)
  pivrows    : R[piv] row gather + the 3 F band writes

The sum should reconstruct the measured full-kernel time (886 ms,
/tmp/prof_r3i.log); the gap is XLA overlap/fusion slack.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_crout_components.py > /tmp/prof_crout_components.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from conflux_tpu.lu.single import _bigk_ok
from conflux_tpu.ops.panel import factor_panel_raw
from conflux_tpu.ops.tri import schur_dot, trsm_left_lower_unit, unit_lower

N, V = 32768, 1536
GMODE = "high"
STEPS = [(k, min(V, N - k)) for k in range(0, N, V)]


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
    print(f"{name:12s} {t*1e3:9.1f} ms  (compile {compile_s:.0f}s)",
          flush=True)
    return t


def gemm(a, b, mode):
    if _bigk_ok(a.shape[0], b.shape[1], a.shape[1], mode):
        from conflux_tpu.ops.pallas_gemm import sub_matmul_pallas_bigk

        return sub_matmul_pallas_bigk(
            jnp.zeros((a.shape[0], b.shape[1]), jnp.float32), a, b, mode)
    return schur_dot(a, b, mode)


def main():
    key = jax.random.key(0)

    @jax.jit
    def mk(key):
        return 5.0 + jax.random.uniform(key, (N, N), jnp.float32)

    R = mk(key)
    F = mk(jax.random.key(1))
    float(R[0, 0])

    @jax.jit
    def gemm_panel(R, F):
        acc = jnp.float32(0)
        for k, w in STEPS:
            if k == 0:
                continue
            m_r = N - k
            P = gemm(jax.lax.slice(R, (0, 0), (m_r, k)),
                     jax.lax.slice(F, (0, k), (k, k + w)), GMODE)
            acc += jnp.sum(P[::257, ::129])
        return acc

    @jax.jit
    def gemm_u12(R, F):
        acc = jnp.float32(0)
        for k, w in STEPS:
            if k == 0 or k + w >= N:
                continue
            P = gemm(jax.lax.slice(R, (0, 0), (w, k)),
                     jax.lax.slice(F, (0, k + w), (k, N)), GMODE)
            acc += jnp.sum(P[::37, ::129])
        return acc

    @jax.jit
    def trsm(R, F):
        acc = jnp.float32(0)
        for k, w in STEPS:
            if k + w >= N:
                continue
            lu_top = jax.lax.slice(F, (k, k), (k + w, k + w)) * 0.1
            rhs = jax.lax.slice(R, (0, k + w), (w, N))
            U12 = trsm_left_lower_unit(unit_lower(lu_top), rhs,
                                       method="invert")
            acc += jnp.sum(U12[::37, ::129])
        return acc

    @jax.jit
    def panel_fac(R):
        acc = jnp.float32(0)
        for k, w in STEPS:
            m_r = N - k
            panel = jax.lax.slice(R, (0, k), (m_r, k + w))
            piv, _, M, lu = factor_panel_raw(panel, jnp.ones(m_r, bool), w,
                                             block=128)
            acc += jnp.sum(lu[::17, ::19]) + jnp.sum(piv)
        return acc

    @jax.jit
    def compaction(R):
        acc = jnp.float32(0)
        Rc = R
        for k, w in STEPS:
            m_r = N - k
            if m_r - w <= 0:
                break
            idx = (jnp.arange(m_r - w, dtype=jnp.int32) * 7919) % (m_r - w)
            idx = jnp.sort(idx)
            Rc = Rc[idx]
            acc += Rc[0, 0]
        return acc

    @jax.jit
    def pivrows(R, F):
        acc = jnp.float32(0)
        for k, w in STEPS:
            m_r = N - k
            piv = (jnp.arange(w, dtype=jnp.int32) * 6151) % m_r
            Rpiv = R[piv]  # piv < m_r already; pre-slicing R copied 4 GB/step (OOM)
            if k > 0:
                F = jax.lax.dynamic_update_slice(F, Rpiv[:, :k], (k, 0))
            F = jax.lax.dynamic_update_slice(
                F, Rpiv[:, k : k + w], (k, k))
            # read a strided slice of the band to keep the dus chain live
            # WITHOUT returning the 4 GB F (in+out+output = 12 GB + gather
            # temps OOM'd twice; returning only acc stays under the cliff)
            acc += jnp.sum(F[k, ::257])
        return acc

    total = 0.0
    total += bench("gemm_panel", gemm_panel, R, F)
    total += bench("gemm_u12", gemm_u12, R, F)
    total += bench("trsm", trsm, R, F)
    total += bench("panel_fac", panel_fac, R)
    total += bench("pivrows", pivrows, R, F)
    # compaction last, with F freed: its in-jit old+new live-chain peaks
    # at ~11.6 GB on top of which a resident F would cross the HBM cliff
    del F
    total += bench("compaction", compaction, R)
    print(f"{'SUM':12s} {total*1e3:9.1f} ms   (vs 886 ms full kernel)",
          flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
