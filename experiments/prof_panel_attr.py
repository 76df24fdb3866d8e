"""Panel-factorization attribution at the crout headline (N=32768,
v=1536, block=128): panel_fac is 273 ms of the 886 ms total
(prof_crout_components 2026-08-19) at ~6 TF/s effective, while the
trailing GEMMs run at 55-62 TF/s — the one component far from its
ceiling. Split it into its stages, each timed as ONE jit replaying all 21
steps' exact shapes (amortizes the ~24 ms dispatch latency):

  transpose  : panel.T materialization only        (HBM pass)
  select     : _lu_select_loop_t unforced           (12 Mosaic rank-1
               kernel calls + 11 inner / 2 outer deferred MXU updates)
  pivfac     : _pivot_factors                       (piv-row gather + a
               SECOND forced 1536-iteration elimination on [w, w])
  full       : factor_panel_raw                     (= select + pivfac)

If pivfac is a large share, the candidate fix is finishing the pivot
lanes inside the deferred updates (one extra U12 @ onehot MXU dot per
boundary) instead of re-eliminating them from scratch.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_panel_attr.py > /tmp/prof_panel_attr.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from conflux_tpu.ops.panel import (_lu_select_loop_t, _pivot_factors,
                                   factor_panel_raw)

N, V = 32768, 1536
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


def main():
    @jax.jit
    def mk(key):
        return 5.0 + jax.random.uniform(key, (N, N), jnp.float32)

    R = mk(jax.random.key(0))
    float(R[0, 0])

    @jax.jit
    def transpose(R):
        acc = jnp.float32(0)
        for k, w in STEPS:
            m_r = N - k
            panel = jax.lax.slice(R, (0, k), (m_r, k + w))
            Pt = panel.T + 0.0
            acc += jnp.sum(Pt[::257, ::129])
        return acc

    @jax.jit
    def select(R):
        acc = jnp.float32(0)
        for k, w in STEPS:
            m_r = N - k
            panel = jax.lax.slice(R, (0, k), (m_r, k + w))
            piv, _, Pt = _lu_select_loop_t(
                panel, jnp.ones(m_r, bool), w, forced=False, block=128)
            acc += jnp.sum(Pt[::17, ::257]) + jnp.sum(piv)
        return acc

    @jax.jit
    def pivfac(R):
        acc = jnp.float32(0)
        for k, w in STEPS:
            m_r = N - k
            panel = jax.lax.slice(R, (0, k), (m_r, k + w))
            piv = (jnp.arange(w, dtype=jnp.int32) * 6151) % m_r
            lu = _pivot_factors(panel, piv, w, block=128)
            acc += jnp.sum(lu[::17, ::19])
        return acc

    @jax.jit
    def full(R):
        acc = jnp.float32(0)
        for k, w in STEPS:
            m_r = N - k
            panel = jax.lax.slice(R, (0, k), (m_r, k + w))
            piv, _, M, lu = factor_panel_raw(panel, jnp.ones(m_r, bool), w,
                                             block=128)
            acc += jnp.sum(lu[::17, ::19]) + jnp.sum(piv)
        return acc

    total = 0.0
    total += bench("transpose", transpose, R)
    t_sel = bench("select", select, R)
    t_piv = bench("pivfac", pivfac, R)
    t_full = bench("full", full, R)
    print(f"{'select+piv':12s} {(t_sel+t_piv)*1e3:9.1f} ms   "
          f"(vs full {t_full*1e3:.1f} ms)", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
