"""Split factor_panel's ~10 ms at the crout headline shape ([31744, 1024],
block=128) into its stages, each timed as its own jit with device-resident
inputs (the ~24-25 ms dispatch floor cancels between rows — read the DELTAS):

  T0 null        — floor reference (sum of the resident panel)
  T1 select      — _lu_select_loop_t only (transposed loop, 8 pallas calls
                   + 7 inter-block HIGHEST updates)
  T2 select+piv  — + _pivot_factors (forced [1024,1024] elimination)
  T3 full        — factor_panel (adds Pt.T transpose + M.at[piv].set)
  T4 k1          — ONE rank1_block_pallas_t call on the transposed block
  T5 interblk    — 7 synthetic inter-block updates (dots only, no kernel)

Also sweeps block in {128, 256, 512} on the full factor_panel.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_panel_split.py > /tmp/prof_panel_split.log 2>&1 &
"""

import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from conflux_tpu.ops.panel import (_lu_select_loop_t, _pivot_factors,
                                   factor_panel)
from conflux_tpu.ops.pallas_panel import rank1_block_pallas_t

M, W = 31744, 1024
REPS = 3
_PREC = jax.lax.Precision.HIGHEST


def timeit(tag, fn, *args):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    print(f"{tag:18s} {min(ts)*1e3:8.2f} ms", flush=True)
    return min(ts)


def main():
    key = jax.random.key(7)
    P = 5.0 + jax.random.uniform(key, (M, W), jnp.float32)
    Pt = P.T.copy()
    act = jnp.ones(M, bool)
    float(jnp.sum(P[0]) + jnp.sum(Pt[0]))

    timeit("T0 null", jax.jit(lambda P: jnp.sum(P)), P)

    @partial(jax.jit, static_argnums=())
    def sel(P, act):
        piv, ok, Qt = _lu_select_loop_t(P, act, W, forced=False, block=128)
        return jnp.sum(Qt) + piv[0], piv

    timeit("T1 select", sel, P, act)

    @jax.jit
    def selpiv(P, act):
        piv, ok, Qt = _lu_select_loop_t(P, act, W, forced=False, block=128)
        lu = _pivot_factors(P, piv, W, 128)
        return jnp.sum(Qt) + jnp.sum(lu), piv

    timeit("T2 select+piv", selpiv, P, act)

    @jax.jit
    def full(P, act):
        piv, ok, Mf = factor_panel(P, act, W, block=128)
        return jnp.sum(Mf) + piv[0]

    timeit("T3 full(128)", full, P, act)

    availf = jnp.ones((1, M), jnp.float32)

    @jax.jit
    def k1(Pt, availf):
        Bt = jax.lax.slice(Pt, (0, 0), (128, M))
        mt, av, piv, ok = rank1_block_pallas_t(Bt, availf, False, 0)
        return jnp.sum(mt) + piv[0]

    timeit("T4 one kernel", k1, Pt, availf)

    @jax.jit
    def interblk(Pt, availf):
        # synthetic: the 7 inter-block update dot sets at their real shapes
        s = 0.0
        lanes = jnp.arange(M)
        for b0 in range(0, W - 128, 128):
            b1 = b0 + 128
            Bt2 = jax.lax.slice(Pt, (b0, 0), (b1, M))
            T_t = jax.lax.slice(Pt, (b1, 0), (W, M))
            pivw = (jnp.arange(128, dtype=jnp.int32) * 7919 + b0) % M
            onehot = (lanes[None, :] == pivw[:, None]).astype(jnp.float32)
            Tpiv_t = jax.lax.dot_general(
                T_t, onehot, (((1,), (1,)), ((), ())), precision=_PREC)
            U12t = Tpiv_t  # stand-in for the small triangular solve
            Lmul_t = jnp.where(availf > 0, Bt2, 0.0)
            T_t = T_t - jnp.dot(U12t, Lmul_t, precision=_PREC)
            s += jnp.sum(T_t[0])
        return s

    timeit("T5 interblk dots", interblk, Pt, availf)

    for blk in (256, 512):
        @jax.jit
        def fullb(P, act, blk=blk):
            piv, ok, Mf = factor_panel(P, act, W, block=blk)
            return jnp.sum(Mf) + piv[0]

        timeit(f"T3 full({blk})", fullb, P, act)
    print("done", flush=True)


if __name__ == "__main__":
    main()
