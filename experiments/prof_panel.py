"""Sweep the rank-1 block width of the panel factorization and re-measure
the flat LU. Panel-only timings loop the kernel 8x inside one jit (chained,
full-M-consuming — no DCE) to amortize the ~24 ms dispatch latency.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_panel.py > /tmp/prof_panel.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import conflux_tpu.ops.panel as panel_mod
from conflux_tpu.lu.single import _getrf_flat


def bench(name, fn, *args, reps=3, flops=None):
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
    extra = f"  {flops/t/1e12:6.2f} TF/s" if flops else ""
    print(f"{name:46s} {t*1e3:9.2f} ms{extra}  (compile {compile_s:.1f}s)",
          flush=True)
    return t


def main():
    rng = np.random.default_rng(42)
    m, v = 8192, 512
    P0 = jnp.asarray(rng.random((m, v), dtype=np.float32))
    REPS = 8

    def panel_loop(P, blk):
        # every output feeds the next input: nothing can be dead-code'd
        X = P
        for _ in range(REPS):
            piv, ok, M = panel_mod.factor_panel(X, jnp.ones(m, bool), v,
                                                block=blk)
            X = M + 1e-6 * piv.astype(jnp.float32)[None, :]
        return jnp.sum(X)

    for blk in (128, 64, 32, 16, 8):
        t = bench(f"panel [{m},{v}] x{REPS} _BLOCK={blk}",
                  jax.jit(lambda P, b=blk: panel_loop(P, b)), P0)
        print(f"    -> {(t*1e3-24)/REPS:.2f} ms/panel (dispatch-corrected)",
              flush=True)

    # full flat LU at candidate widths (bypass lu_factor's jit cache)
    n = 16384
    A = jnp.asarray(5.0 + rng.random((n, n), dtype=np.float32))
    fl = 2 / 3 * n**3
    for blk in (64, 32, 16):
        panel_mod._BLOCK = blk
        f = jax.jit(lambda A: (lambda F, p: (jnp.sum(F), p[0]))(
            *_getrf_flat(A, 512, "high")))
        bench(f"flat N={n} v=512 _BLOCK={blk}", f, A, flops=fl)
    best = 32
    panel_mod._BLOCK = best
    for vv in (1024, 256):
        f = jax.jit(lambda A, v=vv: (lambda F, p: (jnp.sum(F), p[0]))(
            *_getrf_flat(A, v, "high")))
        bench(f"flat N={n} v={vv} _BLOCK={best}", f, A, flops=fl)
    print("done", flush=True)


if __name__ == "__main__":
    main()
