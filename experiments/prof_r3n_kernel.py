"""Standalone microbench of the rank-1 panel kernel after the MXU-matvec
extraction change, plus a CONFLUX_PANEL_SUB re-sweep: the old balance
(SUB=32 best, prof_sub_sweep) was set when per-iteration VPU reductions
dominated; with pv/ok/pivcol on the MXU the remaining VPU cost scales
differently and SUB=16 halves the FMA passes.

Each timing runs REPS kernel calls inside one jit chained through the
block (no CSE), on [128, m] f32 — the unforced headline shape.

Run: PYTHONPATH=/root/repo:/root/.axon_site CONFLUX_PANEL_SUB=32 nohup python experiments/prof_r3n_kernel.py > /tmp/prof_r3n.log 2>&1 &
"""

import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from conflux_tpu.ops.pallas_panel import _SUB, rank1_block_pallas_t

REPS = 8


def bench(m, w=128):
    @jax.jit
    def run(key):
        Mt = jax.random.normal(key, (w, m), jnp.float32)
        avail = jnp.ones((1, m), jnp.float32)

        def body(i, carry):
            Mt, avail = carry
            mt2, av2, piv, ok = rank1_block_pallas_t(Mt, avail)
            # re-arm: fresh avail, feed output back (serial dependence)
            return mt2, jnp.ones((1, m), jnp.float32) + 0 * av2

        Mt, avail = jax.lax.fori_loop(0, REPS, body, (Mt, avail))
        return jnp.sum(Mt[0])

    key = jax.random.key(5)
    try:
        float(run(key))
    except Exception as e:
        print(f"kernel m={m} SUB={_SUB}: FAIL {type(e).__name__} "
              f"{str(e)[:120]}", flush=True)
        return
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(key))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[1] / REPS
    print(f"kernel [128,{m}] SUB={_SUB}: {med*1e6:8.1f} us/call", flush=True)


def main():
    print(f"CONFLUX_PANEL_SUB={os.environ.get('CONFLUX_PANEL_SUB', '32')}",
          flush=True)
    for m in (32768, 16384, 8192):
        bench(m)
    print("done", flush=True)


if __name__ == "__main__":
    main()
