"""Round-5 scatter isolation: prof_r5_scatter4 showed non-aliased /
contiguous DMA arms all land at ~2.1-2.4 ms per 1536x64KB move while the
aliased scattered-destination scatter sits at 8.8 ms. Which property
costs 4x? All arms are ONE grid program with a 16-deep round-robin DMA
pipeline (the fastest structure from probe 4), 16-iter in-jit chains.

  V1 aliased + scattered dst   (the real pushup op)
  V2 fresh-out + scattered dst (timing-only; output holes undefined)
  V3 aliased + contiguous dst  (slots = iota)
  V4 aliased + SORTED scattered dst

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
    experiments/prof_r5_scatter5.py > /tmp/prof_r5_scatter5.log 2>&1 &
"""

import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, NH, W = 32768, 16384, 1536
ITER = 16
DEPTH = 16


def _scatter1_kernel(w, slots_ref, src_ref, r_ref, out_ref, sems):
    del r_ref

    def mk(j):
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(j, 1)],
            out_ref.at[pl.ds(slots_ref[j], 1)],
            sems.at[j % DEPTH])

    for j in range(min(DEPTH, w)):
        mk(j).start()
    for j in range(DEPTH, w):
        mk(j - DEPTH).wait()
        mk(j).start()
    for j in range(max(0, w - DEPTH), w):
        mk(j).wait()


def scatter1(R, src, slots, aliased=True):
    m, n = R.shape
    w = src.shape[0]
    kw = {"input_output_aliases": {2: 0}} if aliased else {}
    out = pl.pallas_call(
        functools.partial(_scatter1_kernel, w),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                      pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((DEPTH,))],
        ),
        out_shape=jax.ShapeDtypeStruct((m, 1, n), R.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        **kw,
    )(slots, src.reshape(w, 1, n), R.reshape(m, 1, n))
    return out.reshape(m, n)


def run_chain(label, f, *args):
    jf = jax.jit(f)
    t0 = time.perf_counter()
    try:
        float(jf(*args))
    except Exception as e:
        print(f"{label}: FAIL {type(e).__name__} {str(e)[:200]}", flush=True)
        return
    comp = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jf(*args))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[1] / ITER
    print(f"{label}: {med*1e3:7.2f} ms/iter ({med/W*1e6:6.2f} us/row; "
          f"compile {comp:.0f}s)", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    R0 = jnp.asarray(rng.standard_normal((M, NH)), jnp.float32)
    src0 = jnp.asarray(rng.standard_normal((W, NH)), jnp.float32)
    rand_slots = jnp.stack([
        jnp.asarray(rng.choice(M, W, replace=False).astype(np.int32))
        for _ in range(ITER)])
    sort_slots = jnp.sort(rand_slots, axis=1)
    iota_slots = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None],
                                  (ITER, W))

    # correctness of scatter1 (small, aliased)
    Rs = jnp.array(R0[:1024, :512])
    exp = R0[:1024, :512].at[rand_slots[0, :64] % 1024].set(src0[:64, :512])
    got = scatter1(Rs, src0[:64, :512], rand_slots[0, :64] % 1024)
    print("correctness:", bool(jnp.array_equal(got, exp)), flush=True)

    def chain(slotss, aliased):
        def f(R, src, slotss):
            for t in range(ITER):
                R = jax.lax.dynamic_update_slice(
                    R, R[:8, :128] + 1.0, (0, (t * 128) % NH))
                R = scatter1(R, src, slotss[t], aliased=aliased)
            return jnp.sum(R[:2, :128])

        return f

    run_chain("V1 alias+rand  ", chain(rand_slots, True), jnp.array(R0),
              src0, rand_slots)
    run_chain("V2 fresh+rand  ", chain(rand_slots, False), jnp.array(R0),
              src0, rand_slots)
    run_chain("V3 alias+iota  ", chain(iota_slots, True), jnp.array(R0),
              src0, iota_slots)
    run_chain("V4 alias+sorted", chain(sort_slots, True), jnp.array(R0),
              src0, sort_slots)
    print("done", flush=True)
