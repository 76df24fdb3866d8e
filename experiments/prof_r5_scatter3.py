"""Round-5 scatter-kernel diagnosis: the v1 kernel (HBM->HBM per-row DMAs)
runs at ~6.5 us/row regardless of group size (prof_r5_scatter.py stage3 —
group-flat => serialized, not pipeline-depth-bound). Arms:

  A. gather_rows (non-aliased HBM->HBM)      — is ALIASING the serializer?
  B. scatter group=64/128                    — deeper pipeline, same path
  C. vmem-bounce gather: out block is a VMEM BlockSpec pipeline target,
     kernel issues per-row HBM->VMEM DMAs    — the canonical sparse-gather
  D. vmem-bounce scatter: src arrives via the BlockSpec VMEM pipeline,
     kernel issues per-row VMEM->HBM DMAs to scattered rows

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
    experiments/prof_r5_scatter3.py > /tmp/prof_r5_scatter3.log 2>&1 &
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

from conflux_tpu.ops.pallas_scatter import gather_rows, scatter_rows

M, NH, W = 32768, 16384, 1536


def timeit(fn, *args, reps=3, label=""):
    t0 = time.perf_counter()
    try:
        float(jnp.sum(fn(*args)[:2, :2]))
    except Exception as e:
        print(f"{label}: FAIL {type(e).__name__} {str(e)[:200]}", flush=True)
        return None
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)[:2, :2]))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{label}: {med*1e3:.2f} ms ({2*W*NH*4/med/1e9:.0f} GB/s, "
          f"{med/W*1e6:.2f} us/row; compile {compile_s:.0f}s)", flush=True)
    return med


# --- arm C: vmem-bounce gather ------------------------------------------
def _gbounce_kernel(group, idx_ref, src_hbm, out_vmem, sems):
    g = pl.program_id(0)
    for j in range(group):
        pltpu.make_async_copy(
            src_hbm.at[pl.ds(idx_ref[g * group + j], 1)],
            out_vmem.at[pl.ds(j, 1)],
            sems.at[j],
        ).start()
    for j in range(group):
        pltpu.make_async_copy(
            src_hbm.at[pl.ds(idx_ref[g * group + j], 1)],
            out_vmem.at[pl.ds(j, 1)],
            sems.at[j],
        ).wait()


@functools.partial(jax.jit, static_argnames=("group",))
def gather_bounce(R, idx, group: int = 8):
    m, n = R.shape
    w = idx.shape[0]
    R3 = R.reshape(m, 1, n)
    out = pl.pallas_call(
        functools.partial(_gbounce_kernel, group),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(w // group,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((group, 1, n), lambda g, *_: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((group,))],
        ),
        out_shape=jax.ShapeDtypeStruct((w, 1, n), R.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(idx, R3)
    return out.reshape(w, n)


# --- arm D: vmem-bounce scatter -----------------------------------------
def _sbounce_kernel(group, slots_ref, src_vmem, r_hbm, out_hbm, sems):
    del r_hbm
    g = pl.program_id(0)
    for j in range(group):
        pltpu.make_async_copy(
            src_vmem.at[pl.ds(j, 1)],
            out_hbm.at[pl.ds(slots_ref[g * group + j], 1)],
            sems.at[j],
        ).start()
    for j in range(group):
        pltpu.make_async_copy(
            src_vmem.at[pl.ds(j, 1)],
            out_hbm.at[pl.ds(slots_ref[g * group + j], 1)],
            sems.at[j],
        ).wait()


@functools.partial(jax.jit, static_argnames=("group",), donate_argnums=(0,))
def scatter_bounce(R, src, slots, group: int = 8):
    m, n = R.shape
    w = src.shape[0]
    out = pl.pallas_call(
        functools.partial(_sbounce_kernel, group),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(w // group,),
            in_specs=[
                pl.BlockSpec((group, 1, n), lambda g, *_: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((group,))],
        ),
        out_shape=jax.ShapeDtypeStruct((m, 1, n), R.dtype),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(slots, src.reshape(w, 1, n), R.reshape(m, 1, n))
    return out.reshape(m, n)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    R = jnp.asarray(rng.standard_normal((M, NH)), jnp.float32)
    src = jnp.asarray(rng.standard_normal((W, NH)), jnp.float32)
    slots = jnp.asarray(rng.choice(M, W, replace=False).astype(np.int32))
    idx = jnp.asarray(rng.choice(M, W, replace=False).astype(np.int32))

    # correctness of the new arms (small)
    Rs = R[:1024, :512]
    exp_c = Rs[idx[:64] % 1024]
    exp_d = Rs.at[slots[:64] % 1024].set(src[:64, :512])
    ok_c = bool(jnp.array_equal(gather_bounce(Rs, idx[:64] % 1024, group=8),
                                exp_c))
    ok_d = bool(jnp.array_equal(
        scatter_bounce(jnp.array(Rs), src[:64, :512], slots[:64] % 1024,
                       group=8), exp_d))
    print(f"correctness: gather_bounce {ok_c} scatter_bounce {ok_d}",
          flush=True)

    def chain(scatter, g, reps=8):
        @jax.jit
        def f(R, src, slots):
            for t in range(reps):
                R = jax.lax.dynamic_update_slice(
                    R, R[:8, :128] + 1.0, (0, (t * 128) % NH))
                R = scatter(R, src, slots, group=g)
            return R

        return lambda: f(jnp.array(R), src, slots)[:2, :2] * (1.0 / reps)

    # NOTE chain timings include one 2 GB donated copy (~5 ms) / 8 reps
    timeit(lambda: gather_rows(R, idx, group=8), label="A gather_hbm g=8")
    for g in (64,):
        timeit(chain(lambda R, s, sl, group: scatter_rows(R, s, sl, group),
                     g), label=f"B scatter_hbm chain/8 g={g}")
    for g in (8, 16, 64):
        timeit(lambda g=g: gather_bounce(R, idx, group=g),
               label=f"C gather_bounce g={g}")
    for g in (8, 16, 64):
        timeit(chain(lambda R, s, sl, group: scatter_bounce(R, s, sl,
                                                            group=group), g),
               label=f"D scatter_bounce chain/8 g={g}")
    print("done", flush=True)
