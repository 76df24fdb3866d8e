"""Round-5 scatter diagnosis v2 — prof_r5_scatter3 timed eagerly (one
~24 ms tunnel dispatch per op) and its numbers are garbage; every arm here
is a 16-iteration IN-JIT chain with a scalar fence, matching the protocol
that measured the v1 scatter at 8.85 ms / 1536 rows (5.8 us/row).

Questions:
  Q1 does a NON-aliased DMA kernel (gather_rows) pay the same per-row
     cost?  -> if yes, it's DMA issue overhead, not aliasing.
  Q2 is one big contiguous DMA fast in-kernel? (raw bandwidth arm)
  Q3 do HBM->VMEM (bounce) row DMAs go faster than HBM->HBM?
  Q4 how does rows-per-DMA scale? (contig arm at 1/8/64 rows per DMA)
  Q5 XLA's own row gather of the same rows (the 0.2 us/row reference).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
    experiments/prof_r5_scatter4.py > /tmp/prof_r5_scatter4.log 2>&1 &
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
ITER = 16


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
    print(f"{label}: {med*1e3:7.2f} ms/iter "
          f"({2*W*NH*4/med/1e9:6.0f} GB/s, {med/W*1e6:6.2f} us/row; "
          f"compile {comp:.0f}s)", flush=True)


def _contig_kernel(rows_per, nd, src_ref, out_ref, sems):
    # nd DMAs, each moving a contiguous [rows_per, 1, n] block; 16 in
    # flight (round-robin semaphores)
    def mk(j):
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(j * rows_per, rows_per)],
            out_ref.at[pl.ds(j * rows_per, rows_per)],
            sems.at[j % 16])

    for j in range(min(16, nd)):
        mk(j).start()
    for j in range(16, nd):
        mk(j - 16).wait()
        mk(j).start()
    for j in range(max(0, nd - 16), nd):
        mk(j).wait()


@functools.partial(jax.jit, static_argnames=("rows_per",))
def contig_copy(src, rows_per: int):
    w, n = src.shape
    nd = w // rows_per
    out = pl.pallas_call(
        functools.partial(_contig_kernel, rows_per, nd),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((16,))],
        ),
        out_shape=jax.ShapeDtypeStruct((w, 1, n), src.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(src.reshape(w, 1, n))
    return out.reshape(w, n)


def _gb_kernel(group, idx_ref, src_hbm, out_vmem, sems):
    g = pl.program_id(0)
    for j in range(group):
        pltpu.make_async_copy(
            src_hbm.at[pl.ds(idx_ref[g * group + j], 1)],
            out_vmem.at[pl.ds(j, 1)], sems.at[j]).start()
    for j in range(group):
        pltpu.make_async_copy(
            src_hbm.at[pl.ds(idx_ref[g * group + j], 1)],
            out_vmem.at[pl.ds(j, 1)], sems.at[j]).wait()


def gather_bounce(R, idx, group: int = 8):
    m, n = R.shape
    w = idx.shape[0]
    out = pl.pallas_call(
        functools.partial(_gb_kernel, group),
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
    )(idx, R.reshape(m, 1, n))
    return out.reshape(w, n)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    R0 = jnp.asarray(rng.standard_normal((M, NH)), jnp.float32)
    src0 = jnp.asarray(rng.standard_normal((W, NH)), jnp.float32)
    idxs = jnp.stack([
        jnp.asarray(rng.choice(M, W, replace=False).astype(np.int32))
        for _ in range(ITER)])

    def fence(x):
        return jnp.sum(x[:2, :128])

    # Q5: XLA's own row gather (64 KB rows)
    def xla_chain(R, idxs):
        s = 0.0
        for t in range(ITER):
            s = s + fence(R[idxs[t]])
        return s

    run_chain("Q5 xla_gather     ", xla_chain, R0, idxs)

    # Q1: non-aliased HBM->HBM kernel gather
    def g_chain(R, idxs):
        s = 0.0
        for t in range(ITER):
            s = s + fence(gather_rows(R, idxs[t], group=8))
        return s

    run_chain("Q1 gather_hbm g=8 ", g_chain, R0, idxs)

    # Q3: HBM->VMEM bounce gather
    for g in (8, 32):
        def b_chain(R, idxs, g=g):
            s = 0.0
            for t in range(ITER):
                s = s + fence(gather_bounce(R, idxs[t], group=g))
            return s

        run_chain(f"Q3 gather_vmem g={g:<2d}", b_chain, R0, idxs)

    # Q4: contiguous copies at 1 / 8 / 64 rows per DMA (issue-rate curve)
    big = jnp.asarray(rng.standard_normal((W, NH)), jnp.float32)
    for rp in (1, 8, 64):
        def c_chain(srcv, rp=rp):
            s = 0.0
            for t in range(ITER):
                s = s + fence(contig_copy(srcv * (1.0 + t), rows_per=rp))
            return s

        run_chain(f"Q4 contig rp={rp:<3d}  ", c_chain, big)

    # scatter with deep grouping (pipeline depth probe at g=128)
    def s_chain(R, src, idxs):
        for t in range(ITER):
            R = scatter_rows(R, src * (1.0 + t), idxs[t], group=128)
            R = jax.lax.dynamic_update_slice(R, R[:8, :128] + 1.0, (0, 0))
        return fence(R)

    run_chain("S  scatter g=128  ", s_chain, jnp.array(R0), src0, idxs)
    print("done", flush=True)
