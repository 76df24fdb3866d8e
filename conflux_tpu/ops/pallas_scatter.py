"""Mosaic row-movement kernels: in-place scatter (and DMA gather) of FULL
rows at dynamic row indices.

Why these exist: XLA lowers a w-row 2-D scatter into a big buffer to a
serial loop plus a whole-buffer copy (the 'swap' compaction variant
measured +530 ms of copies at N=32768, experiments/prof_r3d.py), and a
`lax.fori_loop` of per-row dus calls is barred by the 2^32-byte-carry
compile kill (CLAUDE.md). But the operation itself is tiny — w rows of
contiguous memory to w scattered destinations — exactly what the DMA
engines do well. `scatter_rows` expresses it as a Pallas kernel whose
grid programs issue row-granularity HBM->HBM async copies, with the
destination row ids scalar-prefetched (pltpu.PrefetchScalarGridSpec) and
the output ALIASED to the input buffer, so the surrounding program keeps
one live [m, n] buffer and the scatter costs only ~2*w*n bytes of HBM
traffic.

This is the enabling kernel for the crout 'pushup' compaction
(lu/single.py): the push-up row movement of the reference's
first_non_pivot_row scheme (/root/reference/src/conflux/lu/
conflux_opt.hpp:176-218) with static shapes and DMA-rate movement,
replacing the ~250 ms/run live-row compaction gathers of the 'gather'
scheme (README headline anatomy) with ~w-row swaps per step.

Platform rules honored (CLAUDE.md):
  * whole-row granularity only — narrow gathers are descriptor-bound;
  * operands stay under the ~3.7e9-byte Mosaic ceiling (callers shard
    by columns; see lu/single._getrf_crout_pushup);
  * aliasing is only applied to whole carried buffers, never slices of
    a live array.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scatter_kernel(group: int, slots_ref, src_ref, r_ref, out_ref, sems):
    """Program g issues `group` row DMAs src[g*group+j] -> out[slots[...]]
    (start all, then wait all — the starts overlap so the per-descriptor
    issue latency is paid ~once per group, not per row)."""
    del r_ref  # same buffer as out_ref (aliased); never read
    g = pl.program_id(0)
    for j in range(group):
        i = g * group + j
        pltpu.make_async_copy(
            src_ref.at[pl.ds(i, 1)],
            out_ref.at[pl.ds(slots_ref[i], 1)],
            sems.at[j],
        ).start()
    for j in range(group):
        i = g * group + j
        pltpu.make_async_copy(
            src_ref.at[pl.ds(i, 1)],
            out_ref.at[pl.ds(slots_ref[i], 1)],
            sems.at[j],
        ).wait()


def scatter_rows(R: jnp.ndarray, src: jnp.ndarray, slots: jnp.ndarray,
                 group: int = 8) -> jnp.ndarray:
    """R[slots[i], :] = src[i, :], IN PLACE (the returned array aliases R —
    callers must treat R as consumed, like the donated buffer it is).

    slots must be unique and in [0, m); rows are moved whole. Entries that
    should be no-ops must be encoded by the caller as self-writes
    (src[i] == R[slots[i]]) — the kernel has no masking, by design (a
    mask would force per-row control flow into the DMA stream)."""
    w, n = src.shape
    m, n2 = R.shape
    assert n == n2 and src.dtype == R.dtype, (src.shape, R.shape)
    assert w % group == 0, (w, group)
    # rank-3 view [rows, 1, n]: Mosaic tiles the two MINOR dims of a memref
    # and rejects 1-row slices of a tiled dim — lifting the row axis out of
    # the tiled pair makes per-row dynamic slicing legal. Keeping the WHOLE
    # row as the minor dim makes each row one contiguous DMA descriptor
    # (an [m, n/128, 128] view measured 13 GB/s — 128 512-byte descriptors
    # per row, ~76 ns/descriptor issue-bound; /tmp/prof_r5_scatter.log).
    # The reshape only inserts a unit dim, so it is a free bitcast.
    assert n % 128 == 0, n
    R = R.reshape(m, 1, n)
    src = src.reshape(w, 1, n)
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, group),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(w // group,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((group,))],
        ),
        out_shape=jax.ShapeDtypeStruct(R.shape, R.dtype),
        # arg order is (slots, src, R): R is flat input 2
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=2 * w * n * R.dtype.itemsize,
            transcendentals=0,
        ),
    )(slots, src, R)
    return out.reshape(m, n)


def _gather_kernel(group: int, idx_ref, src_ref, out_ref, sems):
    g = pl.program_id(0)
    for j in range(group):
        i = g * group + j
        pltpu.make_async_copy(
            src_ref.at[pl.ds(idx_ref[i], 1)],
            out_ref.at[pl.ds(i, 1)],
            sems.at[j],
        ).start()
    for j in range(group):
        i = g * group + j
        pltpu.make_async_copy(
            src_ref.at[pl.ds(idx_ref[i], 1)],
            out_ref.at[pl.ds(i, 1)],
            sems.at[j],
        ).wait()


def gather_rows(R: jnp.ndarray, idx: jnp.ndarray,
                group: int = 8) -> jnp.ndarray:
    """out[i, :] = R[idx[i], :] — the DMA-engine form of a full-width row
    gather (idx entries must be in [0, m)). Kept alongside `scatter_rows`
    as the non-aliased fallback path: if the aliased scatter chain ever
    regresses on a future toolchain, per-step compaction can route
    through this at DMA rate instead of XLA's gather HLO."""
    m, n = R.shape
    w = idx.shape[0]
    assert w % group == 0, (w, group)
    assert n % 128 == 0, n
    R = R.reshape(m, 1, n)  # rank-3 whole-row view (see scatter_rows)
    out = pl.pallas_call(
        functools.partial(_gather_kernel, group),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(w // group,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((group,))],
        ),
        out_shape=jax.ShapeDtypeStruct((w, 1, n), R.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=2 * w * n * R.dtype.itemsize,
            transcendentals=0,
        ),
    )(idx, R)
    return out.reshape(w, n)
