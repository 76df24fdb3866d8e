"""Pallas TPU kernel for the rank-1 pivot-selection block.

The blocked panel factorization (ops/panel.py) is MXU GEMMs except for a
w-column rank-1 elimination loop.  Expressed in jnp, each of the w iterations
dispatches ~8 separate device ops (dynamic slice, argmax, outer update, ...)
— tens of microseconds of launch latency apiece, which dominates the whole
factorization.  This kernel fuses the entire w-iteration loop into ONE
Mosaic kernel: the [m, w] block and the availability mask stay resident in
VMEM (aliased in/out, so the block is factored in place), the pivot
bookkeeping lives in SMEM, and the loop runs at VPU speed with zero
per-iteration launch cost.

TPU constraint notes:
  * Mosaic cannot dynamically index the lane (last) dimension, so the
    per-iteration column extraction and the pivot-row extraction are masked
    reductions over the whole VMEM-resident block instead of slices.
  * [m, 1] vectors pad to 128 lanes in VMEM, so masks are expensive; we keep
    exactly one (`avail` = active and not yet selected) and alias it in/out.

Replaces the role of `LAPACKE_dgetrf` in the reference's local panel step
(src/conflux/lu/conflux_opt.hpp:727 and tournament rounds :220-336).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget: [m, w] f32 block + [m, 128-padded] mask, aliased in/out
MAX_M = 8192


def _rank1_kernel(forced: bool, j0: int, in_m_ref, in_avail_ref,
                  m_ref, avail_ref, piv_ref, ok_ref):
    """in_m_ref [m, w] f32 / in_avail_ref [m, 1] int8 inputs; m_ref/avail_ref
    the corresponding outputs (int8 keeps the 128-lane padding at 1 byte/row;
    1 = selectable); piv_ref/ok_ref [1, w] i32 in SMEM.

    No in/out buffer aliasing: aliasing corrupted the surrounding XLA
    program when the operand was a live slice of a bigger array (observed as
    size-dependent factorization blow-ups at N=8192)."""
    m, w = m_ref.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    m_ref[:, :] = in_m_ref[:, :]
    avail_ref[:, :] = in_avail_ref[:, :]

    def body(jj, _):
        M = m_ref[:, :]
        # column jj via masked lane reduction (no dynamic lane indexing)
        col = jnp.sum(jnp.where(cols == jj, M, 0.0), axis=1, keepdims=True)
        # int8 VMEM vector: convert before comparing (Mosaic lacks direct
        # int8 lane-broadcast compares)
        av = avail_ref[:, :].astype(jnp.float32)
        valid = av > 0.0  # [m, 1]
        if forced:
            p = jnp.asarray(j0 + jj, jnp.int32)
        else:
            score = jnp.where(valid, jnp.abs(col), -jnp.inf)
            p = jnp.argmax(score).astype(jnp.int32)
        is_p = rows == p
        piv_ref[0, jj] = p
        ok_ref[0, jj] = jnp.sum(jnp.where(is_p, valid.astype(jnp.int32), 0))
        # pivot row / pivot value via masked sublane reductions
        pivrow = jnp.sum(jnp.where(is_p, M, 0.0), axis=0, keepdims=True)
        pv = jnp.sum(jnp.where(is_p, col, 0.0))
        safe = jnp.where(pv == 0, 1.0, pv)
        mult = col / safe
        elim = valid & ~is_p
        upd = M - mult * pivrow
        m_ref[:, :] = jnp.where(
            elim,
            jnp.where(cols > jj, upd, jnp.where(cols == jj, mult, M)),
            M,
        )
        avail_ref[:, :] = jnp.where(is_p, 0.0, av).astype(jnp.int8)
        return 0

    jax.lax.fori_loop(0, w, body, 0)


@functools.partial(jax.jit, static_argnames=("forced", "j0"))
def rank1_block_pallas(Mblk, avail_i8, forced: bool = False, j0: int = 0):
    """Run the fused rank-1 block in place.

    Mblk [m, w] f32; avail_i8 [m, 1] int8 (1 = active and unselected).
    Returns (Mblk', avail' [m, 1] int8, piv [w] i32, ok [w] i32)."""
    m, w = Mblk.shape
    # under shard_map with vma checking, pallas outputs must declare how they
    # vary across mesh axes: inherit the union of the inputs' vma
    vma = getattr(jax.typeof(Mblk), "vma", frozenset()) | getattr(
        jax.typeof(avail_i8), "vma", frozenset()
    )
    kw = {"vma": vma} if vma else {}
    out, availo, piv, ok = pl.pallas_call(
        functools.partial(_rank1_kernel, forced, j0),
        out_shape=(
            jax.ShapeDtypeStruct((m, w), Mblk.dtype, **kw),
            jax.ShapeDtypeStruct((m, 1), jnp.int8, **kw),
            jax.ShapeDtypeStruct((1, w), jnp.int32, **kw),
            jax.ShapeDtypeStruct((1, w), jnp.int32, **kw),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(Mblk, avail_i8)
    return out, availo, piv[0], ok[0]
