"""Pallas TPU kernel for the rank-1 pivot-selection block.

The blocked panel factorization (ops/panel.py) is MXU GEMMs except for a
w-column rank-1 elimination loop; this kernel fuses that whole loop into one
Mosaic kernel with the block resident in VMEM and the pivot bookkeeping in
SMEM.

Layout: the block is processed TRANSPOSED — [w, m], columns of the panel as
sublane rows, matrix rows as lanes — because Mosaic cannot dynamically index
the lane (last) dimension:
  * extracting working column jj = one dynamic *sublane* slice (free);
  * writing the multipliers back to row jj = one sublane row write (free);
  * the availability/selection masks are [1, m] lane vectors (cheap ops);
  * the pivot lane is the only thing needing a masked reduction, and the
    elimination update is a single masked-FMA pass — so each of the w
    iterations costs ~2 passes over the [w, m] block instead of ~6 in the
    naive [m, w] orientation.

Replaces the role of `LAPACKE_dgetrf` in the reference's local panel step
(src/conflux/lu/conflux_opt.hpp:727 and tournament rounds :220-336).

HARD-WON RULES (see CLAUDE.md): no input_output_aliases (corrupts live
slices of enclosing arrays); declare output vma under shard_map.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget: transposed [w, m] f32 block in + out, plus lane-vector masks
# (2 x 128 x m x 4B: m = 65536 -> 64 MB + masks, inside the ~100 MB scoped
# limit — needed for the bf16-storage N=65536 single-chip factorization)
MAX_M = 65536


def _rank1_kernel(forced: bool, j0: int, in_mt_ref, in_avail_ref,
                  mt_ref, avail_ref, piv_ref, ok_ref):
    """in_mt_ref/mt_ref [w, m] f32 (transposed block); in_avail_ref/avail_ref
    [1, m] f32 lane masks (1.0 = selectable); piv_ref/ok_ref [1, w] i32 SMEM."""
    w, m = mt_ref.shape
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    subl = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)

    mt_ref[:, :] = in_mt_ref[:, :]
    avail_ref[:, :] = in_avail_ref[:, :]

    def body(jj, _):
        col = mt_ref[pl.ds(jj, 1), :]          # [1, m] — free sublane slice
        avail = avail_ref[:, :]                 # [1, m]
        if forced:
            p = jnp.asarray(j0 + jj, jnp.int32)
        else:
            score = jnp.where(avail > 0, jnp.abs(col), -jnp.inf)
            p = jnp.argmax(score).astype(jnp.int32)
        is_p = lanes == p                       # [1, m]
        piv_ref[0, jj] = p
        ok_ref[0, jj] = jnp.sum(jnp.where(is_p, avail, 0.0)).astype(jnp.int32)
        pv = jnp.sum(jnp.where(is_p, col, 0.0))
        safe = jnp.where(pv == 0, 1.0, pv)
        # eliminated lanes: available and not the pivot; multipliers masked
        mult = jnp.where((avail > 0) & ~is_p, col / safe, 0.0)  # [1, m]
        # pivot column (the pivot lane of every sublane row), rows > jj only
        M = mt_ref[:, :]
        pivcol = jnp.sum(jnp.where(is_p, M, 0.0), axis=1, keepdims=True)
        pivcol = jnp.where(subl > jj, pivcol, 0.0)              # [w, 1]
        mt_ref[:, :] = M - pivcol * mult        # one masked-FMA pass
        # row jj: store multipliers for eliminated lanes, keep values else
        elim = (avail > 0) & ~is_p
        mt_ref[pl.ds(jj, 1), :] = jnp.where(elim, mult, col)
        avail_ref[:, :] = jnp.where(is_p, 0.0, avail)
        return 0

    jax.lax.fori_loop(0, w, body, 0)


@functools.partial(jax.jit, static_argnames=("forced", "j0", "interpret"))
def rank1_block_pallas_t(Mt, avail_f, forced: bool = False, j0: int = 0,
                         interpret: bool = False):
    """Run the fused rank-1 block on an already-TRANSPOSED [w, m] block
    (panel columns as sublane rows). The transposed panel pipeline
    (ops/panel._lu_select_loop) keeps the whole panel in this orientation,
    so no per-block transposes happen at all.

    Mt [w, m] f32; avail_f [1, m] f32 (1.0 = active and unselected).
    Returns (Mt' [w, m], avail' [1, m], piv [w] i32, ok [w] i32).
    interpret=True runs the Mosaic kernel in the Pallas interpreter (CPU
    parity tests, tests/test_panel.py)."""
    w, m = Mt.shape
    vma_m = getattr(jax.typeof(Mt), "vma", None)
    vma_a = getattr(jax.typeof(avail_f), "vma", None)
    if vma_m is None and vma_a is None:
        kw = {}
    else:
        kw = {"vma": (vma_m or frozenset()) | (vma_a or frozenset())}
    mt, availo, piv, ok = pl.pallas_call(
        functools.partial(_rank1_kernel, forced, j0),
        out_shape=(
            jax.ShapeDtypeStruct((w, m), Mt.dtype, **kw),
            jax.ShapeDtypeStruct((1, m), jnp.float32, **kw),
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
        interpret=interpret,
    )(Mt, avail_f)
    return mt, availo, piv[0], ok[0]


def rank1_block_pallas(Mblk, avail_f, forced: bool = False, j0: int = 0,
                       interpret: bool = False):
    """Untransposed convenience wrapper: Mblk [m, w] -> (Mblk' [m, w], ...).
    Kept for interpret-mode parity tests; the panel pipeline calls
    `rank1_block_pallas_t` directly."""
    mt, availo, piv, ok = rank1_block_pallas_t(
        Mblk.T, avail_f, forced, j0, interpret
    )
    return mt.T, availo, piv, ok
