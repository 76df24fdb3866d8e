"""Pallas TPU tiled matmul — the trailing-update (Schur complement) GEMM as
an explicit Mosaic kernel, benchmarked against XLA's `dot_general`
(SURVEY.md §7 stage 4: "benchmark against dot_general and keep whichever
wins per shape").

Measured on v5e (experiments/prof_pallas_gemm.py + prof_pallas_prec.py,
recorded in results/pallas_gemm.csv): XLA's dot_general wins at every
trailing-update shape. CAVEAT from the precision probe: Mosaic lowers an
f32 x f32 `jnp.dot` with preferred f32 to a SINGLE bf16 MXU pass (max rel
err 2.5e-3 == plain bf16), which is why it looked faster than XLA's
bf16x3 HIGH at square shapes — it computes less. `ops.tri.schur_dot`
therefore keeps using dot_general; this kernel serves as the recorded
baseline and as scaffolding for future fused epilogues (subtract-in-place,
masking) that dot_general cannot express.

Replaces the role of the reference's cblas_dgemm trailing update
(src/conflux/lu/conflux_opt.hpp:1626-1634) when fusion wins.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm_kernel(nk: int, a_ref, b_ref, o_ref, acc_ref):
    """Grid (M/bm, N/bn, K/bk): accumulate a [bm, bk] x [bk, bn] product
    into a VMEM f32 accumulator; write out on the last K step."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    acc_ref[:, :] += jnp.dot(
        a_ref[:, :], b_ref[:, :], preferred_element_type=jnp.float32
    )

    @pl.when(k == nk - 1)
    def _():
        o_ref[:, :] = acc_ref[:, :].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk"))
def matmul_pallas(a: jnp.ndarray, b: jnp.ndarray,
                  bm: int = 512, bn: int = 512, bk: int = 512) -> jnp.ndarray:
    """C = A @ B with f32 accumulation (A/B f32 or bf16). Shapes must tile
    evenly by (bm, bn, bk)."""
    m, k = a.shape
    k2, n = b.shape
    assert k == k2 and m % bm == 0 and n % bn == 0 and k % bk == 0
    nk = k // bk
    return pl.pallas_call(
        functools.partial(_mm_kernel, nk),
        grid=(m // bm, n // bn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=(m * k + k * n) * a.dtype.itemsize + m * n * 4,
            transcendentals=0,
        ),
    )(a, b)
