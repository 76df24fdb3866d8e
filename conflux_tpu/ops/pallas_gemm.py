"""Pallas TPU tiled matmul — the trailing-update (Schur complement) GEMM as
an explicit Mosaic kernel, benchmarked against XLA's `dot_general`
(SURVEY.md §7 stage 4: "benchmark against dot_general and keep whichever
wins per shape").

Round-2's per-shape verdict ("dot_general wins everywhere",
results/pallas_gemm.csv) was latency-contaminated; the round-3 K-amortized
probes (experiments/prof_k_sweep.py, prof_hbm_mxu.py) show XLA's
subtract-accumulate dot is operand-re-read bound at the trailing shapes
(17-25 TF/s, flat in K) while `schur_update_pallas` below reaches
36.5 TF/s 'high'. CAVEAT that still holds: Mosaic lowers an f32 x f32
`jnp.dot` with preferred f32 to a SINGLE bf16 MXU pass (max rel err
2.5e-3 == plain bf16) — precision emulation must be explicit (the hi/lo
split in `_acc_kernel`, or precision=HIGHEST on small dots).

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


# ----------------------------------------------------------------------------
# Fused trailing-update accumulate: R[:, c0:] -= A @ B in ONE kernel
# ----------------------------------------------------------------------------

def _acc_kernel(a_ref, b_ref, r_ref, o_ref):
    """One output tile of R -= A @ B, single MXU pass: a_ref [bm, k] /
    b_ref [k, bn] arrive ALREADY bf16 (callers pre-cast — 2-byte tiles),
    r_ref / o_ref [bm, bn] (o_ref may be bfloat16 — the bf16-STORAGE
    mode's once-per-step rounding)."""
    s = jnp.dot(a_ref[:, :], b_ref[:, :],
                preferred_element_type=jnp.float32)
    o_ref[:, :] = (r_ref[:, :].astype(jnp.float32) - s).astype(o_ref.dtype)


def _acc_kernel_x3(ah_ref, al_ref, bh_ref, bl_ref, r_ref, o_ref):
    """bf16x3 (Precision.HIGH, lo*lo dropped) variant of _acc_kernel. The
    hi/lo split happens ONCE in the caller (`_split_hi_lo`) and the four
    halves arrive as separate bf16 operands: in-kernel f32 tiles +
    conversion temporaries pushed the 'high'-mode kernel 84 KB over this
    toolchain's 16 MB scoped-VMEM stack limit at (bm=512, k=1024), and
    recomputing the split per output tile wasted VPU work; pre-split bf16
    tiles also halve operand HBM traffic vs f32 reads."""
    s = jnp.dot(ah_ref[:, :], bh_ref[:, :],
                preferred_element_type=jnp.float32)
    s += jnp.dot(ah_ref[:, :], bl_ref[:, :],
                 preferred_element_type=jnp.float32)
    s += jnp.dot(al_ref[:, :], bh_ref[:, :],
                 preferred_element_type=jnp.float32)
    o_ref[:, :] = (r_ref[:, :].astype(jnp.float32) - s).astype(o_ref.dtype)


def _split_hi_lo(x: jnp.ndarray):
    """bf16x3 operand split: x ~= hi + lo with both halves bf16 (hi carries
    the top 8 mantissa bits, lo the next 8) — same decomposition
    Precision.HIGH uses, done once per operand instead of per tile.

    The rounding MUST go through lax.reduce_precision, not an
    astype(bf16)/astype(f32) round-trip: this platform forces
    `--xla_allow_excess_precision=true`, under which XLA's algebraic
    simplifier folds the up-convert of a down-convert and `x - hi`
    becomes exactly zero — both correction passes silently vanish and
    'high' degrades to plain bf16 (measured on-chip: kernel relerr
    1.7e-3 == single-pass, vs 9e-6 for Precision.HIGH; the e2e LU
    residual gate failed at 3e-6 normalized). reduce_precision is the
    op XLA guarantees not to elide."""
    hi_f32 = jax.lax.reduce_precision(x, 8, 7)
    lo = (x - hi_f32).astype(jnp.bfloat16)
    return hi_f32.astype(jnp.bfloat16), lo


def _acc_bigk_kernel(nk: int, a_ref, b_ref, r_ref, o_ref, acc_ref):
    """Big-K variant of _acc_kernel: grid (M/bm, N/bn, K/bk) accumulates
    partial products in a VMEM f32 scratch; the R tile is subtracted on
    the last K step (R is only read once per output tile). Operands
    arrive pre-cast bf16 (single-pass modes)."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    acc_ref[:, :] += jnp.dot(a_ref[:, :], b_ref[:, :],
                             preferred_element_type=jnp.float32)

    @pl.when(kk == nk - 1)
    def _():
        o_ref[:, :] = (r_ref[:, :].astype(jnp.float32)
                       - acc_ref[:, :]).astype(o_ref.dtype)


def _acc_bigk_kernel_x3(nk: int, ah_ref, al_ref, bh_ref, bl_ref, r_ref,
                        o_ref, acc_ref):
    """bf16x3 big-K variant: pre-split hi/lo operands (see _acc_kernel_x3
    for why the split lives in the caller)."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    acc_ref[:, :] += (
        jnp.dot(ah_ref[:, :], bh_ref[:, :],
                preferred_element_type=jnp.float32)
        + jnp.dot(ah_ref[:, :], bl_ref[:, :],
                  preferred_element_type=jnp.float32)
        + jnp.dot(al_ref[:, :], bh_ref[:, :],
                  preferred_element_type=jnp.float32)
    )

    @pl.when(kk == nk - 1)
    def _():
        o_ref[:, :] = (r_ref[:, :].astype(jnp.float32)
                       - acc_ref[:, :]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("mode", "bm", "bn", "bk"))
def sub_matmul_pallas_bigk(R: jnp.ndarray, A: jnp.ndarray, B: jnp.ndarray,
                           mode: str = "high", bm: int = 512,
                           bn: int = 512, bk: int = 512) -> jnp.ndarray:
    """R - A @ B for LARGE K (the left-looking update shape: K grows with
    the step, [m, k] x [k, w] against a narrow output): K is a grid
    dimension with a VMEM accumulator, so operand tiles stay [bm, bk] /
    [bk, bn] regardless of K — the whole-K operand tiles of
    `schur_update_pallas` cap it at k <= ~4096. The fused subtract keeps
    the single R read/write of the flat kernels' update-then-gather flow.
    mode: 'high' (bf16x3) or 'bf16'/'bf16out' (single pass); output dtype
    follows R (bf16 R = bf16-STORAGE rounding, once per call).

    DECIDED — NOT ROUTED (r4 e2e A/B, results/r4_experiments.md): with
    the pallas-chain breaker in place the full crout N=32768 'high'
    headline measured 975.6 ms through this kernel vs 856.9 ms through
    XLA dot_general; the former CONFLUX_CROUT_BIGK routing in lu/single
    was removed. Kept for kernel-level A/B (results/pallas_gemm.csv) and
    as the K-gridded accumulator reference pattern."""
    m, n = R.shape
    k = A.shape[1]
    assert A.shape == (m, k) and B.shape == (k, n)
    assert m % bm == 0 and n % bn == 0 and k % bk == 0, (m, n, k)
    passes = 1 if mode in ("bf16", "bf16out") else 3
    nk = k // bk
    a_spec = pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                          memory_space=pltpu.VMEM)
    if passes == 1:
        # pre-round once -> 2-byte operand tiles (see schur_update_pallas)
        operands = [A.astype(jnp.bfloat16), B.astype(jnp.bfloat16)]
        in_specs = [a_spec, b_spec]
        kernel = functools.partial(_acc_bigk_kernel, nk)
    else:
        operands = [*_split_hi_lo(A), *_split_hi_lo(B)]
        in_specs = [a_spec, a_spec, b_spec, b_spec]
        kernel = functools.partial(_acc_bigk_kernel_x3, nk)
    operands.append(R)
    in_specs.append(pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                                 memory_space=pltpu.VMEM))
    vmas = [getattr(jax.typeof(x), "vma", None) for x in operands]
    if all(v is None for v in vmas):
        kw = {}
    else:
        union = frozenset().union(*(v or frozenset() for v in vmas))
        kw = {"vma": union}
        operands = [
            x if not (missing := tuple(union - (v or frozenset())))
            else jax.lax.pvary(x, missing)
            for x, v in zip(operands, vmas)
        ]
    return pl.pallas_call(
        kernel,
        grid=(m // bm, n // bn, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), R.dtype, **kw),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(*operands)


@functools.partial(jax.jit,
                   static_argnames=("c0", "mode", "bm", "bn", "c1"))
def schur_update_pallas(R: jnp.ndarray, A: jnp.ndarray, B: jnp.ndarray,
                        c0: int, mode: str = "high",
                        bm: int = 512, bn: int = 512,
                        c1: int = 0) -> jnp.ndarray:
    """R[:, c0:] -= A @ B with everything fused in one Mosaic kernel:
    R [m, ncols] f32 (returned updated; columns < c0 pass through
    untouched), A [m, k] f32, B [k, ncols-c0] f32.

    Why: XLA materializes S = A @ B to HBM and then runs a separate
    subtract fusion — at the flat LU's trailing shapes (K = v = 1024,
    huge m x n output) the measured ceiling is 24.8 TF/s single-pass bf16
    vs 137.8 TF/s for a compute-bound GEMM (experiments/prof_hbm_mxu.py):
    the update is output-traffic- and tiling-bound, not MXU-bound. This
    kernel reads each R tile once, accumulates the product in VMEM with
    a hi/lo bf16 split (mode 'high': 3 MXU passes ~ Precision.HIGH;
    'bf16'/'bf16out-free': 1 pass), and RETURNS THE [m, nt] TRAILING BLOCK
    as a fresh buffer — the caller splices it back with one dus. Aliased
    in-place output was faster on paper but chaining aliased custom calls
    through one buffer reproducibly kills this platform's compile helper
    (exit code 1 within seconds, /tmp/schur_pallas2.log) even with ops in
    between. The operand re-reads, not the output traffic, are the
    measured bottleneck (time ~ K at fixed m,n: experiments/prof_k_sweep),
    so the fresh output + dus keeps most of the win.

    Requires m % bm == 0, c0 % bn == 0, (ncols-c0) % bn == 0 and
    k <= ~4096 (the [bm, k] + [k, bn] operand tiles must fit VMEM);
    callers fall back to schur_dot otherwise."""
    m, ncols = R.shape
    k = A.shape[1]
    c1 = c1 or ncols
    nt = c1 - c0
    assert m % bm == 0 and c0 % bn == 0 and nt % bn == 0, (m, c0, nt)
    assert A.shape == (m, k) and B.shape == (k, nt)
    passes = 1 if mode in ("bf16", "bf16out") else 3
    a_spec = pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((k, bn), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    if passes == 1:
        # single-pass modes round the operands to bf16 anyway — cast ONCE
        # here so the kernel's [bm, k]/[k, bn] tiles move 2 bytes/element;
        # bit-identical results
        operands = [A.astype(jnp.bfloat16), B.astype(jnp.bfloat16)]
        in_specs = [a_spec, b_spec]
        kernel = _acc_kernel
    else:
        # bf16x3: pre-split hi/lo in the caller (see _acc_kernel_x3) —
        # four bf16 operands instead of two f32 ones
        operands = [*_split_hi_lo(A), *_split_hi_lo(B)]
        in_specs = [a_spec, a_spec, b_spec, b_spec]
        kernel = _acc_kernel_x3
    joff = c0 // bn
    grid = (m // bm, nt // bn)
    # under shard_map the output must declare the union of the operands'
    # varying-manual-axes (same rule as ops/pallas_panel), and the
    # OPERANDS must agree too — the in-kernel dots fail vma checks on a
    # mix (e.g. a replicated B against an x-varying R): pvary-lift all
    # of them to the union
    operands.append(R)
    in_specs.append(pl.BlockSpec((bm, bn),
                                 lambda i, j, joff=joff: (i, j + joff),
                                 memory_space=pltpu.VMEM))
    vmas = [getattr(jax.typeof(x), "vma", None) for x in operands]
    if all(v is None for v in vmas):
        kw = {}
    else:
        union = frozenset().union(*(v or frozenset() for v in vmas))
        kw = {"vma": union}
        operands = [
            x if not (missing := tuple(union - (v or frozenset())))
            else jax.lax.pvary(x, missing)
            for x, v in zip(operands, vmas)
        ]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, nt), R.dtype, **kw),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(*operands)
    return jax.lax.dynamic_update_slice(R, out, (0, c0))
