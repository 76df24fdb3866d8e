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
  * the pivot lane is the only thing needing a masked reduction.

TWO-LEVEL structure (the round-3 MFU fix): the per-iteration rank-1 FMA is
restricted to the current _SUB-wide micro-panel (an [_SUB, m] VPU pass
instead of [w, m]), and the rows of later micro-panels receive one deferred
MXU update per micro-panel boundary — the same pivot-lane-extraction /
inv(L11) / multiplier-outer-product math as the XLA-level inter-block
update (ops/panel._lu_select_loop_t), applied one level deeper and fully
inside VMEM. The single-level kernel was VPU-compute-bound: 268 us per
[128, 32768] call = w * w * m * 2 FLOPs at ~4 TF/s, 137 ms of the 925 ms
N=32768 'high' factorization (/tmp/trace32k.log); two-level cuts the VPU
work w/_SUB = 16x and moves the rest to the MXU.

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

# micro-panel width: rank-1 VPU passes touch [_SUB, m]; every _SUB
# iterations one deferred MXU update fixes the remaining rows. Total MXU
# FLOPs per call (4 w^2 m) are independent of _SUB; VPU work scales with
# it, and the per-boundary latency of the ~9 serially-dependent small dots
# scales with w/_SUB — the sweep knob (experiments/prof_sub_sweep.py).
import os as _os

# swept on v5e end-to-end (experiments/prof_sub_sweep.py, flat LU 'high'
# v=1024): SUB=8: 69.9/223.0 ms (N=8192/16384), 16: 61.6/198.9,
# 32: 59.9/191.5, 64: 59.6/192.5 — the per-boundary latency of the ~9
# serially-dependent deferred dots dominates below 32
_SUB = int(_os.environ.get("CONFLUX_PANEL_SUB", "32"))

# THREE-LEVEL leaf width: each rank-1 step's VPU read-modify-write is
# restricted to a [_LEAF, m] slice; one masked micro-panel-width MXU
# update per leaf boundary fixes the rest of the [_SUB, m] micro-panel.
# The kernel is VMEM-bandwidth-bound on the per-step [_SUB, m] RMW + the
# [_SUB, m] pivot-lane extraction read (~1.4 GB/call at w=128 m=17408 —
# 545 us/call measured, experiments/prof_panel_attr2.py kchain252).
# MEASURED LOSER at _LEAF=8 (v5e 2026-08-20, experiments/prof_r3v_leaf.py:
# 626 us/call vs 545 two-level; e2e crout N=32768 909.8 ms vs 886): the
# 3 extra short serially-dependent deferred-dot chains per micro-panel
# cost more than the 4x RMW-slice cut saves. Default 0 = two-level
# (disabled); the knob stays for A/B at other shapes.
_LEAF = int(_os.environ.get("CONFLUX_PANEL_LEAF", "0"))


def _dotg(a, b, dims):
    return jax.lax.dot_general(
        a, b, (dims, ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _rank1_kernel(forced: bool, finish: bool, j0: int, in_mt_ref,
                  in_avail_ref, mt_ref, avail_ref, piv_ref, ok_ref):
    """in_mt_ref/mt_ref [w, m] f32 (transposed block); in_avail_ref/avail_ref
    [1, m] f32 lane masks (1.0 = selectable); piv_ref/ok_ref [1, w] i32 SMEM.

    Structured as ONE fori_loop over _SUB-wide micro-panels (body shared by
    every micro-panel, deferred update full-width with a sublane-row mask):
    a statically unrolled version with exact [w-s1, m] deferred shapes
    produced ~16x more MLIR per kernel instance, and with ~32 distinct
    panel heights in an N=32768 program the remote compile helper got
    OOM-killed (SIGKILL, /tmp/bench_r3f.log). The row mask costs <=2x the
    optimal deferred-dot FLOPs — on the MXU, noise next to the 16x VPU cut.
    """
    w, m = mt_ref.shape
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    rows_w = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    eye = (jax.lax.broadcasted_iota(jnp.int32, (_SUB, _SUB), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (_SUB, _SUB), 1)
           ).astype(jnp.float32)

    mt_ref[:, :] = in_mt_ref[:, :]
    avail_ref[:, :] = in_avail_ref[:, :]

    def rank1(jloc, s0, b):
        """One masked-argmax rank-1 step updating only the rows [s0, s0+b)
        of the current leaf/micro-panel; deferred rows are fixed by the
        MXU updates below."""
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)
        jj = s0 + jloc
        col = mt_ref[pl.ds(jj, 1), :]          # [1, m] — free sublane slice
        avail = avail_ref[:, :]                 # [1, m]
        if forced:
            p = jnp.asarray(j0 + jj, jnp.int32)
        else:
            score = jnp.where(avail > 0, jnp.abs(col), -jnp.inf)
            p = jnp.argmax(score).astype(jnp.int32)
        is_p = lanes == p                       # [1, m]
        piv_ref[0, jj] = p
        Msub = mt_ref[pl.ds(s0, b), :]          # [b, m]
        # pivot-lane extraction via EXACT one-hot MXU matvecs (HIGHEST on a
        # 0/1 operand is lossless — same argument as the deferred Tpiv/G
        # dots): pivcol[r] = Msub[r, p], availp = avail[p], pv = col[p] ==
        # pivcol[jloc]. Replaces three full-lane VPU masked reductions per
        # iteration — the serial-latency hot path (107.6 ms over 260
        # unforced calls at the N=32768 headline, /tmp/jaxtrace_crout).
        is_pf = is_p.astype(jnp.float32)        # [1, m]
        pivcol = _dotg(Msub, is_pf, ((1,), (1,)))                  # [b, 1]
        availp = _dotg(avail, is_pf, ((1,), (1,)))                 # [1, 1]
        ok_ref[0, jj] = jnp.sum(availp).astype(jnp.int32)
        # pv = pivcol[jloc] (col IS Msub row jloc); Mosaic cannot
        # dynamic_slice a value, so select via a [b, 1] masked reduce
        pv = jnp.sum(jnp.where(sub_iota == jloc, pivcol, 0.0))
        safe = jnp.where(pv == 0, 1.0, pv)
        # eliminated lanes: available, not the pivot; multipliers masked
        mult = jnp.where((avail > 0) & ~is_p, col / safe, 0.0)     # [1, m]
        pivcol = jnp.where(sub_iota > jloc, pivcol, 0.0)           # [b, 1]
        mt_ref[pl.ds(s0, b), :] = Msub - pivcol * mult
        # row jj: store multipliers for eliminated lanes, keep values else
        mt_ref[pl.ds(jj, 1), :] = jnp.where((avail > 0) & ~is_p, mult, col)
        avail_ref[:, :] = jnp.where(is_p, 0.0, avail)

    leafing = 0 < _LEAF < _SUB and _SUB % _LEAF == 0
    if leafing:
        rows_sub = jax.lax.broadcasted_iota(jnp.int32, (_SUB, 1), 0)
        eye_leaf = (jax.lax.broadcasted_iota(jnp.int32, (_LEAF, _LEAF), 0)
                    == jax.lax.broadcasted_iota(jnp.int32, (_LEAF, _LEAF), 1)
                    ).astype(jnp.float32)

    def leaf_level(l, s0):
        """One _LEAF-wide leaf of rank-1 steps (each touching only
        [_LEAF, m]) followed by an inner deferred MXU update of the rest
        of the [_SUB, m] micro-panel — the same pivot-lane-extraction /
        Neumann-inverse / outer-product math as the micro-panel boundary
        update, one level deeper. This is what makes the kernel's VMEM
        traffic O(w * _LEAF * m) instead of O(w * _SUB * m) per call."""
        l0 = s0 + l * _LEAF
        jax.lax.fori_loop(0, _LEAF, lambda j, c: (rank1(j, l0, _LEAF), 0)[1],
                          0)
        onehot_rows = []
        for i in range(_LEAF):                  # SMEM scalar reads
            sel = (lanes == piv_ref[0, l0 + i]) & (ok_ref[0, l0 + i] > 0)
            onehot_rows.append(sel.astype(jnp.float32))
        onehot = jnp.concatenate(onehot_rows, axis=0)              # [lb, m]
        Mleaf = mt_ref[pl.ds(l0, _LEAF), :]     # final leaf rows
        Tm = mt_ref[pl.ds(s0, _SUB), :]         # micro-panel (pre-update)
        G = _dotg(Mleaf, onehot, ((1,), (1,)))                     # [lb, lb]
        Tpiv = _dotg(Tm, onehot, ((1,), (1,)))                     # [_SUB, lb]
        St = jnp.triu(G, 1)
        invT = eye_leaf - St
        P = St
        p = 2
        while p < _LEAF:
            P = _dotg(P, P, ((1,), (0,)))
            invT = _dotg(eye_leaf + P, invT, ((1,), (0,)))
            p *= 2
        U12 = _dotg(Tpiv, invT, ((1,), (0,)))                      # [_SUB, lb]
        U12 = jnp.where(rows_sub >= (l + 1) * _LEAF, U12, 0.0)
        Lmul = jnp.where(avail_ref[:, :] > 0, Mleaf, 0.0)          # [lb, m]
        Tnew = Tm - _dotg(U12, Lmul, ((1,), (0,)))
        if forced or finish:
            # later micro-panel rows are deferred here too: scatter the
            # exact U12 into this leaf's pivot lanes (see micro_panel)
            anyp = (jnp.sum(onehot, axis=0, keepdims=True) > 0) \
                & (rows_sub >= (l + 1) * _LEAF)
            Tnew = jnp.where(anyp, _dotg(U12, onehot, ((1,), (0,))), Tnew)
        mt_ref[pl.ds(s0, _SUB), :] = Tnew
        return s0

    def micro_panel(sub, _):
        s0 = sub * _SUB
        s1 = s0 + _SUB
        if leafing:
            jax.lax.fori_loop(0, _SUB // _LEAF, leaf_level, s0)
        else:
            jax.lax.fori_loop(
                0, _SUB, lambda j, c: (rank1(j, s0, _SUB), 0)[1], 0)
        # Deferred MXU update of rows [s1, w): identical math to the
        # XLA-level inter-block update (ops/panel._lu_select_loop_t
        # Tpiv/L11/U12t) one micro-panel deeper, applied FULL-WIDTH with
        # U12 masked to rows >= s1 (earlier rows are final; micro-panel
        # rows were updated in place). Pivot lanes of deferred rows go
        # stale unless forced/finish mode scatters their exact U12 back
        # via one extra one-hot dot (see below).
        onehot_rows = []
        for i in range(_SUB):                   # SMEM scalar reads
            sel = (lanes == piv_ref[0, s0 + i]) & (ok_ref[0, s0 + i] > 0)
            onehot_rows.append(sel.astype(jnp.float32))
        onehot = jnp.concatenate(onehot_rows, axis=0)              # [b, m]
        Msub = mt_ref[pl.ds(s0, _SUB), :]       # final micro-panel rows
        T = mt_ref[:, :]                        # full block (pre-update)
        # G[r, i] = Msub[r, p_i]; L11 = I + tril(G.T, -1) (unit lower);
        # inv(L11).T via the nilpotent Neumann product, St = triu(G, 1)
        G = _dotg(Msub, onehot, ((1,), (1,)))                      # [b, b]
        Tpiv = _dotg(T, onehot, ((1,), (1,)))                      # [w, b]
        # inv(L11).T = (I+St^(2^(K-1)))...(I+St^2)(I-St), exact for the
        # nilpotent St (index <= _SUB = 2^K) — log2(_SUB) squarings
        St = jnp.triu(G, 1)
        invT = eye - St
        P = St
        p = 2
        while p < _SUB:
            P = _dotg(P, P, ((1,), (0,)))
            invT = _dotg(eye + P, invT, ((1,), (0,)))
            p *= 2
        U12 = _dotg(Tpiv, invT, ((1,), (0,)))                      # [w, b]
        U12 = jnp.where(rows_w >= s1, U12, 0.0)  # deferred rows only
        Lmul = jnp.where(avail_ref[:, :] > 0, Msub, 0.0)           # [b, m]
        Tnew = T - _dotg(U12, Lmul, ((1,), (0,)))
        if forced or finish:
            # write the pivot lanes' exact U12 into the deferred rows (one-
            # hot scatter — Mosaic cannot dus unaligned lanes). forced mode
            # needs it because those lanes ARE later tile columns; finish
            # mode makes the block's pivot lanes hold their final merged-
            # factor rows (U values), so callers can read the merged
            # factor straight off the factored panel instead of
            # re-eliminating the gathered pivot rows (_pivot_factors).
            anyp = (jnp.sum(onehot, axis=0, keepdims=True) > 0) \
                & (rows_w >= s1)
            Tnew = jnp.where(anyp, _dotg(U12, onehot, ((1,), (0,))), Tnew)
        mt_ref[:, :] = Tnew
        return 0

    nfull = w // _SUB
    if nfull:
        # every full micro-panel runs the deferred update (for the last one
        # it is a no-op FMA when w % _SUB == 0 — U12 masks to zero rows;
        # keeping the body uniform is what keeps the MLIR small)
        jax.lax.fori_loop(0, nfull, micro_panel, 0)
    tail = w - nfull * _SUB
    if tail:                                    # ragged tail: no deferral
        jax.lax.fori_loop(
            0, tail, lambda j, c: (rank1(j, nfull * _SUB, tail), 0)[1], 0)


@functools.partial(
    jax.jit, static_argnames=("forced", "j0", "interpret", "finish"))
def rank1_block_pallas_t(Mt, avail_f, forced: bool = False, j0: int = 0,
                         interpret: bool = False, finish: bool = False):
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
        functools.partial(_rank1_kernel, forced, finish, j0),
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
            # m=65536 (bf16-storage N=65536 stepped path) needs 106.4 MB:
            # in+out [128, m] f32 copies plus the deferred update's
            # full-block temporaries. v5e VMEM is 128 MB/core; the default
            # ~100 MB scoped cap killed the compile (/tmp/prof_65536.log),
            # so wide blocks raise the cap (no grid => no pipelining
            # buffers compete for the headroom).
            vmem_limit_bytes=(117 if m > 32768 else 100) * 1024 * 1024,
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
