"""Per-substep profiled execution of the distributed LU — the PP() table.

The reference instruments every sub-step region (PE(step0_reduce) ...
throughout src/conflux/lu/conflux_opt.hpp; profiler.hpp:5-19) and prints a
sorted attribution table with PP(). Inside one fused jit that attribution
is impossible from the host (XLA reorders everything), and device traces
need tooling to read — so this driver runs the SAME per-step math as the
fori rank program (`_local_lu_25d`) split into FIVE separately-jitted
shard_map programs, each fenced by a scalar readback (block_until_ready
may return early on this backend, CLAUDE.md) and wrapped in a profiler
region:

  step0_reduce   lazy z-psum of the panel column
  step1_pivot    tournament/gather/full/none selection (+ y-broadcast)
  step23_rows    pivot-row psum over ('x','z')
  step45_trsm    both TRSMs + the factor/panel writes
  step6_update   per-layer L10 broadcast + split-K trailing GEMM

The step index k is a DYNAMIC operand, so each substep compiles ONCE for
all Nt steps. Every substep also returns a f32 checksum; the driver's
float() on it is the completion fence the region timing closes on.

Attribution-mode overhead (documented, inherent): the inter-substep
intermediates (colk, raw, L10, Y) round-trip through HBM instead of
fusing, and each fence costs one dispatch latency (~24 ms through this
platform's tunnel) — so the table's VALUE is the per-substep ratio, not
the sum (compare the sum against the fused lu_25d time printed next to
it). Exactness is tested: pivots and factors equal the fori rank
program's bit for bit (tests/test_profile_substeps.py)."""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from conflux_tpu import profiler
from conflux_tpu.layout import BlockCyclic, local_row_to_global, \
    local_tile_to_global
from conflux_tpu.lu.p25d import _full_pivot, _tournament
from conflux_tpu.ops.panel import lu_nopivot
from conflux_tpu.ops.tri import (
    schur_dot,
    trsm_left_lower_unit,
    trsm_right_upper,
    unit_lower,
    upper,
)


@lru_cache(maxsize=None)
def _substeps(desc: BlockCyclic, pivoting: str, precision: str):
    v = desc.v
    Px, Py, Pz = desc.grid.Px, desc.grid.Py, desc.grid.Pz
    Ml, Nl = desc.Ml, desc.Nl
    l = desc.nlayr
    kpad = Pz * l - v
    mesh = desc.grid.mesh
    spec3 = P("z", "x", "y")

    def sm(body, in_specs, out_specs):
        return jax.jit(shard_map(body, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs))

    def axes():
        return (jax.lax.axis_index("x"), jax.lax.axis_index("y"),
                jax.lax.axis_index("z"))

    def chk(val):
        # replicated scalar checksum: force variance over all three axes
        # (a partially-invarying scalar cannot be psum'd over all of them
        # under the varying-manual-axes checks), then reduce
        pi, pj, pz = axes()
        noise = 0.0 * (pi + pj + pz).astype(jnp.float32)
        return jax.lax.psum(jnp.sum(val).astype(jnp.float32) + noise,
                            ("x", "y", "z"))

    # -- step 0: panel-column z-reduction --------------------------------
    def s0(k, Ab):
        A = Ab[0]
        lj_k = k // Py
        colk = jax.lax.psum(
            jax.lax.dynamic_slice(A, (0, lj_k * v), (Ml, v)).astype(
                jnp.float32), "z")
        return colk[None], chk(colk)

    f0 = sm(s0, (P(), spec3), (spec3, P()))

    # -- step 1: pivot selection -----------------------------------------
    def s1(k, colkb, activeb):
        pi, pj, pz = axes()
        colk = colkb[0]
        active = activeb[0, :, 0]
        gri = local_row_to_global(pi, Px, v, Ml)
        li_k = k // Px
        own_y = pj == k % Py
        own_x = pi == k % Px
        if pivoting == "tournament":
            win_idx, lu00 = _tournament(colk, active, gri, v, Px, "butterfly")
        elif pivoting == "gather":
            win_idx, lu00 = _tournament(colk, active, gri, v, Px, "gather")
        elif pivoting == "full":
            win_idx, lu00 = _full_pivot(colk, active, gri, v, Px)
        elif pivoting == "none":
            win_idx = k * v + jnp.arange(v, dtype=jnp.int32)
            diag = jax.lax.dynamic_slice(colk, (li_k * v, 0), (v, v))
            a00 = jax.lax.psum(jnp.where(own_x & own_y, diag, 0), ("x", "y"))
            lu00 = lu_nopivot(a00)
        else:  # pragma: no cover
            raise ValueError(pivoting)
        if pivoting in ("tournament", "gather", "full"):
            win_idx = jax.lax.psum(jnp.where(own_y, win_idx, 0), "y")
            lu00 = jax.lax.psum(jnp.where(own_y, lu00, 0), "y")
        active = active & ~(gri[:, None] == win_idx[None, :]).any(axis=1)
        return (win_idx[None, None, None], lu00[None],
                jnp.broadcast_to(active[None, :, None], (1, Ml, 1)),
                chk(win_idx))

    f1 = sm(s1, (P(), spec3, spec3),
            (P("z", "x", "y", None), spec3, spec3, P()))

    # -- steps 2+3: pivot-row gather -------------------------------------
    def s23(k, Ab, winb):
        pi, pj, pz = axes()
        A = Ab[0]
        win_idx = winb[0, 0, 0]
        mine = ((win_idx // v) % Px == pi) & (win_idx >= 0)
        lr = jnp.clip((win_idx // v) // Px * v + win_idx % v, 0, Ml - 1)
        contrib = jnp.where(
            mine[:, None], jnp.take(A, lr, axis=0), 0).astype(jnp.float32)
        raw = jax.lax.psum(contrib, ("x", "z"))
        return raw[None], chk(raw)

    f23 = sm(s23, (P(), spec3, P("z", "x", "y", None)), (spec3, P()))

    # -- steps 4+5: TRSMs + factor/panel writes --------------------------
    def s45(k, Ab, Fb, colkb, rawb, lu00b, activeb):
        pi, pj, pz = axes()
        A, F, colk, raw = Ab[0], Fb[0], colkb[0], rawb[0]
        lu00 = lu00b[0]
        active = activeb[0, :, 0]
        gt_col = local_tile_to_global(pj, Py, v, Nl)
        lj_k = k // Py
        li_k = k // Px
        own_y = pj == k % Py
        own_x = pi == k % Px
        L00 = unit_lower(lu00)
        U00 = upper(lu00)
        dU = jnp.diagonal(U00)
        U00 = U00 + jnp.diag(jnp.where(dU == 0, 1, 0).astype(U00.dtype))
        Y = trsm_left_lower_unit(L00, raw, method="invert")
        rownew = jnp.where(gt_col[None, :] > k, Y, raw)
        rownew = jnp.where(
            own_y, jax.lax.dynamic_update_slice(rownew, lu00, (0, lj_k * v)),
            rownew)
        rowz = jnp.where(pz == 0, rownew, jnp.zeros_like(rownew))
        curF = jax.lax.dynamic_slice(F, (li_k * v, 0), (v, Nl))
        F = jax.lax.dynamic_update_slice(
            F, jnp.where(own_x, rowz.astype(F.dtype), curF), (li_k * v, 0))
        L10 = trsm_right_upper(colk, U00, method="invert")
        L10 = jnp.where(active[:, None], L10, 0)
        newpanel = jnp.where((pz == 0) & own_y, L10, jnp.zeros_like(L10))
        curp = jax.lax.dynamic_slice(A, (0, lj_k * v), (Ml, v))
        A = jax.lax.dynamic_update_slice(
            A, jnp.where(own_y, newpanel.astype(A.dtype), curp),
            (0, lj_k * v))
        return A[None], F[None], L10[None], Y[None], chk(L10)

    f45 = sm(s45, (P(), spec3, spec3, spec3, spec3, spec3, spec3),
             (spec3, spec3, spec3, spec3, P()))

    # -- step 6: split-K trailing update ---------------------------------
    def s6(k, Ab, L10b, Yb, activeb):
        pi, pj, pz = axes()
        A, L10, Y = Ab[0], L10b[0], Yb[0]
        active = activeb[0, :, 0]
        gt_col = local_tile_to_global(pj, Py, v, Nl)
        own_y = pj == k % Py
        sl = pz * l
        L10p = jnp.pad(L10, ((0, 0), (0, kpad))) if kpad else L10
        Lk = jax.lax.psum(
            jnp.where(own_y,
                      jax.lax.dynamic_slice(L10p, (0, sl), (Ml, l)), 0), "y")
        Ymask = jnp.where(gt_col[None, :] > k, Y, 0)
        Ymaskp = jnp.pad(Ymask, ((0, kpad), (0, 0))) if kpad else Ymask
        Yk = jax.lax.dynamic_slice(Ymaskp, (sl, 0), (l, Nl))
        mode = "bf16out" if A.dtype == jnp.bfloat16 else precision
        upd = schur_dot(Lk, Yk, mode)
        A = A - jnp.where(active[:, None], upd, 0)
        return A[None], chk(Lk)

    f6 = sm(s6, (P(), spec3, spec3, spec3, spec3), (spec3, P()))

    return f0, f1, f23, f45, f6


def lu_25d_profiled(
    G: jax.Array, desc: BlockCyclic, pivoting: str = "tournament",
    precision: str = "highest",
) -> Tuple[jax.Array, jax.Array]:
    """Run the fori-equivalent distributed LU substep-by-substep, fenced,
    accumulating profiler regions (module docstring). Same (F, pivots)
    contract as lu_25d; bit-identical to lu_25d(..., unroll=False) for
    square problems. Call under profiler.enable(True) and print with
    profiler.PP()."""
    f0, f1, f23, f45, f6 = _substeps(desc, pivoting, precision)
    Nt = desc.Nt
    A = G
    F = jnp.zeros(desc.global_shape(), G.dtype)
    active = jnp.ones((desc.grid.Pz, desc.grid.Px * desc.Ml,
                       desc.grid.Py), bool)
    pivots = np.zeros(desc.M, np.int32)

    def fenced(name, fn, *args):
        profiler.PE(name)
        out = fn(*args)
        float(out[-1])  # scalar-readback completion fence
        profiler.PL()
        return out[:-1]

    v = desc.v
    for k in range(Nt):
        kk = jnp.int32(k)
        (colk,) = fenced("step0_reduce", f0, kk, A)
        win, lu00, active = fenced("step1_pivot", f1, kk, colk, active)
        pivots[k * v : (k + 1) * v] = np.asarray(win[0, 0, 0])
        (raw,) = fenced("step23_rows", f23, kk, A, win)
        A, F, L10, Y = fenced("step45_trsm", f45, kk, A, F, colk, raw,
                              lu00, active)
        (A,) = fenced("step6_update", f6, kk, A, L10, Y, active)
    return F, jnp.asarray(pivots)
