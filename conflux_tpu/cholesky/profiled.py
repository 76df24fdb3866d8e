"""Per-substep profiled execution of the distributed Cholesky — the PP()
table (VERDICT r4 item 4: the LU-only substep machinery, generalized).

The reference instruments every Cholesky sub-step (PE(choleskyA00_compute),
PE(updateA10_*), PE(computeA11_dgemm), PE(reduceA11_reduction),
PE(scatterA11_*) throughout src/conflux/cholesky/Cholesky.cpp:188-715;
macro layer src/conflux/cholesky/CholeskyProfiler.h:17-32) and prints the
attribution with PP(). As with LU, inside one fused jit that attribution
is impossible from the host — so this driver runs the SAME per-step math
as the fori rank program (`cholesky/p25d._local_cholesky_25d`) split into
FIVE separately-jitted shard_map programs, each fenced by a scalar
readback and wrapped in a profiler region:

  step0_reduce      lazy z-psum of the step tile column   (reduceA11)
  step1_potrf       a00 ('x','y') psum + redundant potrf  (choleskyA00)
  step2_trsm_write  panel TRSM + the factor-column write  (updateA10)
  step3_bcast       per-layer slice psum + row broadcast  (scatterA11)
  step4_update      split-K trailing GEMM                 (computeA11)

The step index k is a DYNAMIC operand, so each substep compiles ONCE for
all Kappa steps. Attribution-mode overhead (inherent, as in lu/profiled):
inter-substep intermediates round-trip through HBM and every fence costs
one dispatch latency — the table's value is the per-substep RATIO.
Exactness is tested: the factor equals the fori rank program's bit for
bit (tests/test_profile_substeps.py)."""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from conflux_tpu import profiler
from conflux_tpu.layout import BlockCyclic, local_tile_to_global
from conflux_tpu.ops.collect import panel_rows_for_columns
from conflux_tpu.ops.tri import potrf_tile, schur_dot, trsm_right_lower_t


@lru_cache(maxsize=None)
def _substeps(desc: BlockCyclic, precision: str, dtype_name: str):
    v = desc.v
    Px, Py, Pz = desc.grid.Px, desc.grid.Py, desc.grid.Pz
    Ml, Nl = desc.Ml, desc.Nl
    l = desc.nlayr
    kpad = Pz * l - v
    mesh = desc.grid.mesh
    spec3 = P("z", "x", "y")
    dt = jnp.dtype(dtype_name)
    cdt = jnp.float32 if dt == jnp.bfloat16 else dt

    def sm(body, in_specs, out_specs):
        return jax.jit(shard_map(body, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs))

    def axes():
        return (jax.lax.axis_index("x"), jax.lax.axis_index("y"),
                jax.lax.axis_index("z"))

    def chk(val):
        pi, pj, pz = axes()
        noise = 0.0 * (pi + pj + pz).astype(jnp.float32)
        return jax.lax.psum(jnp.sum(val).astype(jnp.float32) + noise,
                            ("x", "y", "z"))

    # -- step 0: lazy z-reduction of the step tile column (reduceA11) ----
    def s0(k, Ab):
        A = Ab[0]
        lj_k = k // Py
        colk = jax.lax.psum(
            jax.lax.dynamic_slice(A, (jnp.int32(0), lj_k * v),
                                  (Ml, v)).astype(cdt), "z")
        return colk[None], chk(colk)

    f0 = sm(s0, (P(), spec3), (spec3, P()))

    # -- step 1: diagonal-tile broadcast + redundant potrf (choleskyA00) -
    def s1(k, colkb):
        pi, pj, pz = axes()
        colk = colkb[0]
        li_k = k // Px
        own_y = pj == k % Py
        own_x = pi == k % Px
        diag = jax.lax.dynamic_slice(colk, (li_k * v, jnp.int32(0)), (v, v))
        a00 = jax.lax.psum(jnp.where(own_x & own_y, diag, 0), ("x", "y"))
        L00 = potrf_tile(a00)
        return L00[None], chk(L00)

    f1 = sm(s1, (P(), spec3), (spec3, P()))

    # -- step 2: panel TRSM + factor-column write (updateA10) ------------
    def s2(k, Ab, colkb, L00b):
        pi, pj, pz = axes()
        A, colk, L00 = Ab[0], colkb[0], L00b[0]
        gt_row = local_tile_to_global(pi, Px, v, Ml)
        lj_k = k // Py
        li_k = k // Px
        own_y = pj == k % Py
        own_x = pi == k % Px
        Lcol = trsm_right_lower_t(colk, L00, method="invert")
        Lcol = jnp.where(gt_row[:, None] > k, Lcol, 0)
        newcol = jnp.where(
            own_x,
            jax.lax.dynamic_update_slice(Lcol, L00, (li_k * v, jnp.int32(0))),
            Lcol)
        newcol = jnp.where((pz == 0) & own_y, newcol, jnp.zeros_like(newcol))
        curc = jax.lax.dynamic_slice(A, (jnp.int32(0), lj_k * v), (Ml, v))
        A = jax.lax.dynamic_update_slice(
            A, jnp.where(own_y, newcol.astype(A.dtype), curc),
            (jnp.int32(0), lj_k * v))
        return A[None], Lcol[None], chk(Lcol)

    f2 = sm(s2, (P(), spec3, spec3, spec3), (spec3, spec3, P()))

    # -- step 3: per-layer slice psum + row broadcast (scatterA11) -------
    def s3(k, Lcolb):
        pi, pj, pz = axes()
        Lcol = Lcolb[0]
        own_y = pj == k % Py
        sl = (pz * l).astype(jnp.int32)
        Lcolp = jnp.pad(Lcol, ((0, 0), (0, kpad))) if kpad else Lcol
        Lk = jax.lax.psum(
            jnp.where(own_y,
                      jax.lax.dynamic_slice(Lcolp, (jnp.int32(0), sl),
                                            (Ml, l)), 0), "y")
        Lrow = panel_rows_for_columns(Lk, v, Px, Py, pj, desc.Ntl)
        W = Lrow.transpose(2, 0, 1).reshape(l, Nl)
        return Lk[None], W[None], chk(Lk)

    f3 = sm(s3, (P(), spec3), (spec3, spec3, P()))

    # -- step 4: split-K trailing update (computeA11) --------------------
    def s4(k, Ab, Lkb, Wb):
        pi, pj, pz = axes()
        A, Lk, W = Ab[0], Lkb[0], Wb[0]
        gt_row = local_tile_to_global(pi, Px, v, Ml)
        gt_col = local_tile_to_global(pj, Py, v, Nl)
        mode = "bf16out" if A.dtype == jnp.bfloat16 else precision
        upd = schur_dot(Lk, W, mode)
        live = (gt_row[:, None] > k) & (gt_col[None, :] > k)
        A = A - jnp.where(live, upd, 0)
        return A[None], chk(upd)

    f4 = sm(s4, (P(), spec3, spec3, spec3), (spec3, P()))

    return f0, f1, f2, f3, f4


def cholesky_25d_profiled(
    G: jax.Array, desc: BlockCyclic, precision: str = "highest",
) -> jax.Array:
    """Run the fori-equivalent distributed Cholesky substep-by-substep,
    fenced, accumulating profiler regions (module docstring). Same output
    contract as cholesky_25d; bit-identical to
    cholesky_25d(..., unroll=False). Call under profiler.enable(True) and
    print with profiler.PP()."""
    f0, f1, f2, f3, f4 = _substeps(desc, precision, str(G.dtype))

    def fenced(name, fn, *args):
        profiler.PE(name)
        out = fn(*args)
        float(out[-1])  # scalar-readback completion fence
        profiler.PL()
        return out[:-1]

    A = G
    for k in range(desc.Nt):
        kk = jnp.int32(k)
        (colk,) = fenced("step0_reduce", f0, kk, A)
        (L00,) = fenced("step1_potrf", f1, kk, colk)
        A, Lcol = fenced("step2_trsm_write", f2, kk, A, colk, L00)
        Lk, W = fenced("step3_bcast", f3, kk, Lcol)
        (A,) = fenced("step4_update", f4, kk, A, Lk, W)
    return A
