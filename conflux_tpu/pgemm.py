"""Distributed matmul (SUMMA) and fully-distributed validation residuals.

The reference validates with ScaLAPACK: COSTA-redistribute the factors to a
BLACS grid and run two `pdgemm_` calls (examples/conflux_miniapp.cpp:349-422).
Here the same check is computed in-framework: a SUMMA matmul over the
('x','y') mesh plane (per-step panel broadcasts via masked psum — the same
communication shape ScaLAPACK's PB-GEMM uses) and Frobenius norms as global
psum reductions. No external library, no gather to host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from conflux_tpu.layout import BlockCyclic, local_row_to_global
from conflux_tpu.ops.collect import panel_rows_for_columns

_PREC = jax.lax.Precision.HIGHEST


def _summa_local(desc: BlockCyclic, Aloc, Bloc):
    """C = A @ B on the layer-0 block-cyclic distribution (local shapes
    [Ml, Nl]); one fori_loop step per tile of the contraction dimension."""
    v, Px, Py = desc.v, desc.grid.Px, desc.grid.Py
    Ml, Nl = desc.Ml, desc.Nl
    pi = jax.lax.axis_index("x")
    pj = jax.lax.axis_index("y")

    def step(k, C):
        # column panel of A (tiles (:, k)) lives on pj == k % Py
        acol = jax.lax.dynamic_slice(Aloc, (0, (k // Py) * v), (Ml, v))
        acol = jax.lax.psum(jnp.where(pj == k % Py, acol, 0), "y")
        # row panel of B (tiles (k, :)) lives on pi == k % Px
        brow = jax.lax.dynamic_slice(Bloc, ((k // Px) * v, 0), (v, Nl))
        brow = jax.lax.psum(jnp.where(pi == k % Px, brow, 0), "x")
        return C + jnp.dot(acol, brow, precision=_PREC)

    C0 = jnp.zeros_like(Aloc)
    return jax.lax.fori_loop(0, desc.Nt, step, C0)


@partial(jax.jit, static_argnames=("desc",))
def pgemm(GA: jax.Array, GB: jax.Array, desc: BlockCyclic) -> jax.Array:
    """Distributed C = A @ B for square block-cyclic matrices (z layer 0
    carries the data, parity with layout.distribute output)."""
    fn = shard_map(
        lambda a, b: _summa_local(desc, a[0], b[0])[None],
        mesh=desc.grid.mesh,
        in_specs=(P("z", "x", "y"), P("z", "x", "y")),
        out_specs=P("z", "x", "y"),
    )
    return fn(GA, GB)


def _residual_local(desc: BlockCyclic, m_true: int, n_true: int, Gloc, Floc, piv):
    """||PA - LU||_F and ||A||_F from device-local blocks.

    Gloc: original matrix (z-partials); Floc: merged LU of PA (layer 0,
    trapezoid for tall M > N); piv: (1,1,1,M) pivot vector (slot ->
    original row)."""
    v, Px, Py, Pz = desc.v, desc.grid.Px, desc.grid.Py, desc.grid.Pz
    Ml, Nl = desc.Ml, desc.Nl
    pi = jax.lax.axis_index("x")
    pj = jax.lax.axis_index("y")
    pz = jax.lax.axis_index("z")
    # f32 throughout: bf16-STORAGE factors must be MEASURED in f32, or the
    # validation plane's own rounding contaminates the reported residual
    A = Gloc[0].astype(jnp.float32)
    F = Floc[0].astype(jnp.float32)
    piv = piv[0, 0, 0]

    slot = local_row_to_global(pi, Px, v, Ml)   # global row slot
    gcol = local_row_to_global(pj, Py, v, Nl)   # global column index

    # --- assemble PA: destination tile t takes original rows piv[tv:(t+1)v]
    def gather_step(t, PA):
        rows = jax.lax.dynamic_slice(piv, (t * v,), (v,))
        mine = (rows // v) % Px == pi
        lr = jnp.clip((rows // v) // Px * v + rows % v, 0, Ml - 1)
        contrib = jnp.where(mine[:, None], jnp.take(A, lr, axis=0), 0)
        block = jax.lax.psum(contrib, ("x", "z"))  # true rows everywhere
        owner = pi == t % Px
        PA2 = jax.lax.dynamic_update_slice(PA, block, ((t // Px) * v, 0))
        return jnp.where(owner, PA2, PA)

    PA = jax.lax.fori_loop(0, desc.Mt, gather_step, jnp.zeros_like(A))

    # --- LU product via SUMMA on the factors built from F with slot masks
    L = jnp.where(slot[:, None] > gcol[None, :], F, 0) + jnp.where(
        slot[:, None] == gcol[None, :], 1.0, 0.0
    )
    U = jnp.where(slot[:, None] <= gcol[None, :], F, 0)
    LU = _summa_local(desc, L, U)

    # mask identity padding out of both norms: the reported residual is the
    # documented ||PA-LU||/(n_true ||A||) on the user's unpadded matrix.
    # (PA rows are in pivot order, which interleaves padding rows, so the
    # row mask uses the ORIGINAL index of each slot.)
    origrow = jnp.take(piv, jnp.clip(slot, 0, desc.M - 1))
    live = (origrow[:, None] < m_true) & (gcol[None, :] < n_true)
    R = jnp.where((pz == 0) & live, PA - LU, 0.0)
    r2 = jax.lax.psum(jnp.sum(R.astype(jnp.float32) ** 2), ("x", "y", "z"))
    # after the z-psum the value is z-invariant, so reduce over (x, y) only
    Atrue = jax.lax.psum(Gloc, "z")[0].astype(jnp.float32)
    livea = (slot[:, None] < m_true) & (gcol[None, :] < n_true)
    Asum = jax.lax.psum(jnp.sum(jnp.where(livea, Atrue, 0.0) ** 2), ("x", "y"))
    return jnp.stack([r2, Asum])[None, None, None]


def _chol_residual_local(desc: BlockCyclic, n_true: int, Gloc, Lloc):
    """||A - L L^T||_F and ||A||_F from device-local blocks (Gloc z-partial,
    Lloc layer-0 factor). The L^T row panel per step is built with the same
    gather-and-reorder the factorization itself uses."""
    v, Px, Py, Pz = desc.v, desc.grid.Px, desc.grid.Py, desc.grid.Pz
    Ml, Nl = desc.Ml, desc.Nl
    pi = jax.lax.axis_index("x")
    pj = jax.lax.axis_index("y")
    pz = jax.lax.axis_index("z")
    A = jax.lax.psum(Gloc.astype(jnp.float32), "z")[0]
    L = Lloc[0].astype(jnp.float32)

    def step(k, acc):
        # column panel of L: tiles (:, k) on pj == k % Py
        lcol = jax.lax.dynamic_slice(L, (0, (k // Py) * v), (Ml, v))
        lcol = jax.lax.psum(jnp.where(pj == k % Py, lcol, 0), "y")
        # row panel of L^T = the same column panel, gathered over 'x' and
        # re-sliced for this device's local columns
        lrow = panel_rows_for_columns(lcol, v, Px, Py, pj, desc.Ntl)
        lrow_t = lrow.transpose(2, 0, 1).reshape(v, Nl)
        return acc + jnp.dot(lcol, lrow_t, precision=_PREC)

    # carry derived from BOTH operands so its vma covers the z-varying L
    LLt = jax.lax.fori_loop(0, desc.Nt, step, jnp.zeros_like(A + L))
    # mask identity padding out of both norms (no pivoting: padding stays in
    # the trailing rows/columns)
    grow = local_row_to_global(pi, Px, v, Ml)
    gcol = local_row_to_global(pj, Py, v, Nl)
    live = (grow[:, None] < n_true) & (gcol[None, :] < n_true)
    R = jnp.where(live, A - LLt, 0.0)
    r2 = jax.lax.psum(jnp.sum(R.astype(jnp.float32) ** 2), ("x", "y"))
    a2 = jax.lax.psum(
        jnp.sum(jnp.where(live, A, 0.0).astype(jnp.float32) ** 2), ("x", "y")
    )
    out = jnp.stack([r2, a2]) + 0.0 * pz.astype(jnp.float32)
    return out[None, None, None]


@partial(jax.jit, static_argnames=("desc", "n_true"))
def pchol_residual_25d(
    G: jax.Array, Lg: jax.Array, desc: BlockCyclic, n_true: int = 0
):
    """Fully distributed ||A - L L^T||_F / (N ||A||_F); n_true masks the
    identity padding (0 = desc.N)."""
    n_true = n_true or desc.N
    fn = shard_map(
        partial(_chol_residual_local, desc, n_true),
        mesh=desc.grid.mesh,
        in_specs=(P("z", "x", "y"), P("z", "x", "y")),
        out_specs=P("z", "x", "y", None),
    )
    out = fn(G, Lg)
    r2, a2 = out[0, 0, 0]
    return jnp.sqrt(r2) / (n_true * jnp.sqrt(a2))


@partial(jax.jit, static_argnames=("desc", "n_true", "m_true"))
def plu_residual_25d(
    G: jax.Array, F: jax.Array, piv: jax.Array, desc: BlockCyclic,
    n_true: int = 0, m_true: int = 0,
):
    """Fully distributed ||PA - LU||_F / (N ||A||_F) — the in-framework
    replacement for the reference's ScaLAPACK validation plane.

    n_true / m_true: the user's unpadded dims (0 = the padded desc dims);
    identity-padded rows/columns are masked out of the norms and the
    normalization uses n_true. Handles tall (M > N) trapezoid factors."""
    n_true = n_true or desc.N
    m_true = m_true or desc.M
    pivz = jnp.broadcast_to(
        piv, (desc.grid.Pz, desc.grid.Px, desc.grid.Py, desc.M)
    )
    fn = shard_map(
        partial(_residual_local, desc, m_true, n_true),
        mesh=desc.grid.mesh,
        in_specs=(P("z", "x", "y"), P("z", "x", "y"), P("z", "x", "y", None)),
        out_specs=P("z", "x", "y", None),
    )
    out = fn(G, F, pivz)
    r2, a2 = out[0, 0, 0]
    return jnp.sqrt(r2) / (n_true * jnp.sqrt(a2))
