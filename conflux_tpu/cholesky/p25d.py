"""2.5D distributed Cholesky (CONFCHOX capability) as one SPMD program.

TPU-native redesign of src/conflux/cholesky/Cholesky.cpp:
  * the (PX, PY, PZ) grid is a Mesh('x','y','z'); every rank program below
    runs under `shard_map`, one jit for the whole factorization
    (`lax.fori_loop` over the Kappa = N/v steps).
  * `choleskyA00` (Cholesky.cpp:188-194): the diagonal tile is psum-broadcast
    over ('x','y') and `potrf_tile`d redundantly on every device — cheaper on
    ICI than a root-factor-then-broadcast round trip.
  * `updateA10`'s TRSM + sub-tile scatter (Cholesky.cpp:218-330): the tile
    column is TRSM'd by its owner column, psum-broadcast along 'y', and
    all_gather'd along 'x'; each device slices the tiles its local columns
    need.  The z split happens at the GEMM: layer pz consumes columns
    [pz*l, (pz+1)*l) of the panel (l = v/PZ — the reference's
    `MPI_SUBTILE` slicing, Cholesky.cpp:143-144).
  * `computeA11` (Cholesky.cpp:333-378): one [Ml, l] x [l, Nl] MXU GEMM per
    device per step, masked to the live trailing tiles.
  * `reduceA11` (Cholesky.cpp:581-620): the *lazy* 2.5D reduction — only the
    tile column needed at step k is psum'd over 'z'; the trailing matrix
    stays as per-layer partial sums for its whole lifetime.

Storage invariant (see layout.py): local blocks hold z-partials — the true
matrix is the sum over the z axis; final factor values are written on layer
z==0 only, zeros elsewhere, so the invariant is maintained without ever
rescaling.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from conflux_tpu.errors import ConfluxError, ErrorCode
from conflux_tpu.layout import (
    BlockCyclic,
    distribute,
    local_tile_to_global,
    undistribute,
)
from conflux_tpu.ops.collect import panel_rows_for_columns
from conflux_tpu.ops.tri import potrf_tile, schur_dot, trsm_right_lower_t

_PREC = jax.lax.Precision.HIGHEST


def _local_cholesky_25d(desc: BlockCyclic, precision: str, Aloc: jnp.ndarray) -> jnp.ndarray:
    """Per-device SPMD program. Aloc: (1, Ml, Nl) local block."""
    v = desc.v
    Px, Py, Pz = desc.grid.Px, desc.grid.Py, desc.grid.Pz
    Ml, Nl = desc.Ml, desc.Nl
    Kappa = desc.Nt
    l = desc.nlayr  # per-layer update rank ceil(v/Pz) (lu_params.hpp:73)
    kpad = Pz * l - v  # zero pad so the last layer's slice is in bounds

    pi = jax.lax.axis_index("x")
    pj = jax.lax.axis_index("y")
    pz = jax.lax.axis_index("z")

    # global tile row/col of every local row/col (tile-cyclic maps, layout.py)
    gt_row = local_tile_to_global(pi, Px, v, Ml)
    gt_col = local_tile_to_global(pj, Py, v, Nl)
    cdt = jnp.float32 if Aloc.dtype == jnp.bfloat16 else Aloc.dtype

    def step(k, A):
        k = jnp.asarray(k, jnp.int32)  # x64 mode makes fori counters int64
        z0 = jnp.int32(0)
        lj_k = k // Py  # local tile column of step k on its owner column
        li_k = k // Px  # local tile row of the diagonal tile on its owner row
        own_y = pj == k % Py
        own_x = pi == k % Px

        # --- lazy 2.5D reduction of the step-k tile column (reduceA11) -----
        # (bf16-STORAGE blocks are bf16 z-partials; the reduction and the
        # potrf/TRSM run f32 — the distributed form of cholesky/single's
        # bf16s contract)
        with jax.named_scope("step0_reduce"):
            colk = jax.lax.psum(
                jax.lax.dynamic_slice(A, (z0, lj_k * v), (Ml, v)).astype(
                    cdt), "z"
            )

        # --- diagonal tile: broadcast + redundant potrf (choleskyA00) ------
        with jax.named_scope("step1_potrf"):
            diag = jax.lax.dynamic_slice(colk, (li_k * v, z0), (v, v))
            a00 = jax.lax.psum(jnp.where(own_x & own_y, diag, 0), ("x", "y"))
            L00 = potrf_tile(a00)

        # --- panel TRSM on the owner column (updateA10) --------------------
        with jax.named_scope("step2_trsm_write"):
            Lcol = trsm_right_lower_t(colk, L00, method="invert")
            Lcol = jnp.where(gt_row[:, None] > k, Lcol, 0)

            # write the factor column in place: L00 on the diagonal tile,
            # Lcol below, zeros above; finals live on layer z==0 only
            newcol = jnp.where(
                own_x, jax.lax.dynamic_update_slice(Lcol, L00, (li_k * v, z0)),
                Lcol)
            newcol = jnp.where((pz == 0) & own_y, newcol,
                               jnp.zeros_like(newcol))
            # block-local select (a full-size where costs two [Ml, Nl] temps)
            curc = jax.lax.dynamic_slice(A, (z0, lj_k * v), (Ml, v))
            A = jax.lax.dynamic_update_slice(
                A, jnp.where(own_y, newcol.astype(A.dtype), curc),
                (z0, lj_k * v)
            )

        # --- panel broadcast of ONLY the per-layer slice --------------------
        # each z layer consumes columns [pz*l, pz*l+l) of the panel, so only
        # that slice moves over 'y' (psum) and 'x' (all_gather) — the
        # reference's per-layer MPI_SUBTILE Iscatterv (Cholesky.cpp:143-144,
        # 459-481), v/Pz of the full-panel volume.
        with jax.named_scope("step3_bcast"):
            sl = (pz * l).astype(jnp.int32)
            Lcolp = jnp.pad(Lcol, ((0, 0), (0, kpad))) if kpad else Lcol
            Lk = jax.lax.psum(
                jnp.where(own_y,
                          jax.lax.dynamic_slice(Lcolp, (z0, sl), (Ml, l)), 0),
                "y",
            )  # [Ml, l]
            Lrow = panel_rows_for_columns(Lk, v, Px, Py, pj, desc.Ntl)

        # --- split-K trailing update: layer pz does a rank-l slice ----------
        with jax.named_scope("step4_update"):
            W = Lrow.transpose(2, 0, 1).reshape(l, Nl)
            mode = "bf16out" if A.dtype == jnp.bfloat16 else precision
            upd = schur_dot(Lk, W, mode)
            live = (gt_row[:, None] > k) & (gt_col[None, :] > k)
            return A - jnp.where(live, upd, 0)

    out = jax.lax.fori_loop(0, Kappa, step, Aloc[0])
    return out[None]


def _local_cholesky_25d_unrolled(
    desc: BlockCyclic, precision: str, Aloc: jnp.ndarray,
    lookahead: bool = False,
) -> jnp.ndarray:
    """Unrolled-step variant: `k` is a Python int, so every panel extraction
    and trailing update slices a *statically shrinking* [r0:, c0:] window
    instead of masking the full local block — recovering the ~3x masked-FLOP
    overhead of the fori version and freeing XLA's scheduler to overlap
    collectives across steps (the reference's comm/compute overlap,
    Cholesky.cpp:484-564, falls out of the dependence structure here).
    Trace size grows with Kappa; use the fori variant for very large step
    counts.

    lookahead=True splits every trailing update: step k+1's tile column is
    updated (and z-reduced) by a small GEMM before the bulk of the window,
    so the next step's a00 psum / panel broadcast depend only on the small
    GEMM and can overlap the bulk — the dependence-structure form of the
    reference's `updateComputeA10` Waitany overlap (Cholesky.cpp:380-564)."""
    v = desc.v
    Px, Py, Pz = desc.grid.Px, desc.grid.Py, desc.grid.Pz
    Ml, Nl = desc.Ml, desc.Nl
    l = desc.nlayr
    kpad = Pz * l - v

    pi = jax.lax.axis_index("x")
    pj = jax.lax.axis_index("y")
    pz = jax.lax.axis_index("z")

    gt_row = local_tile_to_global(pi, Px, v, Ml)
    gt_col = local_tile_to_global(pj, Py, v, Nl)

    A = Aloc[0]
    cdt = jnp.float32 if A.dtype == jnp.bfloat16 else A.dtype
    colnext = (jax.lax.psum(A[:, :v].astype(cdt), "z")
               if lookahead else None)
    for k in range(desc.Nt):
        r0 = (k // Px) * v   # conservative live-row frontier (device-invariant)
        c0 = (k // Py) * v
        mtl_live = desc.Mtl - k // Px
        ntl_live = desc.Ntl - k // Py
        own_y = pj == k % Py
        own_x = pi == k % Px

        with jax.named_scope("step0_reduce"):
            colk = colnext if lookahead else jax.lax.psum(
                A[r0:, c0 : c0 + v].astype(cdt), "z")  # [Ml-r0, v]
        with jax.named_scope("step1_potrf"):
            diag = colk[:v]
            a00 = jax.lax.psum(jnp.where(own_x & own_y, diag, 0), ("x", "y"))
            L00 = potrf_tile(a00)

        with jax.named_scope("step2_trsm_write"):
            Lcol = trsm_right_lower_t(colk, L00, method="invert")
            Lcol = jnp.where(gt_row[r0:, None] > k, Lcol, 0)

            newcol = jnp.where(
                own_x, jax.lax.dynamic_update_slice(Lcol, L00, (0, 0)), Lcol
            )
            newcol = jnp.where((pz == 0) & own_y, newcol,
                               jnp.zeros_like(newcol))
            # write the FULL column: zeros above the live window (the
            # factor's upper triangle), the TRSM result below
            colfull = jnp.concatenate(
                [jnp.zeros((r0, v), A.dtype), newcol.astype(A.dtype)], axis=0)
            A = A.at[:, c0 : c0 + v].set(
                jnp.where(own_y, colfull, A[:, c0 : c0 + v])
            )

        # per-layer slice broadcast (see the fori variant): only columns
        # [pz*l, pz*l+l) of the panel move over 'y' and 'x'
        with jax.named_scope("step3_bcast"):
            sl = (pz * l).astype(jnp.int32)
            Lcolp = jnp.pad(Lcol, ((0, 0), (0, kpad))) if kpad else Lcol
            Lk = jax.lax.psum(
                jnp.where(
                    own_y,
                    jax.lax.dynamic_slice(Lcolp, (jnp.int32(0), sl),
                                          (Ml - r0, l)), 0
                ),
                "y",
            )  # [Ml-r0, l]
            Lrow = panel_rows_for_columns(
                Lk, v, Px, Py, pj, ntl_live,
                base_row_tile=k // Px, base_col_tile=k // Py,
            )
        W = Lrow.transpose(2, 0, 1).reshape(l, ntl_live * v)
        mode = "bf16out" if A.dtype == jnp.bfloat16 else precision
        with jax.named_scope("step4_update"):
            if lookahead and k + 1 < desc.Nt:
                # small update + z-reduction of ONLY step k+1's tile column
                # (full window rows [r0:] — rows leaving the window at k+1
                # still need this step's update); the bulk skips that slice
                c1 = ((k + 1) // Py) * v
                r0n = ((k + 1) // Px) * v
                Wn = W[:, c1 - c0 : c1 - c0 + v]
                updn = schur_dot(Lk, Wn, mode)
                liven = (gt_row[r0:, None] > k) & (gt_col[None,
                                                          c1 : c1 + v] > k)
                A = A.at[r0:, c1 : c1 + v].add(-jnp.where(liven, updn, 0))
                colnext = jax.lax.psum(
                    A[r0n:, c1 : c1 + v].astype(cdt), "z")
                Wb = W.at[:, c1 - c0 : c1 - c0 + v].set(0)
                upd = schur_dot(Lk, Wb, mode)
            else:
                upd = schur_dot(Lk, W, mode)
            live = (gt_row[r0:, None] > k) & (gt_col[None, c0:] > k)
            A = A.at[r0:, c0:].add(-jnp.where(live, upd, 0))
    return A[None]


def _local_cholesky_25d_crout(
    desc: BlockCyclic, precision: str, Aloc: jnp.ndarray,
) -> jnp.ndarray:
    """LEFT-LOOKING (crout) variant: NO trailing update — each step's tile
    column is assembled by ONE big-K GEMM against the frozen L columns
    (local) and the step's factor tile-row (psum-broadcast down each y
    column), so the GEMM K grows with k*v (compute-bound MXU shape)
    instead of the right-looking variants' K = l = v/Pz re-read-bound
    slice. The distributed port of cholesky/single._potrf_flat (the
    measured 35.3 TF/s single-chip left-looking kernel) and the Cholesky
    sibling of lu/p25d._local_lu_25d_crout.

    Per step k (Python int — K grows, shapes must be per-step static):

      * slab: the factor's tile-row k restricted to frozen columns,
        [v, ~k*v/Py] per device — lives on (pi == k%Px, z == 0); one
        masked psum over ('x','z') delivers it to every device in its y
        column (columns with global tile >= k masked: they hold raw
        partials);
      * panel assembly: partial = Lfrozen_local @ slab^T ([mr, v]); one
        psum over ('y','z') of (raw z-partials on the owner column minus
        the layer-0 partials) yields the true updated column EVERYWHERE —
        so the diagonal tile needs no separate ('x','y') broadcast and
        potrf runs redundantly on every device;
      * TRSM + the factor-column write: unchanged.

    Communication per step: [v, k*v/Py] psum over ('x','z') + [mr, v]
    psum over ('y','z') — two collectives (the right-looking variants
    issue four: z-reduce, a00 bcast, y-psum slice, x-all_gather)."""
    v = desc.v
    Px, Py, Pz = desc.grid.Px, desc.grid.Py, desc.grid.Pz
    Ml, Nl = desc.Ml, desc.Nl
    cdt = jnp.float32 if Aloc.dtype == jnp.bfloat16 else Aloc.dtype

    pi = jax.lax.axis_index("x")
    pj = jax.lax.axis_index("y")
    pz = jax.lax.axis_index("z")

    gt_row = local_tile_to_global(pi, Px, v, Ml)
    gt_col = local_tile_to_global(pj, Py, v, Nl)

    A = Aloc[0]
    for k in range(desc.Nt):
        r0 = (k // Px) * v      # static live-row frontier
        li_k = k // Px
        lj_k = k // Py
        c0f = -(-k // Py) * v   # frozen local column bound (boundary tiles
        #                         >= k are masked in the slab)
        own_y = pj == k % Py
        own_x = pi == k % Px

        with jax.named_scope("step0_slab_assembly"):
            if k > 0:
                rowk = jax.lax.slice(A, (li_k * v, 0), (li_k * v + v, c0f))
                rowk = jnp.where((gt_col[None, :c0f] < k) & own_x, rowk, 0)
                slab = jax.lax.psum(rowk.astype(cdt), ("x", "z"))  # [v, c0f]
                Lfro = jax.lax.slice(A, (r0, 0), (Ml, c0f))
                # Schur term: sum_j L[:, j] L[k, j]^T — one big-K MXU GEMM
                partial = schur_dot(
                    Lfro, slab.T,
                    "bf16" if Aloc.dtype == jnp.bfloat16 else precision)
                partial = jnp.where(pz == 0, partial, 0)
            else:
                partial = jnp.zeros((Ml - r0, v), cdt)
            rawc = jax.lax.slice(A, (r0, lj_k * v), (Ml, lj_k * v + v))
            # true updated column for THIS device row's local rows, identical
            # across its (y, z) replicas
            colk = jax.lax.psum(
                jnp.where(own_y, rawc.astype(cdt), 0) - partial, ("y", "z"))

        # diagonal tile lives on the owner x-row; one masked psum over 'x'
        # broadcasts it (colk is already (y,z)-replicated)
        with jax.named_scope("step1_potrf"):
            diag = jax.lax.slice(colk, (li_k * v - r0, 0),
                                 (li_k * v - r0 + v, v))
            a00 = jax.lax.psum(jnp.where(own_x, diag, 0), "x")
            L00 = potrf_tile(a00)

        with jax.named_scope("step2_trsm_write"):
            Lcol = trsm_right_lower_t(colk, L00, method="invert")
            Lcol = jnp.where(gt_row[r0:, None] > k, Lcol, 0)

            newcol = jnp.where(
                own_x,
                jax.lax.dynamic_update_slice(Lcol, L00,
                                             (jnp.int32(li_k * v - r0),
                                              jnp.int32(0))),
                Lcol)
            newcol = jnp.where((pz == 0) & own_y, newcol,
                               jnp.zeros_like(newcol))
            colfull = jnp.concatenate(
                [jnp.zeros((r0, v), A.dtype), newcol.astype(A.dtype)], axis=0)
            A = A.at[:, lj_k * v : lj_k * v + v].set(
                jnp.where(own_y, colfull, A[:, lj_k * v : lj_k * v + v]))
    return A[None]


def _local_cholesky_25d_windowed(
    desc: BlockCyclic, precision: str, windows: int, Aloc: jnp.ndarray
) -> jnp.ndarray:
    """Windowed variant: steps are split into `windows` segments
    (dispatch.segment_bounds); each segment is ONE `fori_loop` body whose
    live window [r0:, c0:] is sliced STATICALLY at the segment's first step.
    Bounded trace (`windows` bodies, any Kappa) with near-unrolled GEMM
    FLOPs — the scalable analog of the reference's shrinking working set
    (Cholesky.cpp:743-813 loops over remaining tiles only)."""
    from conflux_tpu.dispatch import segment_bounds

    v = desc.v
    Px, Py, Pz = desc.grid.Px, desc.grid.Py, desc.grid.Pz
    Ml, Nl = desc.Ml, desc.Nl
    l = desc.nlayr
    kpad = Pz * l - v

    pi = jax.lax.axis_index("x")
    pj = jax.lax.axis_index("y")
    pz = jax.lax.axis_index("z")

    gt_row = local_tile_to_global(pi, Px, v, Ml)
    gt_col = local_tile_to_global(pj, Py, v, Nl)

    A = Aloc[0]
    cdt = jnp.float32 if A.dtype == jnp.bfloat16 else A.dtype
    for k_lo, k_hi in segment_bounds(desc.Nt, windows):
        # conservative static frontiers: every local row/col tile below these
        # offsets is a global tile < k_lo (li*Px + pi <= (k_lo//Px)*Px - 1)
        r0 = (k_lo // Px) * v
        c0 = (k_lo // Py) * v
        ntl_w = desc.Ntl - k_lo // Py

        def step(k, A, r0=r0, c0=c0, ntl_w=ntl_w):
            k = jnp.asarray(k, jnp.int32)  # x64: fori counters are int64
            z0 = jnp.int32(0)
            lj_k = k // Py
            li_k = k // Px
            own_y = pj == k % Py
            own_x = pi == k % Px

            with jax.named_scope("step0_reduce"):
                colk = jax.lax.psum(
                    jax.lax.dynamic_slice(A, (jnp.int32(r0), lj_k * v),
                                          (Ml - r0, v)).astype(cdt), "z"
                )
            with jax.named_scope("step1_potrf"):
                diag = jax.lax.dynamic_slice(colk, (li_k * v - r0, z0),
                                             (v, v))
                a00 = jax.lax.psum(jnp.where(own_x & own_y, diag, 0),
                                   ("x", "y"))
                L00 = potrf_tile(a00)

            with jax.named_scope("step2_trsm_write"):
                Lcol = trsm_right_lower_t(colk, L00, method="invert")
                Lcol = jnp.where(gt_row[r0:, None] > k, Lcol, 0)

                newcol = jnp.where(
                    own_x,
                    jax.lax.dynamic_update_slice(Lcol, L00,
                                                 (li_k * v - r0, z0)),
                    Lcol,
                )
                newcol = jnp.where((pz == 0) & own_y, newcol,
                                   jnp.zeros_like(newcol))
                # full-height write: rows above the window are upper-triangle
                # zeros of the factor (they hold stale partials otherwise)
                colfull = jnp.concatenate(
                    [jnp.zeros((r0, v), A.dtype), newcol.astype(A.dtype)],
                    axis=0
                )
                curc = jax.lax.dynamic_slice(A, (z0, lj_k * v), (Ml, v))
                A = jax.lax.dynamic_update_slice(
                    A, jnp.where(own_y, colfull, curc), (z0, lj_k * v)
                )

            with jax.named_scope("step3_bcast"):
                sl = (pz * l).astype(jnp.int32)
                Lcolp = jnp.pad(Lcol, ((0, 0), (0, kpad))) if kpad else Lcol
                Lk = jax.lax.psum(
                    jnp.where(
                        own_y,
                        jax.lax.dynamic_slice(Lcolp, (z0, sl),
                                              (Ml - r0, l)), 0
                    ),
                    "y",
                )  # [Ml-r0, l]
                Lrow = panel_rows_for_columns(
                    Lk, v, Px, Py, pj, ntl_w,
                    base_row_tile=r0 // v, base_col_tile=c0 // v,
                )
            with jax.named_scope("step4_update"):
                W = Lrow.transpose(2, 0, 1).reshape(l, ntl_w * v)
                mode = "bf16out" if A.dtype == jnp.bfloat16 else precision
                upd = schur_dot(Lk, W, mode)
                live = (gt_row[r0:, None] > k) & (gt_col[None, c0:] > k)
                return A.at[r0:, c0:].add(-jnp.where(live, upd, 0))

        A = jax.lax.fori_loop(k_lo, k_hi, step, A)
    return A[None]


def choose_unroll(desc: BlockCyclic, algorithm: str = "cholesky") -> bool:
    """Round-1 compatibility shim over `dispatch.choose_variant` (the
    measured analog of the reference's (P, N)-keyed variant table,
    Cholesky.cpp:857-921): True iff the unrolled variant is selected."""
    from conflux_tpu.dispatch import choose_variant

    return choose_variant(desc, algorithm) == "unrolled"


@partial(jax.jit, static_argnames=("desc", "precision", "unroll", "windows"))
def cholesky_25d(
    G: jax.Array,
    desc: BlockCyclic,
    precision: str = "highest",
    unroll: "bool | str | None" = None,
    windows: int = 8,
) -> jax.Array:
    """Distributed lower-Cholesky of a block-cyclic (Pz, Px*Ml, Py*Nl) matrix.

    Input must satisfy the z-partial invariant (sum over z = true matrix);
    `layout.distribute` produces exactly that. Output: the factor L in the
    same representation (layer 0 carries L, other layers zeros).

    bf16 STORAGE mode: a bfloat16 G halves per-device HBM — blocks,
    z-partials, and the factor stay bf16 while potrf/TRSM and every
    reduction run f32 (slices upcast before each psum; trailing updates
    accumulate f32, round once per step). Same contract as
    cholesky/single.py's bf16s mode.

    unroll: None (default) auto-selects the rank-program variant
    (dispatch.choose_variant — the measured analog of the reference's (P, N)
    variant table, Cholesky.cpp:857-921); True/False force
    'unrolled'/'fori'; a variant name ('fori'/'unrolled'/'windowed') forces
    that variant. `windows` sets the segment count of the windowed variant.
    """
    from conflux_tpu.dispatch import normalize_variant

    variant = normalize_variant(unroll, desc, "cholesky")
    if desc.M != desc.N:
        raise ConfluxError(ErrorCode.INVALID_SHAPE, "cholesky requires a square matrix")
    if desc.grid.P == 1:
        # (P, N)-keyed variant dispatch parity (Cholesky.cpp:857-921): a
        # 1x1x1 grid needs no collectives — run the flat left-looking
        # single-chip kernel on the device block
        from conflux_tpu.cholesky.single import _potrf_flat

        return _potrf_flat(G[0], desc.v, precision)[None]
    if variant == "windowed":
        body = partial(_local_cholesky_25d_windowed, desc, precision, windows)
    elif variant == "crout":
        body = partial(_local_cholesky_25d_crout, desc, precision)
    elif variant == "unrolled":
        body = partial(_local_cholesky_25d_unrolled, desc, precision)
    elif variant == "lookahead":
        body = partial(_local_cholesky_25d_unrolled, desc, precision, lookahead=True)
    else:
        body = partial(_local_cholesky_25d, desc, precision)
    fn = shard_map(
        body,
        mesh=desc.grid.mesh,
        in_specs=P("z", "x", "y"),
        out_specs=P("z", "x", "y"),
    )
    return fn(G)


def pcholesky(A, grid, v: int = 128, precision: str = "highest"):
    """Convenience API: dense [N, N] SPD matrix -> dense lower factor.

    The distributed analog of `conflux::parallelCholesky`
    (Cholesky.cpp:857-921)."""
    desc = BlockCyclic.create(A.shape[0], A.shape[1], v, grid)
    G = distribute(A, desc)
    L = cholesky_25d(G, desc, precision)
    return undistribute(L, desc)[: A.shape[0], : A.shape[1]]
