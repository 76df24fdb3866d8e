"""Communication-volume accounting gates (VERDICT item 9).

The spec counts the elements each collective of the SPMD program actually
moves (shape-derived, ring model — see conflux_tpu/spec.py docstring), the
analog of the reference simulator's measured per-rank counts
(python/conflux.py:114-119,345-360). These tests pin the counts to closed
forms computed independently and assert the 2.5D scaling law.
"""

import numpy as np
import pytest

from conflux_tpu.spec import CommVolume, tournament_lu_np


def _run(n, v, Px, Pz, Py=2, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    _, _, comm = tournament_lu_np(A, v, Px, Pz, Py)
    return comm


def test_counters_match_closed_forms():
    n, v, Px, Py, Pz = 64, 8, 2, 2, 2
    comm = _run(n, v, Px, Pz, Py)
    Nt = n // v
    Ml, Nl, l = n // Px, n // Py, v // Pz
    # step-0 panel column z-psum: [Ml, v] over Pz, on every (x, y) column
    assert comm.psum_z == Nt * 2 * Ml * v * (Pz - 1) * Px * Py
    # butterfly: Px=2 -> 1 round, 2 ppermute pairs, on every (y, z) replica
    assert comm.rounds_x == Nt * 1
    assert comm.tournament_x == Nt * 2 * v * (v + 1) * Py * Pz
    # pivot bcast: [v, v] + [v] psum over Py, groups Px*Pz
    assert comm.pivot_bcast_y == Nt * 2 * (v * v + v) * (Py - 1) * Px * Pz
    # pivot-row gather: [v, Nl] psum over Px*Pz, groups Py
    assert comm.row_gather_xz == Nt * 2 * v * Nl * (Px * Pz - 1) * Py
    # per-layer panel slice: [Ml, l] psum over Py, groups Px*Pz
    assert comm.panel_slice_y == Nt * 2 * Ml * l * (Py - 1) * Px * Pz


def test_panel_slice_volume_halves_when_pz_doubles():
    # the 2.5D point: each z layer consumes only an l = v/Pz slice of the
    # panel, so PER-RANK panel-broadcast traffic halves when Pz doubles at
    # fixed (Px, Py) (reference: nlayr slicing + Iscatterv,
    # lu_params.hpp:73, conflux_opt.hpp:1424-1434)
    n, v = 64, 8
    c1 = _run(n, v, Px=2, Pz=1)
    c2 = _run(n, v, Px=2, Pz=2)
    P1, P2 = 2 * 2 * 1, 2 * 2 * 2
    r1 = c1.panel_slice_y / P1
    r2 = c2.panel_slice_y / P2
    assert r2 == pytest.approx(r1 / 2)


def test_per_rank_total_decreases_with_p_strong_scaling():
    # strong scaling: per-rank communication volume shrinks as the grid
    # grows at fixed N (the N^2/sqrt(P) law, within constants)
    n, v = 256, 16
    small = _run(n, v, Px=2, Pz=1, Py=2)
    large = _run(n, v, Px=4, Pz=1, Py=4)
    assert large.per_rank(16) < small.per_rank(4)


@pytest.mark.parametrize("variant", ["rightlook", "crout"])
@pytest.mark.parametrize("rowpart", [0, 2])
def test_model_comm_matches_simulator(variant, rowpart):
    # the O(Nt) closed-form model (spec.model_comm_volume — what projects
    # multi-chip scaling at reference-matrix sizes) must agree with the
    # simulator's counters field by field
    from conflux_tpu.spec import model_comm_volume, tournament_lu_np

    n, v, Px, Py, Pz = 96, 8, 3, 2, 2   # non-pow2 Px: multicast rounds too
    A = np.random.default_rng(0).standard_normal((n, n))
    _, _, want = tournament_lu_np(A, v, Px, Pz, Py, rowpart=rowpart,
                                  variant=variant)
    got = model_comm_volume(n, v, Px, Pz, Py, rowpart=rowpart,
                            variant=variant)
    for f in ("psum_z", "tournament_x", "pivot_bcast_y", "row_gather_xz",
              "panel_slice_y", "rebalance_x", "panel_asm_yz", "uslab_y",
              "uslab_ag_x", "lpiv_ag_y", "u12_corr_x", "rounds_x"):
        assert getattr(got, f) == getattr(want, f), f


def test_total_is_sum_of_fields():
    comm = CommVolume(psum_z=1, tournament_x=2, pivot_bcast_y=3,
                      row_gather_xz=4, panel_slice_y=5)
    assert comm.total() == 15
    assert comm.per_rank(3) == 5


def _collect_spmd_volumes(n, v, Px, Py, Pz, rowpart, variant="unrolled"):
    """Trace the unrolled/crout SPMD LU and accumulate per-class ring
    volumes from the jaxpr's collectives (shapes+axes drive the
    arithmetic)."""
    import jax
    import jax.numpy as jnp

    from conflux_tpu.grid import make_grid
    from conflux_tpu.layout import BlockCyclic, distribute
    from conflux_tpu.lu.p25d import lu_25d

    P = Px * Py * Pz
    grid = make_grid((Px, Py, Pz))
    desc = BlockCyclic.create(n, n, v, grid)
    A = np.random.default_rng(0).standard_normal((n, n)).astype(np.float32)
    G = distribute(A, desc)
    jaxpr = jax.make_jaxpr(
        lambda G: lu_25d(G, desc, "tournament", "highest", variant,
                         rowpart=rowpart)
    )(G)

    l = -(-v // Pz)
    Nl = n // Py
    size = {"x": Px, "y": Py, "z": Pz}
    crout = variant == "crout"
    got = CommVolume()
    rounds = 0

    def group(axes):
        g = 1
        for a in axes:
            g *= size[a]
        return g

    def walk(jx):
        nonlocal got, rounds
        for eqn in jx.eqns:
            nm = eqn.primitive.name
            if nm in ("psum", "psum_invariant"):
                axes = tuple(eqn.params["axes"])
                s = group(axes)
                vol = sum(2.0 * np.prod(x.aval.shape) * (s - 1) * (P // s)
                          for x in eqn.invars)
                shp = tuple(eqn.invars[0].aval.shape)
                if axes == ("z",):
                    assert not crout, "crout has no z-only reduction"
                    assert shp[1:] == (v,), shp
                    got.psum_z += vol
                elif set(axes) == {"y", "z"}:
                    # crout fused panel assembly [mr, v]
                    assert crout and shp[1:] == (v,), (axes, shp)
                    got.panel_asm_yz += vol
                elif set(axes) == {"x", "z"}:
                    assert shp == (v, Nl), shp
                    got.row_gather_xz += vol
                elif axes == ("x",):
                    if len(shp) == 1:
                        # rebalance cnt psum ([n] global live counts)
                        assert shp == (n,), shp
                        got.rebalance_x += vol
                    else:
                        # crout U12 correction [v, nw]
                        assert crout and shp[0] == v, (axes, shp)
                        got.u12_corr_x += vol
                elif axes == ("y",):
                    if crout:
                        # U slab [nmy*v, v] (pivot bcast is gone: colk is
                        # replicated over 'y' by the panel-assembly psum)
                        assert len(shp) == 2 and shp[1] == v, shp
                        got.uslab_y += vol
                    elif shp in ((v,), (v, v)):
                        got.pivot_bcast_y += vol
                    elif len(shp) == 2 and shp[1] == l:
                        got.panel_slice_y += vol
                    else:  # pragma: no cover
                        raise AssertionError(f"unmodeled y-psum shape {shp}")
                else:  # pragma: no cover
                    raise AssertionError(f"unmodeled psum axes {axes}")
            elif nm == "ppermute":
                ax = eqn.params["axis_name"]
                axes = tuple(ax) if isinstance(ax, (tuple, list)) else (ax,)
                assert set(axes) <= {"x"}, axes
                e = sum(int(np.prod(x.aval.shape)) for x in eqn.invars)
                got.tournament_x += e * len(eqn.params["perm"]) * (P // Px)
                rounds += 1
            elif nm == "reduce_scatter":
                ax = eqn.params.get("axis_name")
                axes = tuple(ax) if isinstance(ax, (tuple, list)) else (ax,)
                assert set(axes) <= {"x"}, axes
                e = sum(int(np.prod(x.aval.shape)) for x in eqn.invars)
                got.rebalance_x += float(e) * (Px - 1) * (P // Px)
            elif nm == "all_gather" and crout:
                ax = eqn.params.get("axis_name")
                axes = tuple(ax) if isinstance(ax, (tuple, list)) else (ax,)
                shp = tuple(eqn.invars[0].aval.shape)
                e = int(np.prod(shp))
                g = group(axes)
                vol = float(e) * (g - 1) * g * (P // g)
                if axes == ("x",):
                    assert shp[1] == v, shp   # U slab [nmy*v, v]
                    got.uslab_ag_x += vol
                elif axes == ("y",):
                    assert shp[0] == v, shp   # L history [v, nbf*v]
                    got.lpiv_ag_y += vol
                else:  # pragma: no cover
                    raise AssertionError(f"unmodeled all_gather {axes}")
            elif nm in ("all_gather", "all_to_all"):  # pragma: no cover
                raise AssertionError(f"unmodeled collective {nm}")
            for p in eqn.params.values():
                if hasattr(p, "jaxpr"):
                    walk(p.jaxpr)
                elif hasattr(p, "eqns"):
                    walk(p)

    walk(jaxpr.jaxpr)
    return A, got, rounds


@pytest.mark.parametrize("rowpart", [0, 2])
def test_spmd_jaxpr_collectives_match_model(rowpart):
    """The comm model as an ENFORCED invariant (VERDICT r2 weak #7): walk
    the traced SPMD program and check that every collective's operand
    shapes, axes, and ring volumes reproduce CommVolume's per-class counts
    exactly — including the row-frontier rebalance traffic (rowpart=2:
    shrinking panel z-reductions / L10 broadcasts + cnt psum +
    psum_scatter slab movement)."""
    n, v = 64, 8
    Px, Py, Pz = 2, 2, 2
    A, got, rounds = _collect_spmd_volumes(n, v, Px, Py, Pz, rowpart)

    _, _, want = tournament_lu_np(A.astype(np.float64), v, Px, Pz, Py,
                                  rowpart=rowpart)
    assert got.psum_z == want.psum_z
    assert got.row_gather_xz == want.row_gather_xz
    assert got.pivot_bcast_y == want.pivot_bcast_y
    assert got.panel_slice_y == want.panel_slice_y
    assert got.tournament_x == want.tournament_x
    assert got.rebalance_x == want.rebalance_x
    # ppermute eqn pairs: 2 arrays (vals+idx) per round per step
    assert rounds == 2 * want.rounds_x


@pytest.mark.parametrize("rowpart", [0, 2])
def test_spmd_jaxpr_collectives_match_model_crout(rowpart):
    """Comm-model enforcement for the LEFT-LOOKING rank program: the
    trailing-update broadcasts must be GONE (psum_z = panel_slice_y =
    pivot_bcast_y = 0) and the U-history movement must match the model's
    closed forms per class."""
    n, v = 64, 8
    Px, Py, Pz = 2, 2, 2
    A, got, rounds = _collect_spmd_volumes(n, v, Px, Py, Pz, rowpart,
                                           variant="crout")
    _, _, want = tournament_lu_np(A.astype(np.float64), v, Px, Pz, Py,
                                  rowpart=rowpart, variant="crout")
    assert got.psum_z == 0 and want.psum_z == 0
    assert got.panel_slice_y == 0 and want.panel_slice_y == 0
    assert got.pivot_bcast_y == 0 and want.pivot_bcast_y == 0
    assert got.panel_asm_yz == want.panel_asm_yz
    assert got.uslab_y == want.uslab_y
    assert got.uslab_ag_x == want.uslab_ag_x
    assert got.lpiv_ag_y == want.lpiv_ag_y
    assert got.u12_corr_x == want.u12_corr_x
    assert got.row_gather_xz == want.row_gather_xz
    assert got.tournament_x == want.tournament_x
    assert got.rebalance_x == want.rebalance_x
    assert rounds == 2 * want.rounds_x


def test_spmd_jaxpr_collectives_match_model_crout_fused():
    """The Px == 1 fused crout path (merged=False finishing, p25d `fin`)
    replaces _pivot_factors with ONE extra [v, v] lu00 psum over 'y' per
    step, modeled as pivot_bcast_y: the traced program's TOTAL collective
    volume must equal the model's, and the simulator must carry the same
    term."""
    from conflux_tpu.spec import model_comm_volume, tournament_lu_np

    n, v = 64, 8
    Px, Py, Pz = 1, 2, 2
    A, got, rounds = _collect_spmd_volumes(n, v, Px, Py, Pz, 2,
                                           variant="crout")
    want = model_comm_volume(n, v, Px, Pz=Pz, Py=Py, rowpart=2,
                             variant="crout")
    assert rounds == 0                      # no butterfly at Px == 1
    assert got.total() == want.total()
    # the fused lu00 broadcast is modeled, nonzero at Py > 1, and agrees
    # with the simulator's counter
    assert want.pivot_bcast_y == (n // v) * 2 * v * v * (Py - 1) * Pz
    _, _, sim = tournament_lu_np(A.astype(np.float64), v, Px, Pz, Py,
                                 rowpart=2, variant="crout")
    assert sim.pivot_bcast_y == want.pivot_bcast_y


def test_cholesky_crout_jaxpr_collectives_closed_form():
    """Comm enforcement for the LEFT-LOOKING Cholesky rank program: per
    step, exactly (a) the factor tile-row slab psum over ('x','z') of
    [v, c0f] (k > 0), (b) the fused column-assembly psum over ('y','z')
    of [Ml-r0, v], and (c) the diagonal-tile psum over 'x' of [v, v] —
    the right-looking schedule's z-reduce / y-slice / x-all_gather must
    be GONE."""
    import jax

    from conflux_tpu.cholesky.p25d import cholesky_25d
    from conflux_tpu.grid import make_grid
    from conflux_tpu.layout import BlockCyclic, distribute

    n, v = 64, 8
    Px, Py, Pz = 2, 2, 2
    P = Px * Py * Pz
    grid = make_grid((Px, Py, Pz))
    desc = BlockCyclic.create(n, n, v, grid)
    B = np.random.default_rng(0).standard_normal((n, n))
    S = (B @ B.T + n * np.eye(n)).astype(np.float32)
    G = distribute(S, desc)
    jaxpr = jax.make_jaxpr(
        lambda G: cholesky_25d(G, desc, "highest", "crout"))(G)

    Ml = n // Px
    size = {"x": Px, "y": Py, "z": Pz}
    got = {"slab": 0.0, "col": 0.0, "a00": 0.0}

    def walk(jx):
        for eqn in jx.eqns:
            nm = eqn.primitive.name
            if nm in ("psum", "psum_invariant"):
                axes = tuple(sorted(eqn.params["axes"]))
                g = int(np.prod([size[a] for a in axes]))
                vol = sum(2.0 * np.prod(x.aval.shape) * (g - 1) * (P // g)
                          for x in eqn.invars)
                shp = tuple(eqn.invars[0].aval.shape)
                if axes == ("x", "z"):
                    assert shp[0] == v, shp
                    got["slab"] += vol
                elif axes == ("y", "z"):
                    assert shp[1] == v, shp
                    got["col"] += vol
                elif axes == ("x",):
                    assert shp == (v, v), shp
                    got["a00"] += vol
                else:  # pragma: no cover
                    raise AssertionError(f"unmodeled psum axes {axes}")
            elif nm in ("all_gather", "ppermute",
                        "reduce_scatter", "all_to_all"):  # pragma: no cover
                raise AssertionError(f"unmodeled collective {nm}")
            for p in eqn.params.values():
                if hasattr(p, "jaxpr"):
                    walk(p.jaxpr)
                elif hasattr(p, "eqns"):
                    walk(p)

    walk(jaxpr.jaxpr)

    # wants come from the O(Nt) projection model itself, so the model is
    # enforced against the traced program (spec.model_cholesky_comm_volume)
    from conflux_tpu.spec import model_cholesky_comm_volume

    want = model_cholesky_comm_volume(n, v, Px, Py, Pz, variant="crout")
    assert got["slab"] == want["slab_xz"]
    assert got["col"] == want["col_yz"]
    assert got["a00"] == want["a00_x"]


def test_cholesky_spmd_jaxpr_collectives_closed_form():
    """Same enforcement for the 2.5D Cholesky rank program: its collective
    schedule is data-independent, so the per-step ring volumes are checked
    against closed forms directly (fori variant: the loop body is traced
    once; volumes below are per step).

      reduceA11 lazy column:  psum  over 'z'     of [Ml, v]  on Px*Py groups
      choleskyA00 broadcast:  psum  over (x,y)   of [v, v]   on Pz replicas
      updateA10 slice bcast:  psum  over 'y'     of [Ml, l]  on Px*Pz groups
      panel row collection:   all_gather over 'x' of [Ml, l] on Py*Pz groups
    """
    import jax

    from conflux_tpu.cholesky.p25d import cholesky_25d
    from conflux_tpu.grid import make_grid
    from conflux_tpu.layout import BlockCyclic, distribute

    n, v = 64, 8
    Px, Py, Pz = 2, 2, 2
    P = Px * Py * Pz
    grid = make_grid((Px, Py, Pz))
    desc = BlockCyclic.create(n, n, v, grid)
    B = np.random.default_rng(0).standard_normal((n, n))
    S = (B @ B.T + n * np.eye(n)).astype(np.float32)
    G = distribute(S, desc)
    jaxpr = jax.make_jaxpr(
        lambda G: cholesky_25d(G, desc, "highest", False))(G)

    Ml, l = n // Px, v // Pz
    size = {"x": Px, "y": Py, "z": Pz}
    got = {"z": 0.0, "xy": 0.0, "y": 0.0, "ag": 0.0}

    def walk(jx):
        for eqn in jx.eqns:
            nm = eqn.primitive.name
            if nm in ("psum", "psum_invariant"):
                axes = tuple(eqn.params["axes"])
                g = int(np.prod([size[a] for a in axes]))
                vol = sum(2.0 * np.prod(x.aval.shape) * (g - 1) * (P // g)
                          for x in eqn.invars)
                shp = tuple(eqn.invars[0].aval.shape)
                if axes == ("z",):
                    assert shp == (Ml, v), shp
                    got["z"] += vol
                elif set(axes) == {"x", "y"}:
                    assert shp == (v, v), shp
                    got["xy"] += vol
                elif axes == ("y",):
                    assert shp == (Ml, l), shp
                    got["y"] += vol
                else:  # pragma: no cover
                    raise AssertionError(f"unmodeled psum axes {axes}")
            elif nm == "all_gather":
                ax = eqn.params.get("axis_name")
                axes = tuple(ax) if isinstance(ax, (tuple, list)) else (ax,)
                assert axes == ("x",), axes
                shp = tuple(eqn.invars[0].aval.shape)
                assert shp == (Ml, l), shp
                e = int(np.prod(shp))
                got["ag"] += float(e) * (Px - 1) * Px * (P // Px)
            elif nm in ("ppermute", "reduce_scatter",
                        "all_to_all"):  # pragma: no cover
                raise AssertionError(f"unmodeled collective {nm}")
            for p in eqn.params.values():
                if hasattr(p, "jaxpr"):
                    walk(p.jaxpr)
                elif hasattr(p, "eqns"):
                    walk(p)

    walk(jaxpr.jaxpr)

    assert got["z"] == 2 * Ml * v * (Pz - 1) * Px * Py
    assert got["xy"] == 2 * v * v * (Px * Py - 1) * Pz
    assert got["y"] == 2 * Ml * l * (Py - 1) * Px * Pz
    assert got["ag"] == Ml * l * (Px - 1) * Px * Py * Pz

    # the O(Nt) projection model carries the same per-step forms
    from conflux_tpu.spec import model_cholesky_comm_volume

    Nt = n // v
    want = model_cholesky_comm_volume(n, v, Px, Py, Pz)
    assert want["reduce_z"] == Nt * got["z"]
    assert want["a00_xy"] == Nt * got["xy"]
    assert want["slice_y"] == Nt * got["y"]
    assert want["panel_ag_x"] == Nt * got["ag"]
