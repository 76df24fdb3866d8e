"""Dataflow proof of the lookahead variants' comm/compute overlap.

The reference overlaps communication with the trailing update through
explicit MPI Waitany loops (src/conflux/cholesky/Cholesky.cpp:380-564, the
LU loop conflux_opt.hpp:1613-1634). On TPU, XLA's latency-hiding scheduler
performs the overlap — but only if the independence exists in the dataflow:
step k+1's panel-column z-reduction must NOT transitively depend on step k's
bulk trailing GEMM. These tests verify that property on the traced jaxpr
(backend-independent — a pure dependence-graph check): for the `lookahead`
variants, each z-psum's transitive input cone excludes the immediately
preceding bulk GEMM; for the plain unrolled variants it includes it.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from conflux_tpu.cholesky.p25d import _local_cholesky_25d_unrolled
from conflux_tpu.grid import make_grid
from conflux_tpu.layout import BlockCyclic
from conflux_tpu.lu.p25d import _local_lu_25d_unrolled


def _eqn_dot_flops(eqn) -> int:
    """Total dot_general FLOPs inside an eqn (recursing into nested calls)."""
    if eqn.primitive.name == "dot_general":
        out = eqn.outvars[0].aval.shape
        lhs = eqn.invars[0].aval.shape
        (lc, _), _ = eqn.params["dimension_numbers"]
        contract = 1
        for d in lc:
            contract *= lhs[d]
        return 2 * contract * math.prod(out)
    total = 0
    for p in eqn.params.values():
        jx = getattr(p, "jaxpr", None)
        if jx is not None:
            for e in jx.eqns:
                total += _eqn_dot_flops(e)
    return total


def _overlap_pairs(inner_jaxpr, bulk_threshold: int):
    """Walk the eqns in order, propagating per-var transitive-dependence
    sets of bulk-GEMM ids ('b#') and z-psum ids ('p#').

    Returns (psums, bulks): psums is a list of (psum_id, bulk_deps), bulks a
    list of (bulk_id, psum_deps). A psum/bulk pair is OVERLAPPABLE iff
    neither is in the other's cone — the property XLA's latency-hiding
    scheduler needs to run the collective concurrently with the GEMM."""
    deps: dict = {}

    def get(v):
        # literals have no binding eqn; anything unseen contributes nothing
        return deps.get(id(v), frozenset())

    psums, bulks = [], []
    for eqn in inner_jaxpr.eqns:
        indeps = frozenset().union(*[get(v) for v in eqn.invars]) if eqn.invars else frozenset()
        if eqn.primitive.name.startswith("psum"):
            axes = eqn.params.get("axes", ())
            if tuple(axes) == ("z",):
                pid = f"p{len(psums)}"
                psums.append((pid, indeps))
                indeps = indeps | {pid}
        if _eqn_dot_flops(eqn) >= bulk_threshold:
            bid = f"b{len(bulks)}"
            bulks.append((bid, indeps))
            indeps = indeps | {bid}
        for v in eqn.outvars:
            deps[id(v)] = indeps
    return psums, bulks


def _inner_jaxpr(fn, x_shape):
    jaxpr = jax.make_jaxpr(fn)(jnp.zeros(x_shape, jnp.float32))
    for eqn in jaxpr.jaxpr.eqns:
        if "shard_map" in eqn.primitive.name:
            inner = eqn.params["jaxpr"]
            return getattr(inner, "jaxpr", inner)
    raise AssertionError("no shard_map eqn found")


def _check(psums, bulks, lookahead: bool, nsteps: int):
    """Count z-psums that have at least one OVERLAPPABLE bulk GEMM (mutual
    non-dependence). The plain unrolled programs are a total chain (zero
    overlappable pairs); the lookahead programs free one bulk per step."""
    assert psums and bulks, "no z-psums / bulk GEMMs found (threshold?)"
    free = 0
    for pid, bdeps in psums:
        for bid, pdeps in bulks:
            if bid not in bdeps and pid not in pdeps:
                free += 1
                break
    if lookahead:
        # every colnext psum in the early half overlaps its step's bulk (the
        # initial psum precedes all bulks; tail-step bulks shrink below the
        # fixed threshold, so only the early steps are assertable)
        assert free >= max(1, nsteps // 2 - 1), (
            f"only {free}/{len(psums)} z-psums are overlappable with any "
            f"bulk GEMM — lookahead dependence structure broken")
    else:
        assert free == 0, (
            f"{free} z-psums unexpectedly overlappable in the plain "
            f"unrolled program (bulk threshold mis-tuned?)")


@pytest.mark.parametrize("lookahead", [False, True])
def test_cholesky_lookahead_dependence(lookahead):
    grid = make_grid((2, 2, 2))
    n, v = 256, 32
    desc = BlockCyclic.create(n, n, v, grid)
    body = partial(_local_cholesky_25d_unrolled, desc, "high",
                   lookahead=lookahead)
    fn = shard_map(body, mesh=desc.grid.mesh, in_specs=P("z", "x", "y"),
                   out_specs=P("z", "x", "y"))
    inner = _inner_jaxpr(fn, desc.global_shape())
    # bulk = wider than one tile column: > 2 * Ml * v * nlayr
    threshold = 2 * desc.Ml * v * desc.nlayr + 1
    psums, bulks = _overlap_pairs(inner, threshold)
    _check(psums, bulks, lookahead, desc.Nt)


@pytest.mark.parametrize("lookahead", [False, True])
def test_lu_lookahead_dependence(lookahead):
    grid = make_grid((2, 2, 2))
    n, v = 256, 32
    desc = BlockCyclic.create(n, n, v, grid)
    body = partial(_local_lu_25d_unrolled, desc, "tournament", "high",
                   lookahead=lookahead)
    fn = shard_map(body, mesh=desc.grid.mesh,
                   in_specs=(P("z", "x", "y"), P("z", "x", "y"),
                             P("z", "x", "y", None)),
                   out_specs=(P("z", "x", "y"), P("z", "x", "y", None)))
    jaxpr = jax.make_jaxpr(
        lambda a: fn(a, jnp.zeros(desc.global_shape(), jnp.float32),
                     jnp.zeros((desc.grid.Pz, desc.grid.Px, desc.grid.Py,
                                desc.M), jnp.int32))
    )(jnp.zeros(desc.global_shape(), jnp.float32))
    inner = None
    for eqn in jaxpr.jaxpr.eqns:
        if "shard_map" in eqn.primitive.name:
            inner = eqn.params["jaxpr"]
            inner = getattr(inner, "jaxpr", inner)
    assert inner is not None
    threshold = 2 * desc.Ml * v * desc.nlayr + 1
    psums, bulks = _overlap_pairs(inner, threshold)
    _check(psums, bulks, lookahead, desc.Nt)
