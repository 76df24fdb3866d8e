"""Mixed-precision trailing updates + solve utilities + bench harness."""

import numpy as np
import jax.numpy as jnp
import pytest

from conflux_tpu.bench.harness import CSV_HEADER, Result, append_results, bench_distributed
from conflux_tpu.cholesky.p25d import pcholesky
from conflux_tpu.cholesky.single import cholesky
from conflux_tpu.grid import make_grid
from conflux_tpu.lu.p25d import plu
from conflux_tpu.lu.single import lu_factor, lu_residual
from conflux_tpu.solve import cho_solve, lu_solve
from conflux_tpu.validation import cholesky_residual_dense, lu_residual_dense


@pytest.mark.parametrize("prec,tol", [("highest", 1e-6), ("high", 1e-6), ("bf16", 1e-2)])
def test_lu_precision_modes(rng, prec, tol):
    n = 256
    A = rng.standard_normal((n, n)).astype(np.float32)
    F, perm = lu_factor(jnp.asarray(A), v=64, precision=prec)
    assert lu_residual_dense(A, np.asarray(F), np.asarray(perm)) < tol


@pytest.mark.parametrize("prec,tol", [("high", 1e-6), ("bf16", 1e-2)])
def test_distributed_precision_modes(rng, prec, tol):
    n = 64
    grid = make_grid((2, 2, 2))
    A = rng.standard_normal((n, n)).astype(np.float32)
    F, perm = plu(A, grid, v=8, precision=prec)
    assert lu_residual_dense(A, np.asarray(F), np.asarray(perm)) < tol
    B = rng.standard_normal((n, n))
    S = (B @ B.T + n * np.eye(n)).astype(np.float32)
    L = np.asarray(pcholesky(S, grid, v=8, precision=prec))
    assert cholesky_residual_dense(S, L) < tol


def test_lu_solve(rng):
    n = 128
    A = rng.standard_normal((n, n)).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    F, perm = lu_factor(jnp.asarray(A), v=32)
    x = np.asarray(lu_solve(F, perm, jnp.asarray(b)))
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) < 1e-4
    # multi-RHS
    B = rng.standard_normal((n, 3)).astype(np.float32)
    X = np.asarray(lu_solve(F, perm, jnp.asarray(B)))
    assert np.abs(A @ X - B).max() < 1e-3


def test_cho_solve(rng):
    n = 128
    B = rng.standard_normal((n, n))
    A = (B @ B.T + n * np.eye(n)).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    L = cholesky(jnp.asarray(A), v=32)
    x = np.asarray(cho_solve(L, jnp.asarray(b)))
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) < 1e-4


def test_bench_harness_csv(tmp_path):
    grid = make_grid((2, 2, 1))
    csv_path = str(tmp_path / "benchmarks.csv")
    res = bench_distributed("cholesky", grid, sizes=[32], v=8, reps=2,
                            csv_path=csv_path)
    assert len(res) == 2
    lines = open(csv_path).read().splitlines()
    assert lines[0] == ",".join(CSV_HEADER)
    assert lines[1].startswith("cholesky,psychol,32,32,4,2x2x1,time,strong,")
    # appending preserves the single header
    append_results(csv_path, [Result("lu", "conflux-tpu", 8, 8, 1, "1x1x1",
                                     "time", "strong", 1.0, 8)])
    lines = open(csv_path).read().splitlines()
    assert len([l for l in lines if l.startswith("algorithm")]) == 1
