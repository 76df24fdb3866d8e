"""API-layer tests: pdgetrf/pdpotrf wrappers, CLIs, profiler, io, validation."""

import os
import subprocess
import sys

import numpy as np
import pytest
import scipy.linalg as sla

from conflux_tpu import profiler
from conflux_tpu.grid import make_grid
from conflux_tpu.io import (
    debug_matrix,
    dense_spd_matrix,
    load_matrix,
    random_matrix,
    save_matrix,
    spd_matrix,
)
from conflux_tpu.scalapack import pdgetrf, pdpotrf
from conflux_tpu.validation import (
    cholesky_residual_dense,
    growth_factor,
    lu_residual_dense,
)


def test_pdgetrf_wrapper(rng):
    n = 64
    A = rng.standard_normal((n, n)).astype(np.float32)
    f = pdgetrf(A, grid=make_grid((2, 2, 2)), v=8)
    F = f.dense()
    res = lu_residual_dense(A, F, f.perm)
    assert res < 1e-6

    # LAPACK ipiv compatibility: applying getrf-style swaps to A must equal PA
    ipiv = f.ipiv()
    B = A.copy()
    for i, p in enumerate(ipiv - 1):
        B[[i, p]] = B[[p, i]]
    np.testing.assert_array_equal(B, A[np.asarray(f.perm)])


def test_pdgetrf_ipiv_matches_scipy_for_full_pivoting(rng):
    n = 32
    A = rng.standard_normal((n, n)).astype(np.float32)
    f = pdgetrf(A, grid=make_grid((2, 2, 1)), v=8, pivoting="full")
    lu_s, piv_s = sla.lu_factor(A.astype(np.float64))
    np.testing.assert_array_equal(f.ipiv() - 1, piv_s)


def test_pdpotrf_wrapper():
    n = 64
    A = dense_spd_matrix(n)
    f = pdpotrf(A, grid=make_grid((2, 2, 2)), v=8)
    L = np.tril(f.dense())[:n, :n]
    assert cholesky_residual_dense(A, L) < 1e-6


def test_io_generators(tmp_path):
    A = random_matrix(16, 16, seed=1)
    assert (A >= 5).all() and (A < 6).all()  # 5 + U[0,1)
    D = debug_matrix(16)
    assert np.abs(D).max() >= 100  # planted dominant entries
    S = spd_matrix(64, v=16)
    np.testing.assert_allclose(S, S.T)
    assert np.linalg.eigvalsh(S.astype(np.float64)).min() > 0
    p = tmp_path / "m.bin"
    save_matrix(str(p), A)
    np.testing.assert_allclose(load_matrix(str(p), 16), A, atol=1e-6)


def test_profiler_report():
    prof = profiler.Profiler()
    with prof.region("outer"):
        with prof.region("inner"):
            pass
    rep = prof.report()
    assert "outer" in rep and "inner" in rep
    prof.clear()
    assert prof.report().count("\n") == 0


def test_growth_factor(rng):
    A = rng.standard_normal((32, 32)).astype(np.float32)
    from conflux_tpu.lu.single import lu_factor
    import jax.numpy as jnp

    F, perm = lu_factor(jnp.asarray(A), v=8)
    g = growth_factor(A, np.asarray(F))
    assert 0.5 < g < 100  # partial pivoting keeps growth modest


_ENV = {
    **os.environ,
    "XLA_FLAGS": os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8",
}


def _run_cli(mod, *args):
    return subprocess.run(
        [sys.executable, "-m", mod, *args],
        capture_output=True,
        text=True,
        env=_ENV,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=600,
    )


@pytest.mark.slow
def test_conflux_miniapp_cli():
    r = _run_cli(
        "conflux_tpu.cli.conflux_miniapp",
        "-N", "64", "-b", "8", "-p", "2x2x2", "-r", "1",
        "--validate", "--platform", "cpu", "--force_devices", "8",
    )
    assert r.returncode == 0, r.stderr
    lines = [l for l in r.stdout.splitlines() if l.startswith("_result_")]
    assert any(",time,strong," in l for l in lines), r.stdout
    res_line = [l for l in lines if ",residual," in l][0]
    assert float(res_line.split(",")[-2]) < 1e-6


@pytest.mark.slow
def test_cholesky_miniapp_cli():
    r = _run_cli(
        "conflux_tpu.cli.cholesky_miniapp",
        "-N", "64", "-v", "8", "-g", "2x2x2", "-r", "1",
        "--validate", "--platform", "cpu", "--force_devices", "8",
    )
    assert r.returncode == 0, r.stderr
    assert "_result_ cholesky,psychol,64" in r.stdout
    res_line = [l for l in r.stdout.splitlines() if ",residual," in l][0]
    assert float(res_line.split(",")[-2]) < 1e-6


@pytest.mark.slow
def test_cholesky_helper_cli(tmp_path):
    d = str(tmp_path)
    r = _run_cli("conflux_tpu.cli.cholesky_helper", "--generate", "32", "--dir", d)
    assert r.returncode == 0, r.stderr
    # factor the generated input, dump, compare
    A = load_matrix(os.path.join(d, "input_32.bin"), 32)
    L = np.linalg.cholesky(A)
    save_matrix(os.path.join(d, "output_32.bin"), L)
    r = _run_cli("conflux_tpu.cli.cholesky_helper", "--compare", "32", "--dir", d)
    assert r.returncode == 0 and "OK" in r.stdout
    # corrupted output must be flagged
    L[5, 3] += 1.0
    save_matrix(os.path.join(d, "output_32.bin"), L)
    r = _run_cli("conflux_tpu.cli.cholesky_helper", "--compare", "32", "--dir", d)
    assert r.returncode == 1 and "MISMATCH" in r.stdout
