"""Sweep CLI + plotting pipeline end-to-end (launch-generator / R-script
parity, SURVEY.md §2.2)."""

import os
import subprocess
import sys

import pytest

_ENV = {
    **os.environ,
    "XLA_FLAGS": os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8",
}
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(mod, *args):
    return subprocess.run(
        [sys.executable, "-m", mod, *args],
        capture_output=True, text=True, env=_ENV, cwd=_REPO, timeout=600,
    )


@pytest.mark.slow
def test_sweep_and_plots(tmp_path):
    ini = tmp_path / "p.ini"
    csvp = tmp_path / "b.csv"
    ini.write_text(
        "[sweep_a]\nalgorithm = cholesky\ntype = strong\nsizes = 32\n"
        f"grid = 2x2x1\ntile = 8\nreps = 2\ncsv = {csvp}\n"
        "[sweep_b]\nalgorithm = lu\ntype = weak\nsizes = 16\n"
        f"grid = 2x2x1\ntile = 8\nreps = 1\ncsv = {csvp}\n"
    )
    r = _run("conflux_tpu.cli.sweep", str(ini), "--platform", "cpu",
             "--force_devices", "8")
    assert r.returncode == 0, r.stderr
    assert "_result_ cholesky,psychol,32" in r.stdout
    assert "_result_ lu,conflux-tpu,32,16,4,2x2x1,time,weak" in r.stdout
    lines = csvp.read_text().splitlines()
    assert lines[0].startswith("algorithm,library,N,N_base,P,grid")
    assert len(lines) == 4  # header + 2 + 1

    out = tmp_path / "s.png"
    r = _run("conflux_tpu.bench.plots", str(csvp), "-o", str(out))
    assert r.returncode == 0, r.stderr
    assert "GF/s" in r.stdout
    assert out.exists() or "matplotlib unavailable" in r.stderr
