"""f64-on-CPU-mesh validation mode (VERDICT r3 Missing #3): the reference
instantiates double throughout (blas.cpp d-routines are its default); TPU
f64 is emulated/slow so the f64 path is a CPU-mesh VALIDATION mode — it
sharpens residual ground truth from the f32 kernels' ~1e-9 to ~1e-18.

jax_enable_x64 is process-global, so the mode runs in a subprocess (the
same pattern as the CLI tests); one subprocess covers every kernel family.
"""

import subprocess
import sys

CODE = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
rng = np.random.default_rng(0)
A2 = rng.standard_normal((96, 96))

from conflux_tpu.lu.single import lu_factor, lu_residual
for scheme in ("flat", "crout", "recursive"):
    F, perm = lu_factor(jnp.asarray(A2), v=16, scheme=scheme)
    assert F.dtype == jnp.float64
    r = float(lu_residual(A2, F, perm))
    assert r < 1e-14, (scheme, r)

from conflux_tpu.cholesky.single import cholesky
S = A2 @ A2.T + 96 * np.eye(96)
L = np.asarray(cholesky(jnp.asarray(S), v=16))
assert L.dtype == np.float64
assert np.linalg.norm(S - L @ L.T) / (96 * np.linalg.norm(S)) < 1e-14

from conflux_tpu.grid import make_grid
from conflux_tpu.layout import BlockCyclic, distribute, undistribute
from conflux_tpu.lu.p25d import lu_25d
from conflux_tpu.validation import lu_residual_dense
desc = BlockCyclic.create(96, 96, 8, make_grid((2, 2, 2)))
G = distribute(A2, desc)
for var in (False, True, "lookahead", "crout", "windowed"):
    F, piv = lu_25d(G, desc, "tournament", unroll=var)
    r = lu_residual_dense(A2, undistribute(F, desc), np.asarray(piv))
    assert r < 1e-14, (var, r)

# 1-column grid: the FUSED crout panel path (merged=False finishing +
# lu00 y-psum, lu/p25d.py `fin`) in true double
desc1 = BlockCyclic.create(96, 96, 8, make_grid((1, 2, 2)))
F, piv = lu_25d(distribute(A2, desc1), desc1, "tournament", unroll="crout")
r = lu_residual_dense(A2, undistribute(F, desc1), np.asarray(piv))
assert r < 1e-14, ("fused-crout", r)

from conflux_tpu.cholesky.p25d import cholesky_25d
Gs = distribute(S, desc)
for var in (False, True, "lookahead", "windowed", "crout"):
    L = cholesky_25d(Gs, desc, unroll=var)
    Lh = np.asarray(undistribute(L, desc))
    rc = np.linalg.norm(S - Lh @ Lh.T) / (96 * np.linalg.norm(S))
    assert rc < 1e-14, (var, rc)

# z (complex128) instantiation of the compute shim (VERDICT r4 item 5):
# the reference's blas.cpp:15-122 / layout.cpp:138-192 cover s/d/c/z —
# cschur_dot and both complex LU drivers are dtype-generic, so under the
# x64 mode complex inputs promote to c128 end to end.
Az = rng.standard_normal((96, 96)) + 1j * rng.standard_normal((96, 96))
from conflux_tpu.lu.csingle import clu_factor, clu_residual
for method in ("4m", "3m"):
    Fz, permz = clu_factor(jnp.asarray(Az), v=16, method=method)
    assert Fz.dtype == jnp.complex128, Fz.dtype
    rz = float(clu_residual(Az, Fz, permz))
    assert rz < 1e-14, (method, rz)

from conflux_tpu.lu.cp25d import clu_25d
Gz = distribute(Az, desc)
assert Gz.dtype == jnp.complex128
Fz, permz = clu_25d(Gz, desc)
assert Fz.dtype == jnp.complex128
Fzh = np.asarray(undistribute(Fz, desc))
rz = float(clu_residual(Az, jnp.asarray(Fzh), jnp.asarray(permz)))
assert rz < 1e-14, rz
print("F64MODE_OK")
"""


def test_f64_mode_all_kernels():
    import os

    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    r = subprocess.run([sys.executable, "-c", CODE], env=env,
                       capture_output=True, text=True, timeout=900)
    assert "F64MODE_OK" in r.stdout, r.stderr[-2000:]
