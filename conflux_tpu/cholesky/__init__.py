from conflux_tpu.cholesky.single import cholesky, cholesky_residual
from conflux_tpu.cholesky.stepped import cholesky_stepped

__all__ = ["cholesky", "cholesky_residual", "cholesky_stepped"]
