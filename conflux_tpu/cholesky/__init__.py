from conflux_tpu.cholesky.single import cholesky, cholesky_residual

__all__ = ["cholesky", "cholesky_residual"]
