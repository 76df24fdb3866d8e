from conflux_tpu.lu.single import lu_factor, lu, lu_residual

__all__ = ["lu_factor", "lu", "lu_residual"]
