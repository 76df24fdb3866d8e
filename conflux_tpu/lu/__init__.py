from conflux_tpu.lu.single import lu_factor, lu, lu_residual
from conflux_tpu.lu.stepped import lu_factor_stepped
from conflux_tpu.lu.csingle import clu_factor, clu_residual
from conflux_tpu.lu.cp25d import clu_25d

__all__ = ["lu_factor", "lu", "lu_residual", "lu_factor_stepped",
           "clu_factor", "clu_residual", "clu_25d"]
