from conflux_tpu.ops.panel import select_pivots, lu_nopivot
from conflux_tpu.ops.cplx import cschur_dot, cabs1
from conflux_tpu.ops.tri import (
    unit_lower,
    upper,
    inv_lower,
    inv_unit_lower,
    inv_upper,
    trsm_left_lower_unit,
    trsm_right_upper,
    trsm_right_lower_t,
    potrf_tile,
)

__all__ = [
    "select_pivots",
    "cschur_dot",
    "cabs1",
    "lu_nopivot",
    "unit_lower",
    "upper",
    "inv_lower",
    "inv_unit_lower",
    "inv_upper",
    "trsm_left_lower_unit",
    "trsm_right_upper",
    "trsm_right_lower_t",
    "potrf_tile",
]
