"""Error taxonomy (CholeskyTypes.h parity)."""

import numpy as np
import pytest

from conflux_tpu.errors import ConfluxError, ErrorCode
from conflux_tpu.grid import make_grid
from conflux_tpu.layout import BlockCyclic, distribute


def test_device_shortage_code():
    with pytest.raises(ConfluxError) as e:
        make_grid((8, 8, 8))
    assert e.value.code is ErrorCode.DEVICE_SHORTAGE


def test_layout_mismatch_code():
    grid = make_grid((2, 2, 1))
    desc = BlockCyclic.create(16, 16, 4, grid)
    with pytest.raises(ConfluxError) as e:
        distribute(np.ones((64, 64), np.float32), desc)
    assert e.value.code is ErrorCode.LAYOUT_MISMATCH


def test_invalid_tile_code():
    import jax.numpy as jnp
    from conflux_tpu.lu.p25d import lu_25d

    grid = make_grid((1, 2, 4))
    desc = BlockCyclic.create(32, 32, 6, grid)
    with pytest.raises(ConfluxError) as e:
        lu_25d(jnp.zeros(desc.global_shape(), jnp.float32), desc)
    assert e.value.code is ErrorCode.INVALID_TILE


def test_confluxerror_is_valueerror():
    assert issubclass(ConfluxError, ValueError)
