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
    # v % Pz != 0 is legal since nlayr = ceil(v/Pz) landed; a nonpositive
    # tile size is the remaining INVALID_TILE condition
    grid = make_grid((1, 2, 4))
    with pytest.raises(ConfluxError) as e:
        BlockCyclic.create(32, 32, 0, grid)
    assert e.value.code is ErrorCode.INVALID_TILE


def test_confluxerror_is_valueerror():
    assert issubclass(ConfluxError, ValueError)
