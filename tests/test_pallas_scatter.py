"""Row-movement DMA kernels (ops/pallas_scatter) — interpret-mode parity
on CPU (Mosaic lowering + on-chip exactness was probed separately:
experiments/prof_r5_scatter.py stage 1, exact equality vs `.at[].set`).

The kernels are the committed reference implementation behind the
round-5 push-up compaction verdict (results/r5_experiments.md): correct
everywhere, retired for performance on this toolchain's dynamic-dst DMA
serialization. The tests pin the semantics so the verdict's A/B stays
reproducible."""

import numpy as np
import pytest
from jax.experimental import pallas as pl

import conflux_tpu.ops.pallas_scatter as ps


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    orig = pl.pallas_call

    def icall(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(ps.pl, "pallas_call", icall)
    yield


@pytest.mark.parametrize("m,n,w,group", [
    (64, 256, 16, 8),
    (128, 128, 32, 8),    # n == minimum lane width
    (96, 384, 24, 8),     # w not a multiple of 16
])
def test_scatter_rows_matches_at_set(rng, m, n, w, group):
    import jax.numpy as jnp

    R = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    src = jnp.asarray(rng.standard_normal((w, n)), jnp.float32)
    slots = jnp.asarray(rng.choice(m, w, replace=False).astype(np.int32))
    out = ps.scatter_rows(R, src, slots, group=group)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(R.at[slots].set(src)))


def test_scatter_rows_self_writes_are_noops(rng):
    # the pushup encoding of padded entries: src[i] == R[slots[i]]
    import jax.numpy as jnp

    m, n, w = 64, 256, 16
    R = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    slots = jnp.asarray(np.arange(w, dtype=np.int32) * 3)
    out = ps.scatter_rows(R, R[slots], slots, group=8)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(R))


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_gather_rows_matches_take(rng, dtype):
    import jax.numpy as jnp

    m, n, w = 128, 256, 32
    R = jnp.asarray(rng.standard_normal((m, n))).astype(dtype)
    idx = jnp.asarray(rng.choice(m, w, replace=False).astype(np.int32))
    out = ps.gather_rows(R, idx, group=8)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(R[idx]))
