"""Wall-clock timing on backends with lazy completion semantics.

The device tunnel's block_until_ready can return before work finishes and
device->host transfers are slow, so the ONLY reliable and cheap completion
fence is a 4-byte scalar readback (see CLAUDE.md). Every timing path in the
framework (CLIs, bench harness) goes through this helper so the protocol
lives in one place.
"""

from __future__ import annotations

import time
from typing import List, Tuple

import jax
import jax.numpy as jnp


def _force(out) -> None:
    """Completion fence: scalar readback of the first leaf."""
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))


def timed_run(fn, *args) -> Tuple[float, object]:
    """One dispatch-to-completion wall time in ms, plus the result."""
    t0 = time.perf_counter()
    out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) * 1e3, out


def timed_reps(fn, *args, reps: int = 3) -> Tuple[List[float], object]:
    """Compile warm-up (untimed) then `reps` timed runs; returns (ms list,
    last result)."""
    out = fn(*args)
    _force(out)
    times = []
    for _ in range(reps):
        ms, out = timed_run(fn, *args)
        times.append(ms)
    return times, out
