"""Region-based wall-clock profiler — semiprof parity + JAX trace hooks.

The reference instruments every sub-step with semiprof's `PE(name)`/`PL()`
macros and prints a sorted region tree with `PP()`
(libs/semiprof/include/semiprof/semiprof.hpp:38-52,
src/conflux/lu/profiler.hpp:5-19).  This module reproduces that API for host
code and adds `jax.named_scope` + `jax.profiler.TraceAnnotation` integration
so the same region names show up in XLA device traces.

Because JAX dispatch is asynchronous, timing a region that launches device
work only measures dispatch unless the region is closed with a sync; pass
`sync=` (e.g. a `block_until_ready` thunk) or use `region(..., sync=x)` for
accurate device-inclusive timings.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax


@dataclass
class _Node:
    calls: int = 0
    wall: float = 0.0
    children: Dict[str, "_Node"] = field(default_factory=dict)


class Profiler:
    """Nested region profiler. Thread-unsafe by design (one per host)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.root = _Node()
        self._stack: List[tuple] = []  # (name, node, t0)

    # -- semiprof-style API (PE/PL/PP/PC) ------------------------------------

    def enter(self, name: str) -> None:
        if not self.enabled:
            return
        parent = self._stack[-1][1] if self._stack else self.root
        node = parent.children.setdefault(name, _Node())
        self._stack.append((name, node, time.perf_counter()))

    def leave(self, sync=None) -> None:
        if not self.enabled or not self._stack:
            return
        if sync is not None:
            jax.block_until_ready(sync)
        name, node, t0 = self._stack.pop()
        node.calls += 1
        node.wall += time.perf_counter() - t0

    @contextlib.contextmanager
    def region(self, name: str, sync=None):
        """Context manager variant; also opens a jax.named_scope so the
        region name appears in lowered HLO / device traces."""
        self.enter(name)
        try:
            with jax.named_scope(name):
                yield
        finally:
            self.leave(sync=sync)

    def clear(self) -> None:
        self.root = _Node()
        self._stack = []

    def report(self) -> str:
        """Sorted region tree, semiprof `PP()` format parity
        (REGION / CALLS / WALL / % columns, README.md:119-167)."""
        total = sum(c.wall for c in self.root.children.values()) or 1e-30
        lines = [f"{'REGION':<40}{'CALLS':>10}{'WALL(s)':>12}{'%':>8}"]

        def walk(node: _Node, depth: int):
            items = sorted(
                node.children.items(), key=lambda kv: kv[1].wall, reverse=True
            )
            for name, child in items:
                lines.append(
                    f"{'  ' * depth + name:<40}{child.calls:>10}"
                    f"{child.wall:>12.6f}{100 * child.wall / total:>8.1f}"
                )
                walk(child, depth + 1)

        walk(self.root, 0)
        return "\n".join(lines)


_GLOBAL = Profiler(enabled=False)


def enable(on: bool = True) -> None:
    _GLOBAL.enabled = on


def PE(name: str) -> None:  # noqa: N802  (macro-name parity)
    _GLOBAL.enter(name)


def PL(sync=None) -> None:  # noqa: N802
    _GLOBAL.leave(sync=sync)


def PP() -> None:  # noqa: N802
    print(_GLOBAL.report())


def PC() -> None:  # noqa: N802
    _GLOBAL.clear()


def region(name: str, sync=None):
    return _GLOBAL.region(name, sync=sync)


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture an XLA device trace (tensorboard-readable) around a block —
    the TPU-native upgrade of semiprof's host timers."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
