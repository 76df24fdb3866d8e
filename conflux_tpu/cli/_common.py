"""Shared CLI plumbing for the miniapps."""

from __future__ import annotations

import os

import jax

from conflux_tpu.timing import timed_run  # noqa: F401  (re-export for CLIs)


def setup_platform(platform: str | None, force_devices: int | None) -> None:
    """Optionally force a platform / virtual device count. Must run before
    the first backend touch (see tests/conftest.py for why env vars alone
    don't work under the container's sitecustomize)."""
    if force_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={force_devices}"
            )
    if platform:
        jax.config.update("jax_platforms", platform)


def parse_grid(s: str | None):
    """'PxxPyxPz' -> (Px, Py, Pz), e.g. '4x4x1' (miniapp -p/--p_grid format,
    examples/conflux_miniapp.cpp:42-67)."""
    if not s:
        return None
    parts = s.lower().split("x")
    if len(parts) != 3:
        raise ValueError(f"grid must be PxxPyxPz, got {s!r}")
    return tuple(int(p) for p in parts)



