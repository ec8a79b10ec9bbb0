"""Usable-HBM budget resolution, shared by every consumer.

One parser, one fallback: ``FENIX_HBM_BUDGET`` (the measured-usable
number on tunneled devices, where the backend's reported limit
overstates reality — docs/DESIGN.md "HBM capacity") wins; otherwise the
device's reported ``bytes_limit``; ``None`` = unknown. The env var
accepts plain ints AND float notation (``9e9`` — the spelling the docs
use) and raises loudly on anything else: the round-3 advisor found the
residency router silently ignoring a malformed value that the cache
evictor crashed on — one spelling must not plan into 2× the budget
while the other aborts.

The device fallback is memoized per process: ``memory_stats()`` is
backend traffic, and the residency router consults the budget on every
search request (the limit is static for the life of the process).
"""

from __future__ import annotations

import os

_ENV = "FENIX_HBM_BUDGET"
_DEVICE_LIMIT: list = []  # [int | None] once probed


def parse_budget(env: str) -> "int | None":
    """Byte count from the env-var string; ``None`` for <= 0 (off)."""
    try:
        b = int(float(env))
    except ValueError:
        raise ValueError(
            f"{_ENV} must be a byte count (e.g. 9000000000 or 9e9), "
            f"got {env!r}"
        ) from None
    return b if b > 0 else None


def budget_bytes() -> "int | None":
    """Usable HBM in bytes: env override, else device-reported limit,
    else ``None`` (callers keep their no-budget behavior)."""
    env = os.environ.get(_ENV, "")
    if env:
        b = parse_budget(env)
        if b is not None:
            return b
    if not _DEVICE_LIMIT:
        try:
            import jax

            stats = jax.local_devices()[0].memory_stats() or {}
            _DEVICE_LIMIT.append(int(stats.get("bytes_limit") or 0) or None)
        except Exception:
            _DEVICE_LIMIT.append(None)
    return _DEVICE_LIMIT[0]
