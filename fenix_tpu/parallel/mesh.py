"""Device mesh construction and sharding helpers.

The reference has no distributed execution at all (SURVEY.md §2.4); the
multi-chip design here follows the north star (BASELINE.json): corpus
rows hash/range-partitioned over a ``data`` mesh axis, coder codebooks
over an optional ``model`` axis, XLA collectives over ICI for the
top-k merge and segment reductions.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

_SERVING_MESH: "Mesh | None | str" = "unset"


def serving_mesh() -> Mesh | None:
    """Process-wide mesh the query engine shards corpora over.

    Default (``FENIX_MESH=auto``): all visible devices whenever there is
    more than one, so a server launched on a pod slice shards rows
    across its chips without configuration. ``FENIX_MESH=off`` forces
    single-device execution; ``FENIX_MESH=<n>`` uses the first n
    devices. Resolved once per process (touching ``jax.devices()``
    initializes the backend, which is expensive in this environment)."""
    global _SERVING_MESH
    if _SERVING_MESH != "unset":
        return _SERVING_MESH  # type: ignore[return-value]
    env = os.environ.get("FENIX_MESH", "auto").lower()
    if env in ("off", "0", "1", "single", "none"):
        _SERVING_MESH = None
        return None
    devices = jax.devices()
    n = len(devices) if env == "auto" else max(1, min(int(env), len(devices)))
    _SERVING_MESH = make_mesh(devices=devices[:n]) if n > 1 else None
    return _SERVING_MESH


def best_devices(n: int | None = None) -> list[jax.Device]:
    """Pick ``n`` devices, preferring the default backend but falling
    back to virtual CPU devices (test/dry-run environments where the
    default backend exposes a single chip)."""
    devices = jax.devices()
    if n is None or len(devices) >= n:
        return devices[: n or len(devices)]
    cpus = jax.devices("cpu")
    if len(cpus) >= n:
        return cpus[:n]
    raise ValueError(f"need {n} devices; have {len(devices)} default and {len(cpus)} cpu")


def make_mesh(
    n_devices: int | None = None,
    model_parallel: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """2-D ``(data, model)`` mesh; ``model=1`` gives pure data parallel."""
    devs = list(devices) if devices is not None else best_devices(n_devices)
    n = len(devs)
    assert n % model_parallel == 0, (n, model_parallel)
    grid = np.asarray(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def row_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (row) axis over every mesh axis."""
    spec = P((DATA_AXIS, MODEL_AXIS), *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
