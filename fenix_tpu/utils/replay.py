"""Deterministic query logging and replay.

SURVEY.md §5 failure-detection plan: "deterministic replay of queries".
Every search descriptor is stateless JSON, so a query log is a complete
record of the serving workload. ``record`` appends one line per query;
``replay`` re-executes a log against a storage root and verifies result
digests — after a crash/restart (or on a rebuilt replica) identical
digests prove the engine recovered to the same state.
"""

from __future__ import annotations

import hashlib
import json
import os
import threading
from typing import Any, Iterator

import pyarrow as pa

_LOCK = threading.Lock()

LOG_ENV = "FENIX_QUERY_LOG"


def digest(table: pa.Table) -> str:
    """Order-sensitive content digest of a result table."""
    h = hashlib.sha256()
    h.update(",".join(table.column_names).encode())
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, table.schema) as w:
        w.write_table(table)
    h.update(sink.getvalue().to_pybytes())
    return h.hexdigest()[:32]


def record(config: dict[str, Any], target: pa.Table, result: pa.Table) -> None:
    """Append one query + its result digest to $FENIX_QUERY_LOG."""
    path = os.environ.get(LOG_ENV)
    if not path:
        return
    import base64

    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, target.schema) as w:
        w.write_table(target)
    line = json.dumps(
        {
            "config": config,
            "target_ipc": base64.b64encode(sink.getvalue().to_pybytes()).decode(),
            "digest": digest(result),
        },
        separators=(",", ":"),
    )
    with _LOCK:
        with open(path, "a") as f:
            f.write(line + "\n")


def load(path: str) -> Iterator[dict[str, Any]]:
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                yield json.loads(line)


def replay(path: str, root: str) -> dict[str, int]:
    """Re-execute a query log against ``root``; returns match counts.

    Dispatches through engine.service so every recorded config —
    including join/aggregate and precision — replays on the same code
    path that produced the original digest."""
    import base64

    from fenix_tpu.engine import executor, service

    cache = executor.get_cache(root)
    stats = {"total": 0, "matched": 0, "mismatched": 0}
    for entry in load(path):
        config = entry["config"]
        target = pa.ipc.open_stream(
            pa.py_buffer(base64.b64decode(entry["target_ipc"]))
        ).read_all()
        result = service.run_search_config(
            cache, config, target.column("target").combine_chunks()
        )
        stats["total"] += 1
        if digest(result) == entry["digest"]:
            stats["matched"] += 1
        else:
            stats["mismatched"] += 1
    return stats
