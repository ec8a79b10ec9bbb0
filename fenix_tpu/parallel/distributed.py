"""Multi-host bootstrap: jax.distributed + sharded corpus manifests.

SURVEY.md §2.4: the reference is strictly single-process; scaling here
follows the north star — one engine process per TPU host,
``jax.distributed.initialize`` for DCN rendezvous, corpus rows
hash-partitioned across hosts (fenix_tpu.native.hash_partition on
ingest), each host feeding its local shard into the global mesh, with
the candidate-only top-k merge (parallel.search) riding ICI.

Single-host multi-chip needs none of this — ``mesh.make_mesh()`` over
local devices is enough. This module is the pod-slice entry point.
"""

from __future__ import annotations

import dataclasses
import json
import os


@dataclasses.dataclass(frozen=True)
class ClusterConfig:
    """Typed cluster/topology config (SURVEY.md §5 config-system plan:
    dataclass tree serialized as JSON, no pickled blobs)."""

    coordinator_address: str | None = None  # "host:port"; None = single host
    num_processes: int = 1
    process_id: int = 0
    model_parallel: int = 1

    @staticmethod
    def from_env() -> "ClusterConfig":
        return ClusterConfig(
            coordinator_address=os.environ.get("FENIX_COORDINATOR"),
            num_processes=int(os.environ.get("FENIX_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("FENIX_PROCESS_ID", "0")),
            model_parallel=int(os.environ.get("FENIX_MODEL_PARALLEL", "1")),
        )

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))


def initialize(config: ClusterConfig | None = None):
    """Bring up the global device view and build the engine mesh.

    Returns the mesh spanning every chip of every host. Idempotent for
    the single-host case.
    """
    import jax

    from fenix_tpu.parallel import mesh as mesh_mod

    config = config or ClusterConfig.from_env()

    if config.coordinator_address and config.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=config.coordinator_address,
            num_processes=config.num_processes,
            process_id=config.process_id,
        )

    return mesh_mod.make_mesh(model_parallel=config.model_parallel)


@dataclasses.dataclass(frozen=True)
class ShardManifest:
    """Which table shards live on which host (immutable-artifact model:
    shard files are plain catalog tables named ``<table>@<shard>``)."""

    table: str
    num_shards: int

    def shard_name(self, shard: int) -> str:
        return f"{self.table}@{shard}"

    def local_shards(self, process_id: int, num_processes: int) -> list[int]:
        return [s for s in range(self.num_shards) if s % num_processes == process_id]

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    @staticmethod
    def from_json(text: str) -> "ShardManifest":
        return ShardManifest(**json.loads(text))


def shard_table(root: str, table_name: str, num_shards: int, key_column: str = "id") -> ShardManifest:
    """Split a catalog table into hash-partitioned shard tables.

    Rows are routed by the engine hash (identical on host and device),
    written as ``<table>@<shard>`` catalog entries — the on-disk half of
    the distributed shuffle; each host then loads only its shards.
    """
    import numpy as np
    import pyarrow as pa

    from fenix_tpu import native
    from fenix_tpu.io import table as table_mod

    data = table_mod.load(root, table_name)
    keys = np.asarray(data.column(key_column)).astype(np.int64)
    parts, _ = native.hash_partition(keys, num_shards)

    for shard in range(num_shards):
        piece = data.filter(pa.array(parts == shard))
        table_mod.make(root, f"{table_name}@{shard}", piece.to_reader())

    manifest = ShardManifest(table=table_name, num_shards=num_shards)
    path = os.path.join(root, table_mod.LOCATION, table_name + ".manifest.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(manifest.to_json())
    return manifest
