"""FENIX_PART_ATTRS_MIN crossover: replicated vs partitioned attrs.

Measures the fused search→join→aggregate route with the attribute side
REPLICATED vs PARTITIONED over the 8-device virtual CPU mesh, across
attr-table sizes — the routing threshold (analytics._use_partitioned)
should come from data like every other routing threshold in
docs/DESIGN.md (VERDICT r3 weak #6).

Two costs matter:
- warm per-query latency (the claim/merge machinery vs the replicated
  probe),
- per-device bytes (the real driver at scale: replication costs
  S × attr bytes of HBM; partitioning costs attr bytes / S).

    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -m benchmarks.exp_parted_threshold
"""

from __future__ import annotations

import json
import tempfile
import time

import numpy as np
import pyarrow as pa


def main() -> None:
    from fenix_tpu.engine import analytics, executor
    from fenix_tpu.io import ingest, table

    rng = np.random.default_rng(0)
    n_vec, dim, k = 65536, 32, 64

    for attr_rows in (1 << 16, 1 << 18, 1 << 20, 2 << 20, 4 << 20, 8 << 20):
        with tempfile.TemporaryDirectory() as root:
            vecs = rng.standard_normal((n_vec, dim)).astype(np.float32)
            table.make(
                root,
                "vec",
                pa.table(
                    {
                        "id": pa.array(np.arange(n_vec)),
                        "vector": ingest.numpy_to_fixed_size_list(vecs, pa.float32()),
                    }
                ).to_reader(),
            )
            keys = rng.permutation(attr_rows).astype(np.int64)
            table.make(
                root,
                "attrs",
                pa.table(
                    {
                        "key": pa.array(keys),
                        "grp": pa.array((keys % 13).astype(np.int64)),
                    }
                ).to_reader(),
            )
            cache = executor.get_cache(root)
            target = rng.standard_normal(dim).astype(np.float32)
            req = executor.SearchRequest(
                source="vec", column="vector", target=target, metric="l2", maxval=k
            )
            spec_a = analytics.AggregateSpec(group_by="grp", agg="count", max_groups=32)

            out = {}
            for parted in (False, True):
                spec_j = analytics.JoinSpec(
                    source="attrs", right_on="key", partitioned=parted
                )
                t0 = time.perf_counter()
                a = analytics.execute_search_join(cache, req, spec_j, spec_a)
                build_s = time.perf_counter() - t0
                times = []
                for _ in range(7):
                    t0 = time.perf_counter()
                    b = analytics.execute_search_join(cache, req, spec_j, spec_a)
                    times.append(time.perf_counter() - t0)
                assert a.to_pydict() == b.to_pydict()
                label = "parted" if parted else "replicated"
                out[f"{label}_build_s"] = round(build_s, 3)
                out[f"{label}_warm_ms"] = round(1e3 * float(np.median(times)), 2)

            n_shards = 8
            attr_bytes = attr_rows * 8  # int32 key + group columns
            print(
                json.dumps(
                    {
                        "attr_rows": attr_rows,
                        **out,
                        "replicated_bytes_per_device": attr_bytes,
                        "parted_bytes_per_device": attr_bytes // n_shards,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
