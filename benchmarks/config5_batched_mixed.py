"""BASELINE config 5: 1024-query batches with mixed predicates THROUGH
THE EXECUTOR.

Every dispatch is a real serving request: expression filters evaluate
through the device-pushdown plan (masks memoized per predicate ×
revision — zero per-query uploads), queries batch at Q=1024, and the
predicate class rotates per dispatch the way the Flight server's
per-predicate micro-batching groups them. On a multi-device mesh
(virtual CPU mesh or a pod slice) batches this large route through the
RING search (executor threshold 512) — query blocks rotating over the
interconnect with the exchange issued before the local scan
(overlap evidence: benchmarks/exp_ring_overlap.py); a single chip runs
the same path on one device.
"""

from __future__ import annotations

import tempfile

import numpy as np

from benchmarks import common


def main() -> None:
    p = common.parser("batched mixed-predicate search (executor path)")
    p.add_argument("--root", default=None, help="catalog root (default: temp dir)")
    args = p.parse_args()

    import pyarrow as pa

    from fenix_tpu import expr
    from fenix_tpu.engine import executor as ex
    from fenix_tpu.engine import session
    from fenix_tpu.io import ingest, table

    n = int(1_048_576 * min(args.scale, 8.0)) // 262144 * 262144 or 262144
    d, k, q = 128, 16, 1024
    rng = np.random.default_rng(0)

    root = args.root or tempfile.mkdtemp(prefix="fenix_cfg5_")
    vecs = common.make_corpus(n, d)
    tags = rng.integers(0, 10, n).astype(np.int64)
    table.make(
        root,
        "bench5",
        pa.table(
            {
                "id": pa.array(np.arange(n)),
                "tag": pa.array(tags),
                "vector": ingest.numpy_to_fixed_size_list(vecs, pa.float32()),
            }
        ).to_reader(),
    )

    cache = session.DeviceCache(root)
    targets = rng.standard_normal((q, d)).astype(np.float32)

    # three predicate classes cycling through the workload, the way the
    # server's micro-batcher groups same-predicate queries per dispatch
    filters = [
        expr.field("tag") < 3,
        (expr.field("tag") >= 3) & (expr.field("tag") < 7),
        None,
    ]

    def run(i=[0]):
        filt = filters[i[0] % len(filters)]
        i[0] += 1
        return ex.execute_search(
            cache,
            ex.SearchRequest(
                source="bench5", column="vector", target=targets,
                metric="cosine", maxval=k, filter=filt,
            ),
        )

    # warm every predicate's mask + compile (first call per class)
    for _ in range(len(filters)):
        run()

    import time

    iters = max(args.iters, 3)
    start = time.perf_counter()
    for _ in range(iters):
        out = run()
    elapsed = (time.perf_counter() - start) / iters
    del out

    mesh = cache.mesh
    common.emit(
        "mixed_predicate_batch_qps",
        q / elapsed,
        "queries/s",
        n=n,
        d=d,
        q=q,
        k=k,
        seconds=round(elapsed, 5),
        route="ring" if mesh is not None else "single-device",
        mesh_devices=int(mesh.devices.size) if mesh is not None else 1,
        pushdown_mask_builds=cache.device_mask_builds,
    )


if __name__ == "__main__":
    main()
