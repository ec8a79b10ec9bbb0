"""Batch-1024 (config-5 shape) through the int8 residency mode ON CHIP
(VERDICT r4 next #7 'done' criterion).

Round 4 measured residency only at batch-8; the host-side rescore ran a
Python loop per query, unmeasured at the config-5 batch shape. Round 5
vectorized the host paths (batched lexsort, multi-range gathers —
engine/residency.py); this measures s/batch-1024 against an oversized
table: 4M×768 fp32 is 12.3 GB (past the ~8-9 GB usable budget), int8
residency holds the 3.1 GB codes in HBM, phase-A windows come back per
query, the host gathers + exactly rescores.

    PYTHONPATH=/root/repo:/root/.axon_site FENIX_HBM_BUDGET=8.5e9 \
    python -m benchmarks.exp_residency_batch --root data/bench_roots/resb4m
    # --scale 0.01 for a CPU smoke (JAX_PLATFORMS=cpu, tiny budget)
"""

from __future__ import annotations

import os
import time

import numpy as np

from benchmarks import common


def main() -> None:
    p = common.parser("batch-1024 through int8 residency (4M×768)")
    p.add_argument("--rows", type=int, default=4_000_000)
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--root", default=None)
    args = p.parse_args()

    import pyarrow as pa

    from fenix_tpu.engine import executor as ex
    from fenix_tpu.engine import residency
    from fenix_tpu.engine.session import DeviceCache
    from fenix_tpu.io import ingest, table

    n = int(args.rows * min(args.scale, 1.0)) // 128 * 128 or 1280
    d, qb, k = args.dim, args.batch, 10
    chunk = min(n, 262_144)
    rng = np.random.default_rng(0)

    import tempfile

    keep_root = args.root is not None
    root = args.root or tempfile.mkdtemp(prefix="fenix_resb_")
    try:
        if not os.path.exists(table.path_of(root, "big")):
            t0 = time.perf_counter()
            schema = pa.schema({"id": pa.int64(), "vector": pa.list_(pa.float32(), d)})

            def batches():
                for s in range(0, n, chunk):
                    e = min(s + chunk, n)
                    yield pa.record_batch(
                        [pa.array(np.arange(s, e)),
                         ingest.numpy_to_fixed_size_list(
                             rng.standard_normal((e - s, d), dtype=np.float32),
                             pa.float32())],
                        schema=schema,
                    )

            table.make(root, "big", pa.RecordBatchReader.from_batches(schema, batches()))
            print(f"# gen+ingest {n*d*4/1e9:.1f} GB: "
                  f"{time.perf_counter()-t0:.0f}s", flush=True)

        cache = DeviceCache(root, mesh=None)
        host = cache.host_matrix("big", "vector")
        # a reused --root must match the requested shape — silently
        # benchmarking a stale corpus poisons the emitted rows= label
        assert host.shape == (n, d), (
            f"--root holds a {host.shape} corpus but --rows/--scale ask "
            f"for {(n, d)}; use a fresh root"
        )
        queries = rng.standard_normal((qb, d)).astype(np.float32)

        def req(target, window):
            # residency forced so the CPU smoke exercises the same
            # path; on chip "auto" routes here anyway (asserted below)
            return ex.SearchRequest(
                source="big", column="vector", target=target, metric="l2",
                maxval=k, extra={"window": window}, residency="int8",
            )

        auto = ex.SearchRequest(
            source="big", column="vector", target=queries, metric="l2", maxval=k
        )
        mode = residency.plan(cache, auto)
        print(f"# residency plan (auto): {mode}", flush=True)
        if args.scale >= 1.0:
            assert mode == residency.INT8, mode

        t0 = time.perf_counter()
        cache.host_int8("big", "vector")
        print(f"# int8 mirror: {time.perf_counter()-t0:.0f}s (once per "
              "revision; sidecar-persisted)", flush=True)

        results = {}
        for window in (1024, 4096):
            out = ex.execute_search(cache, req(queries, window))  # warm
            iters = max(2, args.iters // 2)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = ex.execute_search(cache, req(queries, window))
            dt = (time.perf_counter() - t0) / iters
            results[window] = dt
            print(f"# window={window}: {dt:.3f} s/batch-{qb} "
                  f"({dt/qb*1e3:.2f} ms/query)", flush=True)

        # correctness spot-check: recall@10 vs float64 oracle, 16 queries
        out16 = ex.execute_search(cache, req(queries[:16], 4096))
        ids16 = np.asarray(out16.column("id")).reshape(16, k)
        q64 = queries[:16].astype(np.float64)
        best = np.full((16, 0), np.inf)
        best_ids = np.zeros((16, 0), np.int64)
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            sub = host[s:e].astype(np.float64)
            d2 = ((q64 * q64).sum(1)[:, None] - 2.0 * q64 @ sub.T
                  + (sub * sub).sum(1)[None, :])
            alld = np.concatenate([best, np.sqrt(np.maximum(d2, 0))], axis=1)
            alli = np.concatenate(
                [best_ids, np.broadcast_to(np.arange(s, e), (16, e - s))], axis=1)
            keep = min(64, alld.shape[1])
            part = np.argpartition(alld, keep - 1, axis=1)[:, :keep]
            best = np.take_along_axis(alld, part, axis=1)
            best_ids = np.take_along_axis(alli, part, axis=1)
        rec = 0.0
        for i in range(16):
            order = np.lexsort((best_ids[i], best[i]))
            rec += len(set(best_ids[i][order][:k].tolist())
                       & set(ids16[i].tolist())) / k
        rec = round(rec / 16, 4)
        print(f"# recall@10 vs float64 oracle (16-query spot): {rec}", flush=True)

        common.emit(
            f"residency_int8_{n}x{d}_seconds_per_batch{qb}",
            results[4096], "s/batch",
            rows=n, dim=d, batch=qb, k=k, window_4096=round(results[4096], 3),
            window_1024=round(results[1024], 3), recall_at_10_spot=rec,
            ms_per_query=round(results[4096] / qb * 1e3, 3),
        )
    finally:
        if not keep_root:
            import shutil

            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
