"""Larger-than-HBM streaming scan ON CHIP: 16M×768 int8 through the
engine (VERDICT r3 #3 'done' criterion).

16M×768 is past the single-chip ceiling in EVERY residency: fp32 needs
49 GB, int8-only 12.3 GB vs ~8-9 GB usable (benchmarks/exp_16m.py) —
before round 4 this corpus had no route, period. The residency router
(engine/residency.py) now streams it: host-quantized int8 chunks
host→device double-buffered, phase-A windows per chunk, one exact host
fp32 rescore over the union. recall@100 asserted vs a float64 host
oracle; reports the double-buffer overlap gain (same run with
buffer_size=1, i.e. no upload/compute overlap).

    PYTHONPATH=/root/repo:/root/.axon_site FENIX_HBM_BUDGET=8500000000 \
    python -m benchmarks.exp_stream_16m            # chip (~49 GB RAM+disk)
    # --scale 0.05 for a CPU smoke
"""

from __future__ import annotations

import functools
import os
import shutil
import tempfile
import time

import numpy as np

from benchmarks import common


def main() -> None:
    p = common.parser("streaming 16M×768 int8 scan")
    p.add_argument(
        "--quick",
        action="store_true",
        help="one warm stream instead of 3+ (each stream moves 12.3 GB "
        "through the tunnel — on a congested day the full protocol is "
        "hours); the single-buffer serial control still runs so the "
        "overlap gain is reported",
    )
    p.add_argument(
        "--no-serial",
        action="store_true",
        help="skip the single-buffer control entirely (no overlap_gain)",
    )
    p.add_argument("--rows", type=int, default=16_000_000)
    p.add_argument("--dim", type=int, default=768)
    p.add_argument(
        "--root",
        default=None,
        help="reuse an existing root whose 's16' table matches --scale "
        "(skips the ~8 min gen+ingest; the root is NOT deleted after)",
    )
    args = p.parse_args()

    import pyarrow as pa

    from fenix_tpu.engine import executor as ex
    from fenix_tpu.engine import residency
    from fenix_tpu.engine.session import DeviceCache
    from fenix_tpu.io import batch as batch_io
    from fenix_tpu.io import ingest, table
    from fenix_tpu.utils.metrics import GLOBAL as METRICS

    n = int(args.rows * min(args.scale, 1.0)) // 128 * 128 or 1280
    d, k, q = args.dim, 100, 8
    # default budget: the measured-usable ceiling, scaled down for
    # sub-scale smokes so the plan stays STREAM (int8-only residency
    # must NOT fit); the documented chip protocol sets 8.5e9 explicitly
    int8_need = ((n + 16383) // 16384 * 16384) * (d + 16)
    os.environ.setdefault(
        "FENIX_HBM_BUDGET", str(min(8_500_000_000, int(int8_need * 0.45)))
    )
    chunk = min(n, 524_288)
    rng = np.random.default_rng(0)

    keep_root = args.root is not None
    root = args.root or tempfile.mkdtemp(prefix="fenix_s16_")
    try:
        if not (keep_root and os.path.exists(os.path.join(root, "sources", "s16.arrow"))):
            # generate + ingest STREAMING (record batches): Arrow caps one
            # array at 2^31 flat elements, and 49 GB of transient RAM is
            # pointless when the engine mmaps the written file anyway
            t0 = time.perf_counter()
            schema = pa.schema({"id": pa.int64(), "vector": pa.list_(pa.float32(), d)})

            def batches():
                for s in range(0, n, chunk):
                    e = min(s + chunk, n)
                    block = rng.standard_normal((e - s, d), dtype=np.float32)
                    yield pa.record_batch(
                        [
                            pa.array(np.arange(s, e)),
                            ingest.numpy_to_fixed_size_list(block, pa.float32()),
                        ],
                        schema=schema,
                    )

            table.make(root, "s16", pa.RecordBatchReader.from_batches(schema, batches()))
            print(f"# gen+ingest {n*d*4/1e9:.1f} GB in {time.perf_counter()-t0:.0f}s",
                  flush=True)

        cache = DeviceCache(root, mesh=None)
        tbl = cache.host_table("s16")
        nn = tbl.num_rows
        assert nn == n, f"--root table has {nn} rows, expected {n} (match --scale)"
        dd = ingest.vector_type(tbl.schema.field("vector").type).list_size
        assert dd == d, f"--root table is {dd}-dim, expected {d} (match --dim)"
        queries = rng.standard_normal((q, d)).astype(np.float32)

        # the per-revision host int8 mirror builds ONCE, outside every
        # search (the round-4 first cut re-quantized 49 GB per stream)
        t0 = time.perf_counter()
        cache.host_int8("s16", "vector")
        t_quant = time.perf_counter() - t0
        print(f"# host int8 mirror build: {t_quant:.1f}s", flush=True)

        def req(target):
            return ex.SearchRequest(
                source="s16", column="vector", target=target, metric="l2",
                maxval=k, precision="int8",
            )

        mode = residency.plan(cache, req(queries))
        assert mode == residency.STREAM, mode
        print("# residency plan: stream", flush=True)

        chunks0 = METRICS.snapshot().get("search.stream_chunks", 0)
        t0 = time.perf_counter()
        out = ex.execute_search(cache, req(queries))
        t_cold = time.perf_counter() - t0
        chunks = METRICS.snapshot().get("search.stream_chunks", 0) - chunks0
        print(f"# cold (host aux pass + compile + stream): {t_cold:.1f}s, "
              f"{int(chunks)} chunks", flush=True)
        ids_dev = np.asarray(out.column("id")).reshape(q, k)

        iters = 1 if args.quick else max(args.iters // 2, 3)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = ex.execute_search(cache, req(queries))
        t_warm = (time.perf_counter() - t0) / iters

        # no-overlap control: single-buffer prefetch (upload serializes
        # with compute) — the overlap gain is t_serial / t_overlapped
        t_serial = float("nan")
        if not args.no_serial:
            orig = batch_io.prefetch_to_device
            residency.batch_io.prefetch_to_device = functools.partial(
                orig, buffer_size=1
            )
            try:
                t0 = time.perf_counter()
                ex.execute_search(cache, req(queries))
                t_serial = time.perf_counter() - t0
            finally:
                residency.batch_io.prefetch_to_device = orig

        # recall@100 vs float64 host oracle
        host = cache.host_matrix("s16", "vector")
        qq64 = queries.astype(np.float64)
        best = np.full((q, 0), np.inf)
        best_ids = np.zeros((q, 0), np.int64)
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            sub = host[s:e].astype(np.float64)
            d2 = (
                (qq64 * qq64).sum(1)[:, None]
                - 2.0 * qq64 @ sub.T
                + (sub * sub).sum(1)[None, :]
            )
            dd = np.sqrt(np.maximum(d2, 0.0))
            alld = np.concatenate([best, dd], axis=1)
            alli = np.concatenate(
                [best_ids, np.broadcast_to(np.arange(s, e), (q, e - s))], axis=1
            )
            keep = min(256, alld.shape[1])
            part = np.argpartition(alld, keep - 1, axis=1)[:, :keep]
            best = np.take_along_axis(alld, part, axis=1)
            best_ids = np.take_along_axis(alli, part, axis=1)
        recall = 0.0
        for i in range(q):
            order = np.lexsort((best_ids[i], best[i]))
            recall += len(
                set(best_ids[i][order][:k].tolist()) & set(ids_dev[i].tolist())
            ) / k
        recall /= q
        assert recall == 1.0, f"recall@{k} = {recall} != 1.0"

        per_search_chunks = int(chunks)
        extra = dict(
            n=n, d=d, k=k,
            rows_per_s=round(n / t_warm, 1),
            int8_upload_gbytes_per_search=round(n * d / 1e9, 1),
            chunks_per_search=per_search_chunks,
            cold_seconds=round(t_cold, 1),
            host_int8_mirror_build_seconds=round(t_quant, 1),
            recall_at_100=recall,
            residency_mode="stream (int8 chunks, exact host rescore)",
        )
        if t_serial == t_serial:  # measured (i.e. not --no-serial)
            extra["serial_seconds"] = round(t_serial, 3)
            extra["overlap_gain"] = round(t_serial / t_warm, 3)
        common.emit(
            f"stream_{n}x{d}_warm_seconds_per_batch8", t_warm, "s/batch", **extra
        )
    finally:
        if not keep_root:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
