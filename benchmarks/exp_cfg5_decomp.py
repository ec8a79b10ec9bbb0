"""Decompose the executor's per-dispatch cost for config-5 batches.

Measured on chip 2026-08-20 (one warm Q=1024 filtered dispatch):
  total executor 53.2 ms = 8.8 ms device kernel (kernel_only)
  + 4.2 ms Arrow result materialization (gather_results)
  + ~40 ms per-request upload+fetch through this environment's remote
    tunnel (the documented ~27 ms floor + the 512 KB query upload).
The executor adds ~4 ms of real host work over the raw kernel; the rest
of the gap between the kernel-level 112-148 k QPS numbers and the
executor-route 14.8 k QPS is transport, not engine. On-die serving
(no tunnel) ≈ 13 ms/batch ≈ 79 k QPS.
"""
import tempfile, time
import numpy as np

def main():
    import pyarrow as pa
    from fenix_tpu import expr
    from fenix_tpu.engine import executor as ex
    from fenix_tpu.engine import session
    from fenix_tpu.io import ingest, table
    from benchmarks import common

    n, d, k, q = 1_048_576, 128, 16, 1024
    rng = np.random.default_rng(0)
    root = tempfile.mkdtemp(prefix="fenix_cfg5d_")
    vecs = common.make_corpus(n, d)
    tags = rng.integers(0, 10, n).astype(np.int64)
    table.make(root, "bench5", pa.table({
        "id": pa.array(np.arange(n)), "tag": pa.array(tags),
        "vector": ingest.numpy_to_fixed_size_list(vecs, pa.float32()),
    }).to_reader())

    cache = session.DeviceCache(root)
    targets = rng.standard_normal((q, d)).astype(np.float32)
    acc = {}
    def wrap(mod, name, label):
        fn = getattr(mod, name)
        def g(*a, **kw):
            t0 = time.perf_counter()
            r = fn(*a, **kw)
            acc[label] = acc.get(label, 0.0) + time.perf_counter() - t0
            return r
        setattr(mod, name, g)
    wrap(ex, "gather_results", "gather_results")
    wrap(ex, "normalize_target", "normalize_target")

    filt = expr.field("tag") < 3
    def run(f, select=None):
        return ex.execute_search(cache, ex.SearchRequest(
            source="bench5", column="vector", target=targets,
            metric="cosine", maxval=k, filter=f, select=select))
    run(filt); run(None)  # warm
    acc.clear()
    iters = 8
    t0 = time.perf_counter()
    for i in range(iters):
        run(filt if i % 2 else None)
    total = (time.perf_counter() - t0) / iters
    out = {k_: round(v / iters * 1e3, 2) for k_, v in acc.items()}
    out["total_ms"] = round(total * 1e3, 2)

    # select without the vector column: the result gather is then
    # ~Q·k scalars instead of an 8 MB vector copy — the realistic
    # high-QPS serving shape (clients rarely re-fetch raw vectors)
    acc.clear()
    run(None, select=["id", "tag"])
    t0 = time.perf_counter()
    for i in range(iters):
        run(filt if i % 2 else None, select=["id", "tag"])
    out["total_ms_select_scalars"] = round((time.perf_counter() - t0) / iters * 1e3, 2)
    out["gather_ms_select_scalars"] = round(
        acc.get("gather_results", 0.0) / (iters + 1) * 1e3, 2
    )
    # kernel-only reference: same corpus through the raw two-phase jit
    import jax.numpy as jnp
    from fenix_tpu.ops import topk2
    corpus = cache.matrix("bench5", "vector")
    am, aa = cache.metric_aux("bench5", "vector", "cosine")
    qdev = jnp.asarray(targets)
    np.asarray(topk2.topk_two_phase(corpus.data, qdev, am, aa, k=16, metric="cosine")[0])
    t0 = time.perf_counter()
    for _ in range(8):
        o = topk2.topk_two_phase(corpus.data, qdev, am, aa, k=16, metric="cosine")
    np.asarray(o[0])
    out["kernel_only_ms"] = round((time.perf_counter() - t0) / 8 * 1e3, 2)
    # upload-only: queries to device
    t0 = time.perf_counter()
    for _ in range(8):
        np.asarray(jnp.asarray(targets)[0, 0])
    out["query_upload_ms"] = round((time.perf_counter() - t0) / 8 * 1e3, 2)
    import json
    print(json.dumps(out))


if __name__ == "__main__":
    main()
