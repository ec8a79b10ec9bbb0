"""Incremental device-cache refresh: append-only table revisions extend
the HBM matrix in place (only the delta rows cross host→device); any
other mutation falls back to a full rebuild. Results must always equal
a cold cache."""

import numpy as np
import pyarrow as pa

from fenix_tpu import expr
from fenix_tpu.engine import executor as ex
from fenix_tpu.engine import session
from fenix_tpu.io import ingest, table

DIM = 16


def _tbl(ids: np.ndarray, vecs: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "id": pa.array(ids),
            "vector": ingest.numpy_to_fixed_size_list(
                vecs.astype(np.float32), pa.float32()
            ),
        }
    )


def _search(cache, target, maxval=3):
    return ex.execute_search(
        cache,
        ex.SearchRequest(
            source="t", column="vector", target=target, metric="l2", maxval=maxval
        ),
    )


def test_append_refreshes_incrementally(tmp_path, rng):
    root = str(tmp_path)
    vecs = rng.standard_normal((1000, DIM)).astype(np.float32)
    table.make(root, "t", _tbl(np.arange(1000), vecs).to_reader())

    cache = session.DeviceCache(root, block=256, mesh=None)
    _search(cache, vecs[3])  # warm the matrix
    assert cache.incremental_refreshes == 0

    extra = rng.standard_normal((40, DIM)).astype(np.float32) + 25.0
    table.append(root, "t", _tbl(np.arange(1000, 1040), extra))
    hit = _search(cache, extra[7], maxval=1)
    assert int(np.asarray(hit.column("id"))[0]) == 1007
    assert cache.incremental_refreshes == 1

    # growth past the padded capacity allocates a bigger buffer on
    # device, still incrementally
    extra2 = rng.standard_normal((400, DIM)).astype(np.float32) - 25.0
    table.append(root, "t", _tbl(np.arange(1040, 1440), extra2))
    hit = _search(cache, extra2[5], maxval=1)
    assert int(np.asarray(hit.column("id"))[0]) == 1045
    assert cache.incremental_refreshes == 2

    # equal to a cold cache on the same files, top-k band included
    cold = session.DeviceCache(root, block=256, mesh=None)
    q = rng.standard_normal(DIM).astype(np.float32)
    assert _search(cache, q, maxval=10) == _search(cold, q, maxval=10)

    # a delete is not append-only: it refreshes via the keep-mask
    # LINEAGE (device-side compaction), not the grow path
    from fenix_tpu import index as index_mod

    deleted = index_mod.delete_rows(root, "t", expr.field("id") >= 1400)
    assert deleted == 40
    out = _search(cache, extra2[5], maxval=1000)
    assert out.num_rows == 1000
    assert (np.asarray(out.column("id")) < 1400).all()
    assert cache.incremental_refreshes == 2
    assert cache.lineage_refreshes == 1


def test_incremental_refresh_under_mesh(tmp_path, rng, monkeypatch):
    """Append-only revisions extend the ROW-SHARDED matrix in place:
    only delta rows cross host→device (to_device_matrix — the full
    re-ingest path — must not run again), and the validity mask is
    computed on device (VERDICT r1 #9)."""
    root = str(tmp_path)
    vecs = rng.standard_normal((512, DIM)).astype(np.float32)
    table.make(root, "t", _tbl(np.arange(512), vecs).to_reader())
    meshed = session.DeviceCache(root, block=64)
    assert meshed.mesh is not None
    _search(meshed, vecs[0])  # warm the sharded matrix + aux

    full_builds = []
    real = ingest.to_device_matrix
    monkeypatch.setattr(
        ingest, "to_device_matrix", lambda *a, **k: full_builds.append(1) or real(*a, **k)
    )

    # the cold pad is exactly 512 rows (shard_block = 64 x 8 devices),
    # so even a small append outgrows the capacity: the device buffer
    # extends and EXISTING rows reshard over the interconnect — the
    # host still uploads only the delta
    extra = rng.standard_normal((16, DIM)).astype(np.float32) + 30.0
    table.append(root, "t", _tbl(np.arange(512, 528), extra))
    hit = _search(meshed, extra[3], maxval=1)
    assert int(np.asarray(hit.column("id"))[0]) == 515
    assert meshed.incremental_refreshes == 1
    assert not full_builds, "capacity growth re-ingested the corpus"

    # within the grown capacity (1024): in-place tail write
    mid = rng.standard_normal((300, DIM)).astype(np.float32) - 30.0
    table.append(root, "t", _tbl(np.arange(528, 828), mid))
    hit = _search(meshed, mid[7], maxval=1)
    assert int(np.asarray(hit.column("id"))[0]) == 535
    assert meshed.incremental_refreshes == 2
    assert not full_builds, "append re-ingested the corpus from host"

    # equal to a cold cache on the same files
    cold = session.DeviceCache(root, block=64)
    q = rng.standard_normal(DIM).astype(np.float32)
    assert _search(meshed, q, maxval=10) == _search(cold, q, maxval=10)

    # an append big enough to fold parts into a new base revision
    # (table.append auto-compacts) is NOT append-only: full rebuild
    big = rng.standard_normal((1500, DIM)).astype(np.float32) + 60.0
    table.append(root, "t", _tbl(np.arange(828, 2328), big))
    hit = _search(meshed, big[11], maxval=1)
    assert int(np.asarray(hit.column("id"))[0]) == 839
    assert meshed.incremental_refreshes == 2
    assert full_builds, "compacted revision must fall back to a full rebuild"

    # a delete refreshes via the keep-mask lineage: the kept rows gather
    # ON DEVICE (re-placed across shards) — no host re-stream
    from fenix_tpu import index as index_mod

    full_builds.clear()
    assert index_mod.delete_rows(root, "t", expr.field("id") >= 2300) == 28
    out = _search(meshed, big[11], maxval=1)
    assert int(np.asarray(out.column("id"))[0]) == 839
    assert meshed.incremental_refreshes == 2
    assert meshed.lineage_refreshes == 1
    assert not full_builds, "delete must compact on device, not re-ingest"


def test_concurrent_appends_and_searches(tmp_path, rng):
    """Writers and readers race through the engine: searches must never
    fail or see torn tables while appends land."""
    import concurrent.futures

    root = str(tmp_path)
    vecs = rng.standard_normal((2048, DIM)).astype(np.float32)
    table.make(root, "t", _tbl(np.arange(2048), vecs).to_reader())
    cache = session.DeviceCache(root, block=256, mesh=None)
    _search(cache, vecs[0])  # warm

    payloads = [
        _tbl(
            np.arange(2048 + i * 32, 2048 + (i + 1) * 32),
            rng.standard_normal((32, DIM)).astype(np.float32),
        )
        for i in range(8)
    ]
    queries = rng.standard_normal((24, DIM)).astype(np.float32)
    errors: list[Exception] = []

    def appender(i: int) -> None:
        try:
            table.append(root, "t", payloads[i])
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def searcher(q: np.ndarray) -> None:
        try:
            out = _search(cache, q, maxval=5)
            ids = np.asarray(out.column("id"))
            assert out.num_rows == 5 and (ids >= 0).all() and (ids < 2048 + 256).all()
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    with concurrent.futures.ThreadPoolExecutor(12) as pool:
        futs = [pool.submit(appender, i) for i in range(8)]
        futs += [pool.submit(searcher, q) for q in queries]
        [f.result() for f in futs]

    assert not errors, errors[:3]
    final = _search(cache, payloads[7].column("vector")[0].values.to_numpy(), maxval=1)
    assert int(np.asarray(final.column("id"))[0]) == 2048 + 7 * 32
