"""Keep-mask lineage refresh: deletes and compactions refresh the
device matrix IN PLACE (device-side gather / buffer reuse — only the
kept-row index crosses the host link), composing with the append grow
for upserts. Results must always equal a cold cache; anything the
lineage cannot prove falls back to a full rebuild."""

import numpy as np
import pyarrow as pa

from fenix_tpu import expr, index
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


def _no_full_builds(monkeypatch):
    builds = []
    real = ingest.to_device_matrix
    monkeypatch.setattr(
        ingest, "to_device_matrix", lambda *a, **k: builds.append(1) or real(*a, **k)
    )
    return builds


def test_delete_compacts_on_device(tmp_path, rng, monkeypatch):
    root = str(tmp_path)
    vecs = rng.standard_normal((900, DIM)).astype(np.float32)
    table.make(root, "t", _tbl(np.arange(900), vecs).to_reader())
    cache = session.DeviceCache(root, block=128, mesh=None)
    _search(cache, vecs[0])  # warm

    builds = _no_full_builds(monkeypatch)
    assert index.delete_rows(root, "t", expr.field("id") % 3 == 0) == 300
    out = _search(cache, vecs[4], maxval=600)
    ids = np.asarray(out.column("id"))
    assert out.num_rows == 600 and (ids % 3 != 0).all()
    assert cache.lineage_refreshes == 1
    assert not builds, "delete must gather on device, not re-ingest"

    # bit-identical to a cold cache on the post-delete files
    cold = session.DeviceCache(root, block=128, mesh=None)
    q = rng.standard_normal(DIM).astype(np.float32)
    assert _search(cache, q, maxval=20) == _search(cold, q, maxval=20)


def test_compaction_reuses_buffer(tmp_path, rng, monkeypatch):
    """A compaction changes the base revision but not one row — the
    cached device buffer must be reused OUTRIGHT (identity hop)."""
    root = str(tmp_path)
    vecs = rng.standard_normal((600, DIM)).astype(np.float32)
    table.make(root, "t", _tbl(np.arange(600), vecs).to_reader())
    cache = session.DeviceCache(root, block=128, mesh=None)
    extra = rng.standard_normal((50, DIM)).astype(np.float32) + 9.0
    table.append(root, "t", _tbl(np.arange(600, 650), extra))
    _search(cache, vecs[0])  # warm at base+part

    before = cache._device[(("t",), "vector", "matrix")][1].data
    builds = _no_full_builds(monkeypatch)
    table.compact(root, "t")
    hit = _search(cache, extra[3], maxval=1)
    assert int(np.asarray(hit.column("id"))[0]) == 603
    assert cache.lineage_refreshes == 1
    assert not builds
    after = cache._device[(("t",), "vector", "matrix")][1].data
    assert after is before, "identity hop must reuse the device buffer"


def test_upsert_composes_shrink_and_grow(tmp_path, rng, monkeypatch):
    """upsert = delete + append in one lock scope: the refresh applies
    the keep-mask hop, then grows by the appended part."""
    root = str(tmp_path)
    vecs = rng.standard_normal((700, DIM)).astype(np.float32)
    table.make(root, "t", _tbl(np.arange(700), vecs).to_reader())
    cache = session.DeviceCache(root, block=128, mesh=None)
    _search(cache, vecs[0])  # warm

    builds = _no_full_builds(monkeypatch)
    repl = rng.standard_normal((30, DIM)).astype(np.float32) - 11.0
    replaced, inserted = index.upsert_rows(
        root, "t", _tbl(np.arange(680, 710), repl)
    )
    assert (replaced, inserted) == (20, 10)
    hit = _search(cache, repl[5], maxval=1)
    assert int(np.asarray(hit.column("id"))[0]) == 685
    assert cache.lineage_refreshes == 1
    assert not builds, "upsert must shrink+grow on device, not re-ingest"

    cold = session.DeviceCache(root, block=128, mesh=None)
    q = rng.standard_normal(DIM).astype(np.float32)
    assert _search(cache, q, maxval=20) == _search(cold, q, maxval=20)


def test_corrupt_lineage_falls_back(tmp_path, rng, monkeypatch):
    """A truncated/garbage lineage file must read as None (full rebuild),
    never as an error or a wrong refresh."""
    root = str(tmp_path)
    vecs = rng.standard_normal((400, DIM)).astype(np.float32)
    table.make(root, "t", _tbl(np.arange(400), vecs).to_reader())
    cache = session.DeviceCache(root, block=128, mesh=None)
    _search(cache, vecs[0])  # warm

    assert index.delete_rows(root, "t", expr.field("id") >= 300) == 100
    lin_path = table._lineage_path(root, "t")
    with open(lin_path, "wb") as fh:
        fh.write(b"\x00garbage")
    assert table.lineage(root, "t") is None
    with open(lin_path, "wb"):
        pass  # zero-length (torn write before the data block)
    assert table.lineage(root, "t") is None
    with open(lin_path, "wb") as fh:
        fh.write(b"PK\x03\x04" + b"\x00" * 8)  # truncated zip header
    assert table.lineage(root, "t") is None

    builds = _no_full_builds(monkeypatch)
    out = _search(cache, vecs[4], maxval=400)
    assert out.num_rows == 300
    assert cache.lineage_refreshes == 0
    assert builds, "corrupt lineage must force a full rebuild"

    cold = session.DeviceCache(root, block=128, mesh=None)
    q = rng.standard_normal(DIM).astype(np.float32)
    assert _search(cache, q, maxval=20) == _search(cold, q, maxval=20)


def test_lineage_cleared_on_drop_and_recreate(tmp_path, rng):
    """drop() removes the lineage file; a recreated same-name table must
    not inherit a stale hop."""
    root = str(tmp_path)
    vecs = rng.standard_normal((300, DIM)).astype(np.float32)
    table.make(root, "t", _tbl(np.arange(300), vecs).to_reader())
    assert index.delete_rows(root, "t", expr.field("id") >= 200) == 100
    import os

    assert os.path.exists(table._lineage_path(root, "t"))
    table.drop(root, "t")
    assert not os.path.exists(table._lineage_path(root, "t"))


def test_two_hops_behind_falls_back(tmp_path, rng, monkeypatch):
    """Only the latest hop is recorded: a cache two delete revisions
    behind cannot prove its rows and must rebuild from the host."""
    root = str(tmp_path)
    vecs = rng.standard_normal((500, DIM)).astype(np.float32)
    table.make(root, "t", _tbl(np.arange(500), vecs).to_reader())
    cache = session.DeviceCache(root, block=128, mesh=None)
    _search(cache, vecs[0])  # warm

    builds = _no_full_builds(monkeypatch)
    assert index.delete_rows(root, "t", expr.field("id") >= 450) == 50
    assert index.delete_rows(root, "t", expr.field("id") >= 400) == 50
    out = _search(cache, vecs[4], maxval=500)
    assert out.num_rows == 400
    assert (np.asarray(out.column("id")) < 400).all()
    assert cache.lineage_refreshes == 0
    assert builds, "stale lineage must force a full rebuild"
