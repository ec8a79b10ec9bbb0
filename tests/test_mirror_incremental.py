"""Incremental host int8-mirror refresh (VERDICT r4 next #4): the same
standard the device caches hold (_grow_matrix / lineage compaction)
applied to the host mirror — appends quantize ONLY the delta rows and
grow the sidecar files IN PLACE; deletes gather surviving rows from the
old mirror via the keep-mask lineage without re-quantizing. Equality is
pinned bitwise against a from-scratch quantize of the current corpus
(quantization is deterministic per row)."""

import os

import numpy as np
import pyarrow as pa
import pytest

from fenix_tpu import expr, index
from fenix_tpu.engine.session import DeviceCache
from fenix_tpu.io import ingest, table
from fenix_tpu.ops import topk2
from fenix_tpu.utils.metrics import GLOBAL as METRICS

ROWS, DIM = 2048, 24


def _vec_table(rows, rng, start=0):
    vecs = rng.standard_normal((rows, DIM)).astype(np.float32)
    return pa.table(
        {
            "id": pa.array(np.arange(start, start + rows)),
            "vector": ingest.numpy_to_fixed_size_list(vecs, pa.float32()),
        }
    )


@pytest.fixture
def root(tmp_path, rng):
    root = str(tmp_path)
    table.make(root, "vec", _vec_table(ROWS, rng).to_reader())
    return root


def _oracle(cache):
    host = cache.host_matrix("vec", "vector")
    return topk2.quantize_rows_int8_np(host)


def _quantized(name="cache.mirror_rows_quantized"):
    return METRICS.snapshot().get(name, 0)


def test_append_refresh_quantizes_only_delta(root, rng):
    cache = DeviceCache(root, mesh=None)
    before = _quantized()
    codes, scales = cache.host_int8("vec", "vector")
    assert _quantized() == before + ROWS

    table.append(root, "vec", _vec_table(100, rng, start=ROWS))
    before = _quantized()
    refr = METRICS.snapshot().get("cache.mirror_delta_refreshes", 0)
    codes2, scales2 = cache.host_int8("vec", "vector")
    assert _quantized() == before + 100  # delta rows ONLY
    assert METRICS.snapshot().get("cache.mirror_delta_refreshes", 0) == refr + 1
    assert codes2.shape[0] == ROWS + 100

    want_c, want_s = _oracle(cache)
    np.testing.assert_array_equal(np.asarray(codes2), want_c)
    np.testing.assert_array_equal(scales2, want_s)


def test_append_grows_sidecar_in_place(root, rng):
    cache = DeviceCache(root, mesh=None)
    cache.host_int8("vec", "vector")
    cdir = cache._int8_cdir(("vec",), "vector")
    ino_before = os.stat(os.path.join(cdir, "codes.npy")).st_ino

    table.append(root, "vec", _vec_table(64, rng, start=ROWS))
    codes2, _ = cache.host_int8("vec", "vector")
    assert codes2.shape[0] == ROWS + 64
    # same inode: the file grew in place (O(delta) I/O), no rewrite
    assert os.stat(os.path.join(cdir, "codes.npy")).st_ino == ino_before

    # a FRESH process (new cache) loads the grown sidecar whole
    other = DeviceCache(root, mesh=None)
    loads = METRICS.snapshot().get("cache.int8_sidecar_loads", 0)
    codes3, scales3 = other.host_int8("vec", "vector")
    assert METRICS.snapshot().get("cache.int8_sidecar_loads", 0) == loads + 1
    np.testing.assert_array_equal(np.asarray(codes3), np.asarray(codes2))


def test_restart_then_append_refreshes_from_sidecar(root, rng):
    DeviceCache(root, mesh=None).host_int8("vec", "vector")
    table.append(root, "vec", _vec_table(50, rng, start=ROWS))

    # new cache = server restart: no in-memory entry, old-stamp sidecar
    cache = DeviceCache(root, mesh=None)
    before = _quantized()
    codes, scales = cache.host_int8("vec", "vector")
    assert _quantized() == before + 50  # delta only, from the sidecar base
    want_c, want_s = _oracle(cache)
    np.testing.assert_array_equal(np.asarray(codes), want_c)
    np.testing.assert_array_equal(scales, want_s)


def test_delete_refresh_never_requantizes(root, rng):
    cache = DeviceCache(root, mesh=None)
    cache.host_int8("vec", "vector")

    n = index.delete_rows(root, "vec", expr.field("id") % 3 == 0)
    assert n > 0
    before = _quantized()
    refr = METRICS.snapshot().get("cache.mirror_delta_refreshes", 0)
    codes, scales = cache.host_int8("vec", "vector")
    assert _quantized() == before  # keep-mask gather, zero quantize
    assert METRICS.snapshot().get("cache.mirror_delta_refreshes", 0) == refr + 1
    want_c, want_s = _oracle(cache)
    np.testing.assert_array_equal(np.asarray(codes), want_c)
    np.testing.assert_array_equal(scales, want_s)


def test_delete_then_append_composes(root, rng):
    cache = DeviceCache(root, mesh=None)
    cache.host_int8("vec", "vector")
    index.delete_rows(root, "vec", expr.field("id") < 100)
    table.append(root, "vec", _vec_table(80, rng, start=ROWS))

    before = _quantized()
    codes, scales = cache.host_int8("vec", "vector")
    assert _quantized() == before + 80  # appended rows only
    want_c, want_s = _oracle(cache)
    np.testing.assert_array_equal(np.asarray(codes), want_c)
    np.testing.assert_array_equal(scales, want_s)


def test_device_int8_solo_grows_on_append(root, rng):
    """The int8-RESIDENT device copy extends by the appended rows only
    (delta upload, no N·D re-upload): incremental_refreshes bumps and
    the device codes equal a from-scratch quantize of the new corpus."""
    from fenix_tpu.engine import executor

    cache = DeviceCache(root, mesh=None)
    v8a, _ = cache.int8_solo("vec", "vector")
    assert v8a.rows == ROWS

    table.append(root, "vec", _vec_table(100, rng, start=ROWS))
    before = cache.incremental_refreshes
    v8b, svb = cache.int8_solo("vec", "vector")
    assert cache.incremental_refreshes == before + 1
    assert v8b.rows == ROWS + 100
    want_c, want_s = _oracle(cache)
    np.testing.assert_array_equal(np.asarray(v8b.data)[: ROWS + 100], want_c)
    np.testing.assert_allclose(
        np.asarray(svb.data)[: ROWS + 100], want_s, rtol=2e-7
    )
    # a search through the grown residency stays exact
    target = rng.standard_normal((2, DIM)).astype(np.float32)
    dual = executor.execute_search(cache, executor.SearchRequest(
        source="vec", column="vector", target=target, metric="l2", maxval=7))
    got = executor.execute_search(cache, executor.SearchRequest(
        source="vec", column="vector", target=target, metric="l2", maxval=7,
        residency="int8", extra={"window": ROWS + 100}))
    np.testing.assert_array_equal(
        np.asarray(dual.column("id")), np.asarray(got.column("id"))
    )


def test_torn_inplace_append_rebuilds_silently(root, rng):
    """Crash between the data append and the meta write: the sidecar
    has no meta → a fresh cache silently rebuilds (meta-last
    protocol)."""
    cache = DeviceCache(root, mesh=None)
    cache.host_int8("vec", "vector")
    cdir = cache._int8_cdir(("vec",), "vector")
    # simulate the torn state: meta unlinked, codes.npy half-grown
    os.unlink(os.path.join(cdir, "meta.json"))
    with open(os.path.join(cdir, "codes.npy"), "ab") as fh:
        fh.write(b"\x01" * (DIM * 7))

    fresh = DeviceCache(root, mesh=None)
    codes, scales = fresh.host_int8("vec", "vector")
    assert codes.shape[0] == ROWS
    want_c, want_s = _oracle(fresh)
    np.testing.assert_array_equal(np.asarray(codes), want_c)


def test_npy_append_rows_guards():
    from fenix_tpu.engine.session import _npy_append_rows

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "a.npy")
        base = np.arange(12, dtype=np.int8).reshape(4, 3)
        np.save(p, base)
        delta = np.arange(6, dtype=np.int8).reshape(2, 3)
        assert _npy_append_rows(p, delta, expect_rows=4)
        got = np.load(p)
        np.testing.assert_array_equal(got, np.concatenate([base, delta]))
        # stale expectation (concurrent winner): refuse, file untouched
        assert not _npy_append_rows(p, delta, expect_rows=4)
        np.testing.assert_array_equal(np.load(p), got)
        # dtype mismatch: refuse
        assert not _npy_append_rows(p, delta.astype(np.int16), expect_rows=6)
