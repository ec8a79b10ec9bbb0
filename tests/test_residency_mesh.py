"""Mesh-composed residency modes (VERDICT r4 next #2 / BASELINE config
4 at real HBM sizes): with a serving mesh up, int8 residency row-shards
the int8 copy (each chip holds 1/S) and streaming uploads row-sharded
chunks (each chip scans 1/S of every chunk); per-shard candidates merge
through the distributed top-k / shared host rescore.

Equality contract: ids EXACT vs the dual fp32 path and vs the
single-device residency modes; distances to 1e-5 (host einsum vs device
matmul tiling — same class as test_serving_mesh). The router budgets
PER DEVICE: one budget that routes a single device to STREAM routes the
8-device mesh to INT8 (ADVICE r4 #3 made real)."""

import numpy as np
import pyarrow as pa
import pytest

from fenix_tpu import expr
from fenix_tpu.engine import executor, residency, session
from fenix_tpu.io import ingest, table
from fenix_tpu.utils.metrics import GLOBAL as METRICS

ROWS, DIM = 9 * 1024, 16
BLOCK = 128  # shard_block = 1024 on the 8-device test mesh


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    rng = np.random.default_rng(7)
    root = str(tmp_path_factory.mktemp("resmesh"))
    vecs = rng.standard_normal((ROWS, DIM)).astype(np.float32)
    table.make(
        root,
        "vec",
        pa.table(
            {
                "id": pa.array(np.arange(ROWS)),
                "tag": pa.array((np.arange(ROWS) % 10).astype(np.int64)),
                "vector": ingest.numpy_to_fixed_size_list(vecs, pa.float32()),
            }
        ).to_reader(),
    )
    return root


@pytest.fixture(scope="module")
def caches(root):
    import jax

    assert jax.device_count() >= 2, "test env must expose a multi-device mesh"
    single = session.DeviceCache(root, block=BLOCK, mesh=None)
    meshed = session.DeviceCache(root, block=BLOCK)  # auto: all devices
    assert meshed.mesh is not None and meshed.mesh.devices.size > 1
    return single, meshed


def _req(**kw):
    kw.setdefault("source", "vec")
    kw.setdefault("column", "vector")
    kw.setdefault("metric", "l2")
    kw.setdefault("maxval", 25)
    return executor.SearchRequest(**kw)


def _ids_dists(out, q):
    ids = np.asarray(out.column("id")).reshape(q, -1)
    d = np.asarray(out.column(executor.DIST_COL)).reshape(q, -1)
    return ids, d


@pytest.mark.parametrize("metric", ["l2", "cosine"])
def test_int8_mesh_matches_dual_and_single(caches, rng, metric):
    single, meshed = caches
    target = rng.standard_normal((3, DIM)).astype(np.float32)
    kw = dict(target=target, metric=metric)
    dual = executor.execute_search(meshed, _req(**kw))
    before = METRICS.snapshot().get("search.residency_int8", 0)
    mesh_i8 = executor.execute_search(
        meshed, _req(**kw, residency="int8", extra={"window": ROWS})
    )
    assert METRICS.snapshot().get("search.residency_int8", 0) == before + 1
    solo_i8 = executor.execute_search(
        single, _req(**kw, residency="int8", extra={"window": ROWS})
    )
    ids_a, d_a = _ids_dists(dual, 3)
    ids_b, d_b = _ids_dists(mesh_i8, 3)
    ids_c, d_c = _ids_dists(solo_i8, 3)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_array_equal(ids_c, ids_b)
    np.testing.assert_allclose(d_a, d_b, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("filt", [
    expr.field("tag") == 3,                        # device-pushdown
    (expr.field("tag") >= 2) & (expr.field("id") < 7000),
])
def test_int8_mesh_filtered(caches, rng, filt):
    _, meshed = caches
    target = rng.standard_normal((3, DIM)).astype(np.float32)
    a = executor.execute_search(meshed, _req(target=target, filter=filt))
    b = executor.execute_search(
        meshed,
        _req(target=target, filter=filt, residency="int8",
             extra={"window": ROWS}),
    )
    ids_a, d_a = _ids_dists(a, 3)
    ids_b, d_b = _ids_dists(b, 3)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(d_a, d_b, atol=1e-5, rtol=1e-5)


def test_stream_fp32_mesh_matches_dual(caches, rng, monkeypatch):
    single, meshed = caches
    target = rng.standard_normal((3, DIM)).astype(np.float32)
    dual = executor.execute_search(meshed, _req(target=target))

    # per-device budget 150 kB → chunk_l = 384 rows (0.9·b/4 / 72 B/row,
    # 128-aligned), global chunk = 8·384 = 3072 → 3 chunks of 9216
    monkeypatch.setenv("FENIX_HBM_BUDGET", "150000")
    n_dev = int(meshed.mesh.devices.size)
    chunk_l = residency._stream_chunk_rows(150000, DIM, BLOCK, 4)
    n_chunks = -(-ROWS // (chunk_l * n_dev))
    assert n_chunks > 1  # the test must actually exercise the chunk merge

    before = METRICS.snapshot().get("search.stream_chunks", 0)
    got = executor.execute_search(meshed, _req(target=target, residency="stream"))
    assert METRICS.snapshot().get("search.stream_chunks", 0) == before + n_chunks

    ids_a, d_a = _ids_dists(dual, 3)
    ids_b, d_b = _ids_dists(got, 3)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(d_a, d_b, atol=1e-5, rtol=1e-5)

    # same request on the explicit single-device cache: identical ids
    solo = executor.execute_search(single, _req(target=target, residency="stream"))
    ids_c, _ = _ids_dists(solo, 3)
    np.testing.assert_array_equal(ids_c, ids_b)


def test_stream_int8_mesh_matches_dual(caches, rng, monkeypatch):
    _, meshed = caches
    filt = expr.field("tag") < 7
    target = rng.standard_normal((3, DIM)).astype(np.float32)
    dual = executor.execute_search(meshed, _req(target=target, filter=filt))
    monkeypatch.setenv("FENIX_HBM_BUDGET", "150000")
    got = executor.execute_search(
        meshed,
        _req(target=target, filter=filt, residency="stream", precision="int8",
             # per-shard window ≥ the per-shard chunk slice → exact
             extra={"window": ROWS}),
    )
    ids_a, d_a = _ids_dists(dual, 3)
    ids_b, d_b = _ids_dists(got, 3)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(d_a, d_b, atol=1e-5, rtol=1e-5)


def test_batch_1024_through_residency_modes(caches, rng, monkeypatch):
    """Config-5-shape batch (Q=1024) through int8 residency and the
    mesh stream: the host-side paths are fully vectorized (batched
    lexsort, no per-query Python hot loop — VERDICT r4 next #7) and
    must stay id-exact vs the dual path at batch scale."""
    _, meshed = caches
    target = rng.standard_normal((1024, DIM)).astype(np.float32)
    dual = executor.execute_search(meshed, _req(target=target, maxval=10))
    i8 = executor.execute_search(
        meshed,
        _req(target=target, maxval=10, residency="int8",
             extra={"window": ROWS}),
    )
    monkeypatch.setenv("FENIX_HBM_BUDGET", "150000")
    st = executor.execute_search(meshed, _req(target=target, maxval=10, residency="stream"))
    ids_a, d_a = _ids_dists(dual, 1024)
    ids_b, d_b = _ids_dists(i8, 1024)
    ids_c, d_c = _ids_dists(st, 1024)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_array_equal(ids_a, ids_c)
    np.testing.assert_allclose(d_a, d_b, atol=1e-5, rtol=1e-5)


def test_plan_budgets_per_device(caches, monkeypatch):
    """One budget, two routes: the full int8 copy busts a single
    device's budget (→ STREAM) while its per-device slice fits the
    8-device mesh (→ INT8). Before the fix the router compared
    FULL-corpus int8 bytes against the per-device budget and silently
    dropped small meshes to one chip (ADVICE r4 #3)."""
    single, meshed = caches
    monkeypatch.setenv("FENIX_HBM_BUDGET", "100000")
    req = _req(target=np.zeros((1, DIM), np.float32))
    assert residency.plan(single, req) == residency.STREAM
    assert residency.plan(meshed, req) == residency.INT8
    # and with room for the dual slice per device, dual wins
    monkeypatch.setenv("FENIX_HBM_BUDGET", "9e9")
    assert residency.plan(meshed, req) == residency.DUAL


def test_auto_mode_serves_oversized_table_on_mesh(caches, rng, monkeypatch):
    """End-to-end 'auto' on the meshed cache with a budget past dual:
    routes int8, answers match the dual path bit-for-bit on ids."""
    _, meshed = caches
    target = rng.standard_normal((2, DIM)).astype(np.float32)
    dual = executor.execute_search(meshed, _req(target=target))
    monkeypatch.setenv("FENIX_HBM_BUDGET", "100000")
    before = METRICS.snapshot().get("search.residency_int8", 0)
    got = executor.execute_search(
        meshed, _req(target=target, extra={"window": ROWS})
    )
    assert METRICS.snapshot().get("search.residency_int8", 0) == before + 1
    ids_a, _ = _ids_dists(dual, 2)
    ids_b, _ = _ids_dists(got, 2)
    np.testing.assert_array_equal(ids_a, ids_b)
