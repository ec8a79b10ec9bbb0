"""Residency modes: int8-resident (host rescore) and larger-than-HBM
streaming serve corpora the dual fp32 path cannot fit (VERDICT r3 #1-#3).

Equality contract: with a window covering the corpus (int8) or exact
fp32 chunks (stream), ids must match the dual path EXACTLY; distances
to 1e-5 (host einsum vs device matmul tiling, same 1-ulp class as the
sharded-vs-single pinning in test_serving_mesh)."""

import numpy as np
import pyarrow as pa
import pytest

from fenix_tpu import expr
from fenix_tpu.engine import executor, residency
from fenix_tpu.io import ingest, table
from fenix_tpu.utils.metrics import GLOBAL as METRICS

ROWS, DIM = 3 * 16384, 16  # three scan blocks → tiny budgets stream in 3 chunks


@pytest.fixture
def root(tmp_path, rng):
    root = str(tmp_path)
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


def make_req(rng, k=25, q=3, filt=None, target=None, **kw):
    if target is None:
        target = rng.standard_normal((q, DIM)).astype(np.float32)
    return executor.SearchRequest(
        source="vec", column="vector", target=target, metric="l2", maxval=k,
        filter=filt, **kw,
    )


def _ids_dists(out, q):
    ids = np.asarray(out.column("id")).reshape(q, -1)
    d = np.asarray(out.column(executor.DIST_COL)).reshape(q, -1)
    return ids, d


@pytest.mark.parametrize("metric", ["l2", "cosine", "dot"])
def test_int8_resident_matches_dual(root, rng, metric):
    cache = executor.get_cache(root)
    target = rng.standard_normal((3, DIM)).astype(np.float32)
    kw = dict(source="vec", column="vector", target=target, metric=metric, maxval=25)
    dual = executor.execute_search(cache, executor.SearchRequest(**kw))
    got = executor.execute_search(
        cache,
        executor.SearchRequest(**kw, residency="int8", extra={"window": ROWS}),
    )
    ids_a, d_a = _ids_dists(dual, 3)
    ids_b, d_b = _ids_dists(got, 3)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(d_a, d_b, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("filt", [
    expr.field("tag") == 3,                      # device-pushdown predicate
    (expr.field("tag") >= 2) & (expr.field("id") < 40000),
])
def test_int8_resident_filtered(root, rng, filt):
    cache = executor.get_cache(root)
    target = rng.standard_normal((3, DIM)).astype(np.float32)
    req_a = make_req(rng, filt=filt, target=target)
    req_b = make_req(
        rng, filt=filt, target=target, residency="int8", extra={"window": ROWS}
    )
    ids_a, d_a = _ids_dists(executor.execute_search(cache, req_a), 3)
    ids_b, d_b = _ids_dists(executor.execute_search(cache, req_b), 3)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(d_a, d_b, atol=1e-5, rtol=1e-5)


def test_stream_fp32_matches_dual(root, rng, monkeypatch):
    cache = executor.get_cache(root)
    target = rng.standard_normal((3, DIM)).astype(np.float32)
    dual = executor.execute_search(cache, make_req(rng, target=target))

    monkeypatch.setenv("FENIX_HBM_BUDGET", str(5 << 20))  # 3 chunks of 16384
    before = METRICS.snapshot().get("search.stream_chunks", 0)
    got = executor.execute_search(
        cache, make_req(rng, target=target, residency="stream")
    )
    assert METRICS.snapshot().get("search.stream_chunks", 0) == before + 3

    ids_a, d_a = _ids_dists(dual, 3)
    ids_b, d_b = _ids_dists(got, 3)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(d_a, d_b, atol=1e-5, rtol=1e-5)


def test_stream_int8_matches_dual(root, rng, monkeypatch):
    cache = executor.get_cache(root)
    filt = expr.field("tag") < 7
    target = rng.standard_normal((3, DIM)).astype(np.float32)
    dual = executor.execute_search(cache, make_req(rng, filt=filt, target=target))
    monkeypatch.setenv("FENIX_HBM_BUDGET", str(5 << 20))
    got = executor.execute_search(
        cache,
        make_req(
            rng, filt=filt, target=target, residency="stream", precision="int8",
            extra={"window": 16384},  # window covers each whole chunk → exact
        ),
    )
    ids_a, d_a = _ids_dists(dual, 3)
    ids_b, d_b = _ids_dists(got, 3)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(d_a, d_b, atol=1e-5, rtol=1e-5)


def test_auto_routing_by_budget(root, rng, monkeypatch):
    cache = executor.get_cache(root)
    req = make_req(rng)

    monkeypatch.setenv("FENIX_HBM_BUDGET", str(1 << 30))
    assert residency.plan(cache, req) == residency.DUAL
    monkeypatch.setenv("FENIX_HBM_BUDGET", str(8 << 20))
    assert residency.plan(cache, req) == residency.INT8
    monkeypatch.setenv("FENIX_HBM_BUDGET", str(1 << 20))
    assert residency.plan(cache, req) == residency.STREAM
    monkeypatch.delenv("FENIX_HBM_BUDGET")


def test_auto_budget_serves_endtoend(root, rng, monkeypatch):
    """A table past the budget serves through auto routing with no
    request-side opt-in — the engine, not a benchmark script, owns the
    at-scale path."""
    cache = executor.get_cache(root)
    target = rng.standard_normal((3, DIM)).astype(np.float32)
    dual = executor.execute_search(cache, make_req(rng, target=target))
    monkeypatch.setenv("FENIX_HBM_BUDGET", str(8 << 20))
    before = METRICS.snapshot().get("search.residency_int8", 0)
    got = executor.execute_search(
        cache, make_req(rng, target=target, extra={"window": ROWS})
    )
    assert METRICS.snapshot().get("search.residency_int8", 0) == before + 1
    ids_a, _ = _ids_dists(dual, 3)
    ids_b, _ = _ids_dists(got, 3)
    np.testing.assert_array_equal(ids_a, ids_b)


def test_probed_oversized_raises_actionably(root, rng):
    cache = executor.get_cache(root)
    req = executor.SearchRequest(
        source="vec", column="vector", metric="l2", maxval=10,
        target=rng.standard_normal(DIM).astype(np.float32),
        coding="some/coder", probes=8, residency="int8",
    )
    with pytest.raises(ValueError, match="probed"):
        executor.execute_search(cache, req)


def test_nomax_host_path_matches_dual(root, rng, monkeypatch):
    cache = executor.get_cache(root)
    filt = expr.field("tag") == 4
    target = rng.standard_normal(DIM).astype(np.float32)
    kw = dict(
        source="vec", column="vector", target=target, metric="l2",
        maxval=None, filter=filt,
    )
    dual = executor.execute_search(cache, executor.SearchRequest(**kw))
    monkeypatch.setenv("FENIX_HBM_BUDGET", str(1 << 20))
    got = executor.execute_search(cache, executor.SearchRequest(**kw))
    assert dual.num_rows == got.num_rows
    np.testing.assert_array_equal(
        np.asarray(dual.column("id")), np.asarray(got.column("id"))
    )
    np.testing.assert_allclose(
        np.asarray(dual.column(executor.DIST_COL)),
        np.asarray(got.column(executor.DIST_COL)),
        atol=1e-5, rtol=1e-5,
    )


def test_batched_int8_resident(root, rng):
    cache = executor.get_cache(root)
    reqs = [
        make_req(rng, k=10, q=2, residency="int8", extra={"window": ROWS})
        for _ in range(3)
    ]
    solo = [executor.execute_search(cache, r) for r in reqs]
    batched = executor.execute_search_batched(cache, reqs)
    for a, b in zip(solo, batched):
        np.testing.assert_array_equal(np.asarray(a.column("id")), np.asarray(b.column("id")))


def test_int8_resident_never_builds_device_fp32(root, rng):
    """The point of the mode: the fp32 matrix must NOT land in HBM."""
    from fenix_tpu.engine.session import DeviceCache

    cache = DeviceCache(root)  # fresh cache, nothing resident
    req = make_req(rng, residency="int8", extra={"window": ROWS})
    executor.execute_search(cache, req)
    assert not any(k[-1] == "matrix" for k in cache._device), list(cache._device)
    assert any(k[-1] == "int8_solo" for k in cache._device)


def test_flight_serves_oversized_table_end_to_end(root, rng, monkeypatch):
    """A Flight client serves a table past the HBM budget THROUGH
    do_exchange — the engine owns the at-scale path (VERDICT r3 #1's
    'done' criterion, scaled to the CPU suite)."""
    import threading

    import fenix_tpu

    monkeypatch.setenv("FENIX_HBM_BUDGET", str(8 << 20))
    server = fenix_tpu.Server(root, host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.serve, daemon=True)
    thread.start()
    try:
        client = fenix_tpu.Flight(host="127.0.0.1", port=server.port)
        target = rng.standard_normal(DIM).astype(np.float32)
        out = client.search(
            target, "vec", "vector", metric="l2", maxval=20,
            filter=expr.field("tag") == 3,
        )
        assert out.num_rows == 20
        assert all(t == 3 for t in out.column("tag").to_pylist())
        # exact vs host oracle over the filtered corpus
        host = ingest.fixed_size_list_to_numpy(
            table.load(root, "vec").column("vector")
        )
        tags = np.arange(ROWS) % 10
        sel = np.nonzero(tags == 3)[0]
        d = np.sqrt(((host[sel] - target) ** 2).sum(1))
        want = sel[np.lexsort((sel, d))][:20]
        np.testing.assert_array_equal(np.asarray(out.column("id")), want)
        stats = client.stats()
        assert stats.get("search.residency_int8", 0) >= 1, stats
    finally:
        server.shutdown()
