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
    # mesh=None pins the SINGLE-DEVICE chunking (5 MB → 3 chunks of
    # 16384); the mesh-composed stream has its own chunk-count pinning
    # in test_residency_mesh.py
    from fenix_tpu.engine.session import DeviceCache

    cache = DeviceCache(root, mesh=None)
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
    # single-device routing (mesh=None): the regime the int8-resident
    # mode exists for — one chip whose HBM the corpus outgrows.
    # dual fp32 need = (4·DIM + 16)·n_pad ≈ 3.93 MB, int8 ≈ 1.57 MB.
    from fenix_tpu.engine.session import DeviceCache

    cache = DeviceCache(root, mesh=None)
    req = make_req(rng)

    monkeypatch.setenv("FENIX_HBM_BUDGET", str(1 << 30))
    assert residency.plan(cache, req) == residency.DUAL
    monkeypatch.setenv("FENIX_HBM_BUDGET", str(3 << 20))
    assert residency.plan(cache, req) == residency.INT8
    monkeypatch.setenv("FENIX_HBM_BUDGET", str(1 << 20))
    assert residency.plan(cache, req) == residency.STREAM
    monkeypatch.delenv("FENIX_HBM_BUDGET")


def test_mesh_budget_is_per_device(root, rng, monkeypatch):
    """FENIX_HBM_BUDGET is a PER-DEVICE number and the dual path
    row-shards over the mesh — a corpus whose per-device slice fits
    must keep the mesh fast path (round-4 review finding: the router
    compared FULL-corpus bytes and silently abandoned the mesh)."""
    cache = executor.get_cache(root)  # conftest: 8 virtual devices
    if cache.mesh is None:
        pytest.skip("no serving mesh in this configuration")
    # full dual need ≈ 10.5 MB (shard-block padding), per-device ≈ 1.31
    monkeypatch.setenv("FENIX_HBM_BUDGET", str(8 << 20))
    assert residency.plan(cache, make_req(rng)) == residency.DUAL


def test_hbm_budget_float_notation(root, rng, monkeypatch):
    """'9e9'-style budgets (the docs' own spelling) parse everywhere;
    malformed values raise loudly instead of silently planning into
    2× the usable HBM (round-4 review finding: the router ignored what
    the evictor crashed on)."""
    from fenix_tpu.engine.session import DeviceCache
    from fenix_tpu.utils import hbm

    cache = DeviceCache(root, mesh=None)
    monkeypatch.setenv("FENIX_HBM_BUDGET", "3e6")
    assert residency.plan(cache, make_req(rng)) == residency.INT8
    assert hbm.parse_budget("9e9") == 9_000_000_000
    monkeypatch.setenv("FENIX_HBM_BUDGET", "lots")
    with pytest.raises(ValueError, match="FENIX_HBM_BUDGET"):
        residency.plan(cache, make_req(rng))
    with pytest.raises(ValueError, match="FENIX_HBM_BUDGET"):
        cache._maybe_evict(None)


def test_auto_budget_serves_endtoend(root, rng, monkeypatch):
    """A table past the budget serves through auto routing with no
    request-side opt-in — the engine, not a benchmark script, owns the
    at-scale path."""
    from fenix_tpu.engine.session import DeviceCache

    cache = DeviceCache(root, mesh=None)  # the single-chip regime
    target = rng.standard_normal((3, DIM)).astype(np.float32)
    dual = executor.execute_search(cache, make_req(rng, target=target))
    monkeypatch.setenv("FENIX_HBM_BUDGET", str(3 << 20))
    before = METRICS.snapshot().get("search.residency_int8", 0)
    got = executor.execute_search(
        cache, make_req(rng, target=target, extra={"window": ROWS})
    )
    assert METRICS.snapshot().get("search.residency_int8", 0) == before + 1
    ids_a, _ = _ids_dists(dual, 3)
    ids_b, _ = _ids_dists(got, 3)
    np.testing.assert_array_equal(ids_a, ids_b)

    # through a MESH cache the budget is PER DEVICE: 1 MB cannot hold
    # a dual shard (4·131072·16/8 + aux) but fits the per-device int8
    # slice → mesh-composed INT8 residency; below even that slice the
    # mesh STREAMS row-sharded chunks (test_residency_mesh.py pins the
    # routing boundary explicitly)
    mesh_cache = executor.get_cache(root)
    if mesh_cache.mesh is not None:
        monkeypatch.setenv("FENIX_HBM_BUDGET", str(1 << 20))
        before = METRICS.snapshot().get("search.residency_int8", 0)
        got = executor.execute_search(
            mesh_cache, make_req(rng, target=target, extra={"window": ROWS})
        )
        assert METRICS.snapshot().get("search.residency_int8", 0) == before + 1
        ids_c, _ = _ids_dists(got, 3)
        np.testing.assert_array_equal(ids_a, ids_c)

        monkeypatch.setenv("FENIX_HBM_BUDGET", str(400_000))
        before = METRICS.snapshot().get("search.residency_stream", 0)
        got = executor.execute_search(mesh_cache, make_req(rng, target=target))
        assert METRICS.snapshot().get("search.residency_stream", 0) == before + 1
        ids_d, _ = _ids_dists(got, 3)
        np.testing.assert_array_equal(ids_a, ids_d)


def _build_index(root):
    from fenix_tpu import coder, index

    coder.make(
        root, "c", "vec", "vector",
        {"metric": "l2", "codebook_size": 4, "num_codebooks": 2,
         "batch_size": 512, "num_epochs": 2},
        seed=0,
    )
    index.make(root, "c", "vec", "vector")


@pytest.mark.parametrize("mode", ["int8", "stream"])
def test_probed_residency_matches_dual(root, rng, mode):
    """Probed (IVF) search past device residency runs host-side over
    the cell-sorted host layout (VERDICT r4 #1 — round 4 REFUSED these
    requests; the reference serves IVF at any host-fitting scale). With
    a window covering the corpus the result is EXACTLY the dual probed
    answer."""
    _build_index(root)
    cache = executor.get_cache(root)
    target = rng.standard_normal((3, DIM)).astype(np.float32)
    kw = dict(
        source="vec", column="vector", target=target, metric="l2",
        maxval=25, coding="c", probes=8,
    )
    dual = executor.execute_search(cache, executor.SearchRequest(**kw))
    before = METRICS.snapshot().get("search.residency_probed_host", 0)
    got = executor.execute_search(
        cache,
        executor.SearchRequest(**kw, residency=mode, extra={"window": ROWS}),
    )
    assert METRICS.snapshot().get("search.residency_probed_host", 0) == before + 1
    ids_a, d_a = _ids_dists(dual, 3)
    ids_b, d_b = _ids_dists(got, 3)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(d_a, d_b, atol=1e-5, rtol=1e-5)
    assert dual.column_names == got.column_names  # incl. __CODED_ID__


def test_probed_residency_filtered(root, rng):
    _build_index(root)
    cache = executor.get_cache(root)
    filt = (expr.field("tag") >= 2) & (expr.field("id") < 40000)
    target = rng.standard_normal((3, DIM)).astype(np.float32)
    kw = dict(
        source="vec", column="vector", target=target, metric="l2",
        maxval=25, coding="c", probes=8, filter=filt,
    )
    dual = executor.execute_search(cache, executor.SearchRequest(**kw))
    got = executor.execute_search(
        cache,
        executor.SearchRequest(**kw, residency="int8", extra={"window": ROWS}),
    )
    ids_a, d_a = _ids_dists(dual, 3)
    ids_b, d_b = _ids_dists(got, 3)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(d_a, d_b, atol=1e-5, rtol=1e-5)


def test_probed_residency_auto_under_budget(root, rng, monkeypatch):
    """auto routing past the budget serves probed requests instead of
    raising; the IVF sidecar persists and a fresh process mmap-loads
    it."""
    _build_index(root)
    cache = executor.get_cache(root)
    target = rng.standard_normal((3, DIM)).astype(np.float32)
    kw = dict(
        source="vec", column="vector", target=target, metric="l2",
        maxval=25, coding="c", probes=8,
    )
    dual = executor.execute_search(cache, executor.SearchRequest(**kw))

    monkeypatch.setenv("FENIX_HBM_BUDGET", str(1 << 20))
    from fenix_tpu.engine.session import DeviceCache

    fresh = DeviceCache(root, mesh=None)
    w0 = METRICS.snapshot().get("cache.ivf_sidecar_writes", 0)
    got = executor.execute_search(
        fresh, executor.SearchRequest(**kw, extra={"window": ROWS})
    )
    assert METRICS.snapshot().get("cache.ivf_sidecar_writes", 0) == w0 + 1
    np.testing.assert_array_equal(_ids_dists(dual, 3)[0], _ids_dists(got, 3)[0])

    # restart: a second cache must LOAD the sidecar, not rebuild it
    fresh2 = DeviceCache(root, mesh=None)
    l0 = METRICS.snapshot().get("cache.ivf_sidecar_loads", 0)
    got2 = executor.execute_search(
        fresh2, executor.SearchRequest(**kw, extra={"window": ROWS})
    )
    assert METRICS.snapshot().get("cache.ivf_sidecar_loads", 0) == l0 + 1
    np.testing.assert_array_equal(_ids_dists(dual, 3)[0], _ids_dists(got2, 3)[0])


def test_probed_residency_default_window_recall(root, rng, monkeypatch):
    """The DEFAULT window (4096 ≫ k) keeps probed-residency recall at
    1.0 vs dual probed at this scale — the same quantization-graded
    contract the int8-resident mode measured at spec."""
    _build_index(root)
    cache = executor.get_cache(root)
    target = rng.standard_normal((4, DIM)).astype(np.float32)
    kw = dict(
        source="vec", column="vector", target=target, metric="l2",
        maxval=10, coding="c", probes=4,
    )
    dual = executor.execute_search(cache, executor.SearchRequest(**kw))
    got = executor.execute_search(
        cache, executor.SearchRequest(**kw, residency="stream")
    )
    ids_a, _ = _ids_dists(dual, 4)
    ids_b, _ = _ids_dists(got, 4)
    recall = len(set(ids_a.ravel()) & set(ids_b.ravel())) / ids_a.size
    assert recall == 1.0


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
    assert not any(
        k[-1] in ("matrix", "sharded_matrix") for k in cache._device
    ), list(cache._device)
    # mesh caches build the row-sharded int8 copy, single-device the flat
    assert any(
        k[-1] in ("int8_solo", "sharded_int8_solo") for k in cache._device
    )


def test_flight_serves_oversized_table_end_to_end(root, rng, monkeypatch):
    """A Flight client serves a table past the HBM budget THROUGH
    do_exchange — the engine owns the at-scale path (VERDICT r3 #1's
    'done' criterion, scaled to the CPU suite)."""
    import threading

    import fenix_tpu

    monkeypatch.setenv("FENIX_HBM_BUDGET", str(1 << 20))
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
        # 1 MB budget < even the per-device dual slice → auto streams
        assert stats.get("search.residency_stream", 0) >= 1, stats

        # forced int8-resident with the client-side window override —
        # the documented per-request knob must be reachable over the
        # wire (round-4 review finding: Flight.search dropped `extra`)
        out2 = client.search(
            target, "vec", "vector", metric="l2", maxval=20,
            filter=expr.field("tag") == 3,
            residency="int8", extra={"window": ROWS},
        )
        np.testing.assert_array_equal(np.asarray(out2.column("id")), want)
        stats = client.stats()
        assert stats.get("search.residency_int8", 0) >= 1, stats
    finally:
        server.shutdown()


def test_host_quantizer_matches_device(rng):
    """quantize_rows_int8_np mirrors the device quantize_corpus_int8
    (ONE host implementation — round-4 review finding: three hand
    copies). Scales may differ by 1 ulp (XLA folds /127 into a
    reciprocal multiply), which can move a code across its rounding
    boundary by at most one step; distances stay exact either way (the
    rescore is fp32 against the SAME scales that made the codes)."""
    import jax.numpy as jnp

    from fenix_tpu.ops import topk2

    block = rng.standard_normal((64, DIM)).astype(np.float32)
    block[7] = 0.0  # zero row exercises the 1e-30 floor
    v8_h, sv_h = topk2.quantize_rows_int8_np(block)
    v8_d, sv_d = topk2.quantize_corpus_int8(jnp.asarray(block))
    np.testing.assert_allclose(sv_h, np.asarray(sv_d), rtol=2e-7)
    assert np.abs(v8_h.astype(np.int32) - np.asarray(v8_d, np.int32)).max() <= 1


def test_nomax_plan_allows_probes(root, rng, monkeypatch):
    """A probed no-top-k read over an oversized table PLANS instead of
    raising — execute_nomax_host ranks cells host-side (round-4 review
    finding: the blanket probes check made that branch unreachable)."""
    from fenix_tpu.engine.session import DeviceCache

    cache = DeviceCache(root, mesh=None)
    monkeypatch.setenv("FENIX_HBM_BUDGET", str(1 << 20))
    req = executor.SearchRequest(
        source="vec", column="vector", metric="l2", maxval=None,
        target=rng.standard_normal(DIM).astype(np.float32),
        coding="some/coder", probes=4,
    )
    assert residency.plan(cache, req) in (residency.INT8, residency.STREAM)


def test_column_views_no_second_corpus_copy(root, rng):
    """Multi-chunk vector columns (live delta parts) never get a
    corpus-sized view COPY of their own: absent until the residency
    path has built host_matrix for the revision, then shared with it
    (round-4 review finding: 2x corpus host RAM)."""
    from fenix_tpu.engine.session import DeviceCache
    from fenix_tpu.io import table as table_mod

    delta = rng.standard_normal((64, DIM)).astype(np.float32)
    table_mod.append(
        root, "vec",
        pa.table({
            "id": pa.array(np.arange(ROWS, ROWS + 64)),
            "tag": pa.array((np.arange(64) % 10).astype(np.int64)),
            "vector": ingest.numpy_to_fixed_size_list(delta, pa.float32()),
        }),
    )
    cache = DeviceCache(root, mesh=None)
    data = cache.host_table("vec")
    assert data.column("vector").num_chunks > 1, "fixture must be multi-chunk"
    token = cache.snapshot_stamp("vec", "vector")
    views = cache.host_column_views("vec", data, token)
    assert "vector" not in views          # no standalone corpus copy
    assert "id" in views and "tag" in views  # scalars still fast-path

    fresh = DeviceCache(root, mesh=None)
    host = fresh.host_matrix("vec", "vector")
    views2 = fresh.host_column_views(
        "vec", fresh.host_table("vec"), fresh.snapshot_stamp("vec", "vector")
    )
    assert views2["vector"][0] is host    # SHARED with host_matrix


def test_stream_int8_uses_host_mirror(root, rng, monkeypatch):
    """The int8 streaming scan slices a per-revision host int8 mirror —
    it must NOT re-quantize the corpus inside every search (measured
    minutes per stream at 16M×768 on a 2-core host, swamping the
    transfer the int8 mode exists to quarter)."""
    from fenix_tpu.engine.session import DeviceCache

    cache = DeviceCache(root, mesh=None)
    monkeypatch.setenv("FENIX_HBM_BUDGET", str(5 << 20))
    executor.execute_search(
        cache,
        make_req(rng, residency="stream", precision="int8",
                 extra={"window": 16384}),
    )
    key = next(k for k in cache._host if k[-1] == "host_int8")
    obj = cache._host[key][1]
    executor.execute_search(
        cache,
        make_req(rng, residency="stream", precision="int8",
                 extra={"window": 16384}),
    )
    assert cache._host[key][1] is obj, "mirror must be memoized per revision"


def test_int8_sidecar_restart_and_invalidation(root, rng, monkeypatch, tmp_path):
    """The host int8 mirror persists as a revision-stamped sidecar:
    a fresh cache (server restart) memory-maps it instead of
    re-quantizing the corpus; mutations invalidate it by stamp;
    corruption rebuilds silently; drop removes it."""
    import os

    from fenix_tpu.engine.session import DeviceCache
    from fenix_tpu.io import table as table_mod

    cache = DeviceCache(root, mesh=None)
    w0 = METRICS.snapshot().get("cache.int8_sidecar_writes", 0)
    codes, scales = cache.host_int8("vec", "vector")
    assert METRICS.snapshot().get("cache.int8_sidecar_writes", 0) == w0 + 1
    import hashlib

    cdir = os.path.join(
        table_mod.int8cache_dir(root, "vec"),
        hashlib.sha1(b"vector").hexdigest()[:16],
    )
    assert os.path.isfile(os.path.join(cdir, "meta.json"))

    # restart: a fresh cache loads (mmap) instead of rebuilding
    l0 = METRICS.snapshot().get("cache.int8_sidecar_loads", 0)
    fresh = DeviceCache(root, mesh=None)
    codes2, scales2 = fresh.host_int8("vec", "vector")
    assert METRICS.snapshot().get("cache.int8_sidecar_loads", 0) == l0 + 1
    assert isinstance(codes2, np.memmap)
    np.testing.assert_array_equal(np.asarray(codes2), codes)
    np.testing.assert_array_equal(scales2, scales)

    # the loaded mirror serves the int8-resident path end-to-end
    target = rng.standard_normal((2, DIM)).astype(np.float32)
    dual = executor.execute_search(cache, make_req(rng, q=2, target=target))
    got = executor.execute_search(
        fresh,
        make_req(rng, q=2, target=target, residency="int8",
                 extra={"window": ROWS}),
    )
    np.testing.assert_array_equal(
        np.asarray(dual.column("id")), np.asarray(got.column("id"))
    )

    # mutation moves the stamp -> stale sidecar rebuilds and re-persists
    table_mod.append(
        root, "vec",
        pa.table({
            "id": pa.array(np.arange(ROWS, ROWS + 16)),
            "tag": pa.array(np.zeros(16, np.int64)),
            "vector": ingest.numpy_to_fixed_size_list(
                rng.standard_normal((16, DIM)).astype(np.float32), pa.float32()
            ),
        }),
    )
    w1 = METRICS.snapshot().get("cache.int8_sidecar_writes", 0)
    again = DeviceCache(root, mesh=None)
    codes3, _ = again.host_int8("vec", "vector")
    assert codes3.shape[0] == ROWS + 16
    assert METRICS.snapshot().get("cache.int8_sidecar_writes", 0) == w1 + 1

    # corruption: truncate codes.npy -> silent rebuild (meta mismatch
    # is not required; the load path treats any failure as absent)
    with open(os.path.join(cdir, "codes.npy"), "wb") as fh:
        fh.write(b"not a npy")
    broken = DeviceCache(root, mesh=None)
    codes4, _ = broken.host_int8("vec", "vector")
    assert codes4.shape[0] == ROWS + 16

    # drop removes the sidecar with the table
    table_mod.drop(root, "vec")
    assert not os.path.exists(cdir)


def test_int8_sidecar_per_column_and_rewrite_cleanup(root, rng):
    """Two vector columns keep independent sidecars (no thrash), and a
    base rewrite (overwrite/delete/upsert) removes the sidecar with the
    rows it may be deleting (round-4 review findings)."""
    import os

    from fenix_tpu.engine.session import DeviceCache
    from fenix_tpu.io import table as table_mod

    a = rng.standard_normal((256, DIM)).astype(np.float32)
    b = rng.standard_normal((256, DIM)).astype(np.float32)
    table_mod.make(
        root, "two",
        pa.table({
            "id": pa.array(np.arange(256)),
            "va": ingest.numpy_to_fixed_size_list(a, pa.float32()),
            "vb": ingest.numpy_to_fixed_size_list(b, pa.float32()),
        }).to_reader(),
    )
    cache = DeviceCache(root, mesh=None)
    cache.host_int8("two", "va")
    cache.host_int8("two", "vb")

    # restart: BOTH columns load from disk — neither evicted the other
    l0 = METRICS.snapshot().get("cache.int8_sidecar_loads", 0)
    fresh = DeviceCache(root, mesh=None)
    ca, sa = fresh.host_int8("two", "va")
    cb, sb = fresh.host_int8("two", "vb")
    assert METRICS.snapshot().get("cache.int8_sidecar_loads", 0) == l0 + 2
    va8, vsa = __import__("fenix_tpu.ops.topk2", fromlist=["x"]).quantize_rows_int8_np(a)
    np.testing.assert_array_equal(np.asarray(ca), va8)
    vb8, _ = __import__("fenix_tpu.ops.topk2", fromlist=["x"]).quantize_rows_int8_np(b)
    np.testing.assert_array_equal(np.asarray(cb), vb8)

    cdir = table_mod.int8cache_dir(root, "two")
    assert os.path.isdir(cdir)
    table_mod.rewrite(
        root, "two",
        pa.table({
            "id": pa.array(np.arange(8)),
            "va": ingest.numpy_to_fixed_size_list(a[:8], pa.float32()),
            "vb": ingest.numpy_to_fixed_size_list(b[:8], pa.float32()),
        }).to_reader(),
    )
    assert not os.path.exists(cdir), "rewrite must drop the sidecar"


def test_host_int8_concurrent_builds_once(root, rng):
    """_memo_unlocked: concurrent first requests build the mirror ONCE
    (one builder, waiters adopt the published value) — the build runs
    outside the global cache lock, so nothing else serializes them."""
    import threading

    from fenix_tpu.engine.session import DeviceCache

    cache = DeviceCache(root, mesh=None)
    w0 = METRICS.snapshot().get("cache.int8_sidecar_writes", 0)
    out, errs = [], []

    def go():
        try:
            out.append(cache.host_int8("vec", "vector"))
        except Exception as e:  # pragma: no cover - surfaced by assert
            errs.append(e)

    threads = [threading.Thread(target=go) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs and len(out) == 8
    assert all(o[0] is out[0][0] for o in out), "all callers share ONE build"
    assert METRICS.snapshot().get("cache.int8_sidecar_writes", 0) == w0 + 1
