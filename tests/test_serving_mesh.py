"""Mesh-sharded serving: the executor's top-k paths over a multi-device
mesh must return tables IDENTICAL to single-device execution — same
rows, same deterministic (distance, id) tie order, same schemas — for
every mode (fp32/bf16/int8, filters, probes, batched dispatch).

The 8-virtual-device CPU env (tests/conftest.py) activates the serving
mesh automatically (`DeviceCache.mesh`), so the rest of the suite
already runs THROUGH the sharded path; this file pins equality against
an explicit ``mesh=None`` cache and the routing itself.
"""

import numpy as np
import pyarrow as pa
import pytest

from fenix_tpu import coder, expr, index
from fenix_tpu.engine import executor as ex
from fenix_tpu.engine import session
from fenix_tpu.io import ingest, table

ROWS, DIM = 3_000, 32

CONFIG: coder.Config = {
    "metric": "l2",
    "codebook_size": 4,
    "num_codebooks": 2,
    "batch_size": 512,
    "num_epochs": 2,
}


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    rng = np.random.default_rng(11)
    root = str(tmp_path_factory.mktemp("mesh_root"))
    vecs = rng.standard_normal((ROWS, DIM)).astype(np.float32)
    vecs[1000:] += 4.0  # cluster structure
    table.make(
        root,
        "t",
        pa.table(
            {
                "id": pa.array(np.arange(ROWS)),
                "tag": pa.array(rng.integers(0, 5, ROWS)),
                "vector": ingest.numpy_to_fixed_size_list(vecs, pa.float32()),
            }
        ).to_reader(),
    )
    coder.make(root, "c", "t", "vector", CONFIG, seed=0)
    index.make(root, "c", "t", "vector")
    table.make(
        root,
        "attrs",
        pa.table(
            {
                "key": pa.array(np.arange(ROWS)),  # joins t.id
                "grp": pa.array(rng.integers(0, 7, ROWS)),
                "val": pa.array(rng.standard_normal(ROWS).astype(np.float64)),
            }
        ).to_reader(),
    )
    return root


@pytest.fixture(scope="module")
def caches(root):
    import jax

    assert jax.device_count() >= 2, "test env must expose a multi-device mesh"
    # small blocks spread the 3k rows over every shard (default 16384-row
    # blocks would land the whole corpus in shard 0 at this test size)
    single = session.DeviceCache(root, block=128, mesh=None)
    meshed = session.DeviceCache(root, block=128)  # auto: all 8 devices
    assert meshed.mesh is not None and meshed.mesh.devices.size == jax.device_count()
    return single, meshed


def _req(**kw):
    defaults = dict(source="t", column="vector", metric="l2")
    defaults.update(kw)
    return ex.SearchRequest(**defaults)


def _assert_equivalent(a: pa.Table, b: pa.Table) -> None:
    """Same rows in the same order; distances equal to fp32 accumulation
    tolerance (the sharded rescore matmul tiles differently from the
    single-device one, so values diverge by ~1 ulp — SURVEY.md §7 'hard
    parts', exact-match determinism)."""
    assert a.schema == b.schema
    assert a.drop_columns([ex.DIST_COL]) == b.drop_columns([ex.DIST_COL])
    np.testing.assert_allclose(
        np.asarray(a.column(ex.DIST_COL)),
        np.asarray(b.column(ex.DIST_COL)),
        rtol=1e-6,
        atol=1e-6,
    )


@pytest.mark.parametrize(
    "kw",
    [
        dict(maxval=10),
        dict(maxval=10, metric="cosine"),
        dict(maxval=10, metric="dot"),
        dict(maxval=7, filter=expr.field("tag") == 2),
        dict(maxval=10, precision="bf16"),
        dict(maxval=10, precision="int8"),
        dict(maxval=5, coding="c", probes=3),
        dict(maxval=5, coding="c", probes=3, filter=expr.field("tag") < 3),
        dict(maxval=2000),  # k > rows/shard: merge pads local candidates
    ],
    ids=lambda kw: "-".join(f"{k}={getattr(v, 'op', v)}" for k, v in kw.items()),
)
def test_sharded_equals_single_device(caches, rng, kw):
    single, meshed = caches
    target = rng.standard_normal((4, DIM)).astype(np.float32)
    a = ex.execute_search(single, _req(target=target, **kw))
    b = ex.execute_search(meshed, _req(target=target, **kw))
    _assert_equivalent(a, b)


def test_sharded_single_query_table(caches, rng):
    single, meshed = caches
    target = rng.standard_normal(DIM).astype(np.float32)
    a = ex.execute_search(single, _req(target=target, maxval=10))
    b = ex.execute_search(meshed, _req(target=target, maxval=10))
    _assert_equivalent(a, b)
    assert "__QUERY_ID__" not in b.schema.names


def test_sharded_batched_dispatch(caches, rng):
    """Coalesced multi-request dispatch through the mesh: same results
    as issuing each request solo on a single device."""
    single, meshed = caches
    reqs = [
        _req(target=rng.standard_normal((3, DIM)).astype(np.float32), maxval=4),
        _req(target=rng.standard_normal(DIM).astype(np.float32), maxval=9),
        _req(target=rng.standard_normal((2, DIM)).astype(np.float32), maxval=6),
    ]
    batched = ex.execute_search_batched(meshed, reqs)
    solo = [ex.execute_search(single, r) for r in reqs]
    for got, want in zip(batched, solo):
        _assert_equivalent(got, want)


def test_sharded_batched_probed(caches, rng):
    single, meshed = caches
    reqs = [
        _req(
            target=rng.standard_normal((2, DIM)).astype(np.float32),
            maxval=4,
            coding="c",
            probes=3,
        )
        for _ in range(3)
    ]
    batched = ex.execute_search_batched(meshed, reqs)
    solo = [ex.execute_search(single, r) for r in reqs]
    for got, want in zip(batched, solo):
        _assert_equivalent(got, want)


@pytest.mark.parametrize(
    "aggspec",
    [
        None,  # enrichment join
        {"group_by": "grp", "agg": "count", "max_groups": 16},
        {"group_by": "grp", "agg": "sum", "value": "val", "max_groups": 16},
        {"group_by": "grp", "agg": "min", "value": "__DISTANCE__", "max_groups": 16},
    ],
    ids=["enrich", "count", "sum-val", "min-dist"],
)
def test_sharded_fused_analytics(caches, rng, aggspec):
    """Fused search→join[→aggregate] through the mesh must match the
    single-device pipeline (fact side sharded, dimension side
    replicated)."""
    from fenix_tpu.engine import analytics

    single, meshed = caches
    target = rng.standard_normal((3, DIM)).astype(np.float32)
    join = analytics.JoinSpec(source="attrs", right_on="key", left_on="id")
    agg = analytics.AggregateSpec.from_dict(aggspec) if aggspec else None

    a = analytics.execute_search_join(
        single, _req(target=target, maxval=8), join, agg
    )
    b = analytics.execute_search_join(
        meshed, _req(target=target, maxval=8), join, agg
    )
    if agg is None:
        _assert_equivalent(a, b)
    else:
        assert a.column("__GROUP__") == b.column("__GROUP__")
        np.testing.assert_allclose(
            np.asarray(a.column("__AGG__")),
            np.asarray(b.column("__AGG__")),
            rtol=1e-5,
            atol=1e-6,
        )


def test_sharded_fused_analytics_filtered(caches, rng):
    from fenix_tpu.engine import analytics

    single, meshed = caches
    target = rng.standard_normal((2, DIM)).astype(np.float32)
    join = analytics.JoinSpec(source="attrs", right_on="key", left_on="id")
    req_kw = dict(maxval=6, filter=expr.field("tag") < 3)
    a = analytics.execute_search_join(single, _req(target=target, **req_kw), join)
    b = analytics.execute_search_join(meshed, _req(target=target, **req_kw), join)
    _assert_equivalent(a, b)


def test_mesh_off_env(root, monkeypatch):
    """FENIX_MESH=off forces single-device serving even with many
    devices visible."""
    from fenix_tpu.parallel import mesh as mesh_mod

    monkeypatch.setattr(mesh_mod, "_SERVING_MESH", "unset")
    monkeypatch.setenv("FENIX_MESH", "off")
    cache = session.DeviceCache(root)
    assert cache.mesh is None
    monkeypatch.setattr(mesh_mod, "_SERVING_MESH", "unset")
    monkeypatch.setenv("FENIX_MESH", "2")
    cache = session.DeviceCache(root)
    assert cache.mesh is not None and cache.mesh.devices.size == 2
    monkeypatch.setattr(mesh_mod, "_SERVING_MESH", "unset")


def test_sharded_clustered_ivf_route(tmp_path, rng):
    """At scale (selective probes over many rows) the mesh-probed path
    must take the PER-SHARD clustered gather route and return exactly
    the single-device clustered result."""
    root = str(tmp_path)
    n, d = 65_536, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs += (np.arange(n)[:, None] % 16) * 2.0  # cell structure
    table.make(
        root,
        "big",
        pa.table(
            {
                "id": pa.array(np.arange(n)),
                "tag": pa.array(np.arange(n) % 5),
                "vector": ingest.numpy_to_fixed_size_list(vecs, pa.float32()),
            }
        ).to_reader(),
    )
    cfg: coder.Config = {
        "metric": "l2", "codebook_size": 4, "num_codebooks": 2,
        "batch_size": 1024, "num_epochs": 1,
    }
    coder.make(root, "cc", "big", "vector", cfg, seed=0)
    index.make(root, "cc", "big", "vector")

    single = session.DeviceCache(root, mesh=None)
    meshed = session.DeviceCache(root)

    for filt in (None, expr.field("tag") == 2):
        req_kw = dict(
            source="big", column="vector", metric="l2",
            coding="cc", probes=2, maxval=8, filter=filt,
        )
        target = rng.standard_normal(d).astype(np.float32)
        a = ex.execute_search(single, ex.SearchRequest(target=target, **req_kw))
        b = ex.execute_search(meshed, ex.SearchRequest(target=target, **req_kw))
        _assert_equivalent(a, b)

    # the clustered route was actually taken (device cache built the
    # per-shard sorted layout), not the masked-scan fallback
    assert any(
        isinstance(key, tuple) and "sharded_clustered" in key for key in meshed._device
    ), sorted(str(k) for k in meshed._device)

    # REGRESSION (round-2 eviction bug): the filtered probed query
    # reaches host_table mid-request through the pushdown path; a
    # first-time host load at the SAME revision must not evict the
    # corpus-sized clustered layout the request just built. At a fixed
    # revision the layout builds exactly once, no matter how queries
    # interleave filters and probes.
    builds_at_fixed_revision = meshed.clustered_builds
    for filt in (None, expr.field("tag") == 2, None):
        req_kw = dict(
            source="big", column="vector", metric="l2",
            coding="cc", probes=2, maxval=8, filter=filt,
        )
        target = rng.standard_normal(d).astype(np.float32)
        ex.execute_search(meshed, ex.SearchRequest(target=target, **req_kw))
    assert meshed.clustered_builds == builds_at_fixed_revision == 1


def test_cross_shard_tie_break(tmp_path, rng):
    """Exact duplicate vectors living on DIFFERENT shards: the merged
    top-k must order ties by ascending global id, exactly like a single
    device (the shard-major merge argument, pinned)."""
    root = str(tmp_path)
    n, d = 1024, 8
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    # one vector duplicated at ids spread across all 8 shards (128 rows
    # per shard at block=16)
    dup = vecs[3].copy()
    dup_ids = [3, 200, 333, 470, 601, 777, 900, 1021]
    for i in dup_ids:
        vecs[i] = dup
    table.make(
        root,
        "t",
        pa.table(
            {
                "id": pa.array(np.arange(n)),
                "vector": ingest.numpy_to_fixed_size_list(vecs, pa.float32()),
            }
        ).to_reader(),
    )
    single = session.DeviceCache(root, block=16, mesh=None)
    meshed = session.DeviceCache(root, block=16)

    a = ex.execute_search(single, _req(target=dup, maxval=len(dup_ids)))
    b = ex.execute_search(meshed, _req(target=dup, maxval=len(dup_ids)))
    assert np.asarray(a.column("id")).tolist() == dup_ids
    assert np.asarray(b.column("id")).tolist() == dup_ids
