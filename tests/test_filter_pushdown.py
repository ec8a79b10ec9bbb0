"""Device-side filter pushdown (VERDICT r1 #5).

Device-evaluable predicates must run entirely from HBM-resident scalar
columns — zero per-query host mask uploads — with results IDENTICAL to
the host-evaluated path, across every kernel layout (flat, sharded,
clustered, sharded-clustered). Non-evaluable predicates (strings,
float64 columns) fall back to the host mask.
"""

import numpy as np
import pyarrow as pa
import pytest

from fenix_tpu import coder, expr, index
from fenix_tpu.engine import executor as ex
from fenix_tpu.engine import session
from fenix_tpu.io import ingest, table
from fenix_tpu.utils.metrics import GLOBAL as METRICS

ROWS, DIM = 2_000, 16

CONFIG: coder.Config = {
    "metric": "l2", "codebook_size": 4, "num_codebooks": 2,
    "batch_size": 512, "num_epochs": 2,
}


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    rng = np.random.default_rng(5)
    root = str(tmp_path_factory.mktemp("pushdown_root"))
    vecs = rng.standard_normal((ROWS, DIM)).astype(np.float32)
    table.make(
        root,
        "t",
        pa.table(
            {
                "id": pa.array(np.arange(ROWS)),
                "tag": pa.array(rng.integers(0, 5, ROWS)),
                "score": pa.array(
                    rng.standard_normal(ROWS).astype(np.float32)
                ),
                "name": pa.array([f"row-{i}" for i in range(ROWS)]),
                "vector": ingest.numpy_to_fixed_size_list(vecs, pa.float32()),
            }
        ).to_reader(),
    )
    coder.make(root, "c", "t", "vector", CONFIG, seed=0)
    index.make(root, "c", "t", "vector")
    return root


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def _search(cache, filt, rng, **kw):
    req = ex.SearchRequest(
        source="t", column="vector", metric="l2",
        target=rng.standard_normal((3, DIM)).astype(np.float32),
        maxval=8, filter=filt, **kw,
    )
    return ex.execute_search(cache, req)


DEVICE_FILTERS = [
    expr.field("tag") == 3,
    (expr.field("tag") >= 1) & (expr.field("id") < 900),
    expr.field("id").isin([1, 5, 9, 100, 600, 1500]),
    expr.field("score") > 0.25,  # f32-exact literal on an f32 column
    (expr.field("id") % 7) == 2,
    ~(expr.field("tag") == 0),
]

HOST_FILTERS = [
    expr.field("name").starts_with("row-1"),  # string: host only
    expr.field("score") > 0.1,  # 0.1 is not f32-exact: host for parity
]


@pytest.mark.parametrize("filt", DEVICE_FILTERS, ids=[f.to_json() for f in DEVICE_FILTERS])
@pytest.mark.parametrize("meshed", [False, True], ids=["flat", "sharded"])
def test_pushdown_matches_host_and_uploads_nothing(root, rng, filt, meshed):
    cache = session.DeviceCache(root, block=128, mesh="auto" if meshed else None)
    assert filt.device_evaluable(cache.host_table("t").schema)

    before = METRICS.snapshot()
    got = _search(cache, filt, np.random.default_rng(3))
    after = METRICS.snapshot()
    assert after.get("filter.device_pushdown", 0) > before.get(
        "filter.device_pushdown", 0
    )
    assert after.get("filter.host_upload", 0) == before.get("filter.host_upload", 0)

    # equality vs the host-evaluated mask on a mesh-free cache
    oracle_cache = session.DeviceCache(root, block=128, mesh=None)
    data = oracle_cache.host_table("t")
    host_mask = filt.mask(data)
    ref = _search(oracle_cache, filt, np.random.default_rng(3))
    assert got.column("id").to_pylist() == ref.column("id").to_pylist()
    assert all(host_mask[i] for i in got.column("id").to_pylist())
    np.testing.assert_allclose(
        np.asarray(got.column(ex.DIST_COL)),
        np.asarray(ref.column(ex.DIST_COL)),
        atol=1e-5,
    )


@pytest.mark.parametrize("meshed", [False, True], ids=["flat", "sharded"])
def test_probed_pushdown_clustered_layouts(root, rng, meshed):
    """The clustered (gather) layouts permute the device mask into
    sorted order on device — results must match the unfiltered-oracle
    subset exactly."""
    cache = session.DeviceCache(root, block=128, mesh="auto" if meshed else None)
    filt = expr.field("tag") == 2
    before = METRICS.snapshot()
    got = _search(
        cache, filt, np.random.default_rng(3), coding="c", probes=16
    )
    after = METRICS.snapshot()
    assert after.get("filter.host_upload", 0) == before.get("filter.host_upload", 0)

    ref = _search(
        session.DeviceCache(root, block=128, mesh=None),
        filt, np.random.default_rng(3), coding="c", probes=16,
    )
    assert got.column("id").to_pylist() == ref.column("id").to_pylist()
    assert all(t == 2 for t in got.column("tag").to_pylist())


@pytest.mark.parametrize("filt", HOST_FILTERS, ids=["string", "f64-literal"])
def test_host_fallback_still_correct(root, rng, filt):
    cache = session.DeviceCache(root, block=128)
    assert not filt.device_evaluable(cache.host_table("t").schema)
    before = METRICS.snapshot()
    got = _search(cache, filt, np.random.default_rng(3))
    after = METRICS.snapshot()
    assert after.get("filter.host_upload", 0) > before.get("filter.host_upload", 0)
    mask = filt.mask(cache.host_table("t"))
    assert all(mask[i] for i in got.column("id").to_pylist())


def test_parametric_literals_share_one_compiled_eval(root):
    """Predicates differing only in literal values must share one
    compiled device evaluation (split_literals skeleton)."""
    cache = session.DeviceCache(root, block=128, mesh=None)
    session._mask_eval_fn.cache_clear()
    for threshold in (100, 200, 300, 400):
        m = cache.device_filter_mask("t", expr.field("id") < threshold)
        # padding rows carry value 0 and may evaluate True — the mask
        # is only ever composed with the aux overlay, which pre-masks
        # padding to -inf; count real rows only
        assert int(np.asarray(m)[:ROWS].sum()) == threshold
    info = session._mask_eval_fn.cache_info()
    assert info.misses == 1 and info.hits == 3, info


def test_filtered_requests_batch_by_predicate(root):
    """Identical-predicate requests coalesce into ONE dispatch."""
    cache = session.DeviceCache(root, block=128)
    f = expr.field("tag") == 1
    reqs = [
        ex.SearchRequest(
            source="t", column="vector", metric="l2",
            target=np.random.default_rng(i).standard_normal((2, DIM)).astype(np.float32),
            maxval=5, filter=f,
        )
        for i in range(3)
    ]
    assert all(ex.batchable(r) for r in reqs)
    keys = {ex.batch_key(r) for r in reqs}
    assert len(keys) == 1
    outs = ex.execute_search_batched(cache, reqs)
    solos = [ex.execute_search(cache, r) for r in reqs]
    for got, ref in zip(outs, solos):
        assert got.column("id").to_pylist() == ref.column("id").to_pylist()
        assert all(t == 1 for t in got.column("tag").to_pylist())

    # different predicates must NOT share a batch key
    g = expr.field("tag") == 2
    assert ex.batch_key(reqs[0]) != ex.batch_key(
        ex.SearchRequest(
            source="t", column="vector", metric="l2",
            target=reqs[0].target, maxval=5, filter=g,
        )
    )
