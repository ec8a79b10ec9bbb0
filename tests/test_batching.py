"""Micro-batched search: coalesced dispatch must be result-identical to
solo execution (fenix_tpu.engine.batching / executor.execute_search_batched)."""

import threading

import numpy as np
import pyarrow as pa
import pytest

from fenix_tpu.engine import batching, executor
from fenix_tpu.io import ingest, table
from tests import oracles

ROWS, DIM = 1500, 32


@pytest.fixture
def root(tmp_path, rng):
    root = str(tmp_path)
    x = rng.standard_normal((ROWS, DIM)).astype(np.float32)
    data = pa.table(
        {
            "id": pa.array(np.arange(ROWS)),
            "tag": pa.array(rng.integers(0, 4, ROWS)),
            "vector": ingest.numpy_to_fixed_size_list(x, pa.float32()),
        }
    )
    table.make(root, "b/table", data.to_reader())
    return root


def _req(target, **kw):
    defaults = dict(source="b/table", column="vector", metric="l2", maxval=5)
    defaults.update(kw)
    return executor.SearchRequest(target=target, **defaults)


def test_batched_matches_solo(root, rng):
    cache = executor.get_cache(root)
    targets = [rng.standard_normal((q, DIM)).astype(np.float32) for q in (1, 3, 2)]
    maxvals = [5, 7, 3]
    reqs = [_req(t, maxval=m) for t, m in zip(targets, maxvals)]

    got = executor.execute_search_batched(cache, reqs)
    want = [executor.execute_search(cache, r) for r in reqs]
    for g, w in zip(got, want):
        assert g == w, (g.column_names, w.column_names)


def test_batched_respects_select_and_metric(root, rng):
    cache = executor.get_cache(root)
    t1 = rng.standard_normal(DIM).astype(np.float32)
    t2 = rng.standard_normal((2, DIM)).astype(np.float32)
    reqs = [
        _req(t1, metric="cosine", select=["id"]),
        _req(t2, metric="cosine"),
    ]
    got = executor.execute_search_batched(cache, reqs)
    assert got[0].column_names == ["id", executor.DIST_COL]
    want = [executor.execute_search(cache, r) for r in reqs]
    assert got[0] == want[0] and got[1] == want[1]


def test_batcher_concurrent_consistency(root, rng):
    cache = executor.get_cache(root)
    batcher = batching.SearchBatcher(cache)
    targets = [rng.standard_normal(DIM).astype(np.float32) for _ in range(12)]
    want = [
        executor.execute_search(cache, _req(t, maxval=4)) for t in targets
    ]

    results: list = [None] * len(targets)
    errors: list = []

    def worker(i):
        try:
            results[i] = batcher.submit(_req(targets[i], maxval=4))
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(len(targets))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert not errors
    for got, expect in zip(results, want):
        assert got == expect


def test_batcher_routes_ineligible_solo(root, rng):
    from fenix_tpu import expr

    cache = executor.get_cache(root)
    batcher = batching.SearchBatcher(cache)
    t = rng.standard_normal(DIM).astype(np.float32)

    # filter → solo path, still correct
    res = batcher.submit(_req(t, filter=expr.field("tag") == 2))
    assert (np.asarray(res.column("tag")) == 2).all()

    # no maxval → solo path (full distance column)
    res2 = batcher.submit(_req(t, maxval=None))
    assert res2.num_rows == ROWS


def test_batcher_poisoned_batch_isolates_error(root, rng):
    """A bad request in a coalesced group must not fail its neighbors."""
    cache = executor.get_cache(root)
    batcher = batching.SearchBatcher(cache)
    good = rng.standard_normal(DIM).astype(np.float32)
    bad = rng.standard_normal(DIM + 1).astype(np.float32)  # wrong dim

    reqs = [_req(good), _req(bad), _req(good)]
    items = [batching._Item(r, 1, executor.batch_key(r)) for r in reqs]
    batcher._dispatch(items)
    # drain whatever the dispatch put in flight (solo-fallback resolves
    # inline; a successful defer would need the completer)
    while not batcher._inflight.empty():
        group, finish = batcher._inflight.get()
        try:
            for item, result in zip(group, finish()):
                item.result = result
        except BaseException as exc:  # noqa: BLE001
            batcher._fallback_solo(group, exc)

    assert items[0].result is not None and items[2].result is not None
    assert items[1].error is not None
    want = executor.execute_search(cache, reqs[0])
    assert items[0].result == want


def test_batcher_invalid_metric_fails_on_caller_thread(root, rng):
    """A bogus metric must raise to the caller, not poison the
    dispatcher thread (batch_key would throw during grouping)."""
    cache = executor.get_cache(root)
    batcher = batching.SearchBatcher(cache)
    t = rng.standard_normal(DIM).astype(np.float32)
    with pytest.raises(Exception):
        batcher.submit(_req(t, metric="bogus"))
    # dispatcher still serves later requests
    res = batcher.submit(_req(t))
    assert res.num_rows == 5


def test_batched_probed_matches_solo(root, rng):
    """Probed requests with identical (coding, probes) coalesce; results
    must match solo execution exactly."""
    from fenix_tpu import coder, index

    cfg = {"metric": "l2", "codebook_size": 4, "num_codebooks": 2,
           "batch_size": 256, "num_epochs": 2}
    coder.make(root, "b/ivf", "b/table", "vector", cfg, seed=0)
    index.make(root, "b/ivf", "b/table", "vector")

    cache = executor.get_cache(root)
    targets = [rng.standard_normal((q, DIM)).astype(np.float32) for q in (1, 2, 1)]
    reqs = [_req(t, coding="b/ivf", probes=4, maxval=5) for t in targets]

    got = executor.execute_search_batched(cache, reqs)
    want = [executor.execute_search(cache, r) for r in reqs]
    for g, w in zip(got, want):
        assert g == w, (g.column_names, w.column_names)
    assert "__CODED_ID__" in got[0].column_names  # coded schema preserved


def test_batcher_concurrent_probed(root, rng):
    from fenix_tpu import coder, index
    import threading

    cfg = {"metric": "l2", "codebook_size": 4, "num_codebooks": 2,
           "batch_size": 256, "num_epochs": 2}
    coder.make(root, "c/ivf", "b/table", "vector", cfg, seed=0)
    index.make(root, "c/ivf", "b/table", "vector")
    cache = executor.get_cache(root)
    batcher = batching.SearchBatcher(cache)
    targets = [rng.standard_normal(DIM).astype(np.float32) for _ in range(8)]
    want = [executor.execute_search(cache, _req(t, coding="c/ivf", probes=4, maxval=4))
            for t in targets]
    results = [None] * 8
    errs = []
    def worker(i):
        try:
            results[i] = batcher.submit(_req(targets[i], coding="c/ivf", probes=4, maxval=4))
        except BaseException as e:
            errs.append(e)
    ts = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    [t.start() for t in ts]; [t.join() for t in ts]
    assert not errs
    for got, expect in zip(results, want):
        assert got == expect
