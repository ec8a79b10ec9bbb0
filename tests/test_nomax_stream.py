"""Streamed no-top-k path (VERDICT r1 #10): maxval=None reads must
return the reference-semantics result (every filtered/probed row with
its exact distance, in table order) while streaming selection through
the device — the full [Q, N] distance matrix is never fetched."""

import numpy as np
import pyarrow as pa
import pytest

from fenix_tpu import coder, expr, index
from fenix_tpu.engine import executor as ex
from fenix_tpu.engine import session
from fenix_tpu.io import ingest, table
from tests import oracles

ROWS, DIM = 3_000, 16

CONFIG: coder.Config = {
    "metric": "l2", "codebook_size": 4, "num_codebooks": 2,
    "batch_size": 512, "num_epochs": 2,
}


@pytest.fixture(scope="module")
def ctx(tmp_path_factory):
    rng = np.random.default_rng(13)
    root = str(tmp_path_factory.mktemp("nomax_root"))
    vecs = rng.standard_normal((ROWS, DIM)).astype(np.float32)
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
    return root, vecs


def _dist(vecs, q):
    return np.sqrt(((vecs - q) ** 2).sum(axis=1))


def _run(root, target, meshed, **kw):
    cache = session.DeviceCache(root, block=256, mesh="auto" if meshed else None)
    req = ex.SearchRequest(
        source="t", column="vector", metric="l2", target=target,
        maxval=None, **kw,
    )
    return ex.execute_search(cache, req)


@pytest.mark.parametrize("meshed", [False, True], ids=["flat", "sharded"])
def test_filtered_nomax_matches_oracle(ctx, meshed):
    root, vecs = ctx
    rng = np.random.default_rng(3)
    target = rng.standard_normal((2, DIM)).astype(np.float32)
    filt = (expr.field("tag") == 2) | (expr.field("id") < 50)
    out = _run(root, target, meshed, filter=filt)

    data = table.load(root, "t")
    mask = filt.mask(data)
    expected_ids = np.flatnonzero(mask)
    for qi in range(2):
        part = out.filter(pa.compute.equal(out.column(ex.QUERY_COL), qi))
        assert part.column("id").to_pylist() == expected_ids.tolist()
        np.testing.assert_allclose(
            np.asarray(part.column(ex.DIST_COL)),
            _dist(vecs, target[qi])[mask],
            rtol=1e-5, atol=1e-5,
        )


@pytest.mark.parametrize("meshed", [False, True], ids=["flat", "sharded"])
def test_probed_nomax_matches_host_oracle(ctx, meshed):
    """Probe pruning ANDs into the filter (reference index.py:113-126)
    for maxval=None too — per-query cells, in-kernel membership."""
    root, vecs = ctx
    rng = np.random.default_rng(4)
    target = rng.standard_normal((3, DIM)).astype(np.float32)
    filt = expr.field("id") < 2_500
    out = _run(root, target, meshed, filter=filt, coding="c", probes=4)

    cache = session.DeviceCache(root, block=256, mesh=None)
    data = cache.coded_table("c", "t", "vector")
    codes = np.asarray(data.column(ex.CODE_COL))
    coding_data = cache.coding("c")
    cells = ex._rank_cells(target, coding_data, "l2", 4)
    fmask = filt.mask(data)
    for qi in range(3):
        keep = fmask & np.isin(codes, np.asarray(cells[qi]))
        part = out.filter(pa.compute.equal(out.column(ex.QUERY_COL), qi))
        assert part.column("id").to_pylist() == np.flatnonzero(keep).tolist()
        np.testing.assert_allclose(
            np.asarray(part.column(ex.DIST_COL)),
            _dist(vecs, target[qi])[keep],
            rtol=1e-5, atol=1e-5,
        )


def test_large_q_nomax(ctx):
    """Q beyond the canonical steps streams without the host loop that
    bounded round 1 (O(Q·N) np.isin work)."""
    root, vecs = ctx
    rng = np.random.default_rng(5)
    q = 150
    target = rng.standard_normal((q, DIM)).astype(np.float32)
    filt = expr.field("tag") == 1
    out = _run(root, target, True, filter=filt)
    data = table.load(root, "t")
    mask = filt.mask(data)
    n_sel = int(mask.sum())
    assert out.num_rows == q * n_sel
    qids = np.asarray(out.column(ex.QUERY_COL))
    assert (np.bincount(qids, minlength=q) == n_sel).all()
    part = out.filter(pa.compute.equal(out.column(ex.QUERY_COL), q - 1))
    np.testing.assert_allclose(
        np.asarray(part.column(ex.DIST_COL)),
        _dist(vecs, target[q - 1])[mask],
        rtol=1e-5, atol=1e-5,
    )


def test_unfiltered_full_read_keeps_all_rows(ctx):
    root, vecs = ctx
    target = np.zeros((1, DIM), np.float32)
    out = _run(root, target, True)
    assert out.num_rows == ROWS
    assert out.column("id").to_pylist() == list(range(ROWS))
    np.testing.assert_allclose(
        np.asarray(out.column(ex.DIST_COL)), _dist(vecs, target[0]),
        rtol=1e-5, atol=1e-5,
    )


def test_empty_selection(ctx):
    root, _ = ctx
    out = _run(root, np.zeros((2, DIM), np.float32), True,
               filter=expr.field("id") < 0)
    assert out.num_rows == 0
    assert ex.DIST_COL in out.column_names
