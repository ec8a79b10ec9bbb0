"""Regression tests for the round-1 code-review findings."""

import numpy as np
import pyarrow as pa
import pytest

from fenix_tpu import coder, expr, index
from fenix_tpu.io import ingest, table
from tests import oracles


def make_vec_table(root, name, rows, dim, rng, offset=0):
    vecs = rng.standard_normal((rows, dim)).astype(np.float32)
    table.make(
        root,
        name,
        pa.table(
            {
                "id": pa.array(np.arange(offset, offset + rows)),
                "vector": ingest.numpy_to_fixed_size_list(vecs, pa.float32()),
            }
        ).to_reader(),
    )
    return vecs


def test_drop_all_respects_name_boundaries(tmp_path, rng):
    """drop_index('v1') must not delete indexes of coder 'myv1'."""
    root = str(tmp_path)
    make_vec_table(root, "t", 500, 8, rng)
    cfg: coder.Config = {
        "metric": "l2", "codebook_size": 2, "num_codebooks": 1,
        "batch_size": 64, "num_epochs": 1,
    }
    for name in ("v1", "myv1"):
        coder.make(root, name, "t", "vector", cfg, seed=0)
        index.make(root, name, "t", "vector")

    index.drop_all(root, "v1")
    remaining = [*index.list(root)]
    assert remaining == ["t/vector/myv1"]


def test_path_traversal_rejected(tmp_path):
    root = str(tmp_path / "root")
    import os

    os.makedirs(root)
    with pytest.raises(ValueError, match="escapes storage root"):
        table.path_of(root, "../../evil")
    with pytest.raises(ValueError, match="escapes storage root"):
        coder.path_of(root, "../escape")
    with pytest.raises(ValueError, match="escapes storage root"):
        index.path_of(root, "../x", "src", "col")
    # namespaced names still work
    assert table.path_of(root, "a/b/c").endswith("sources/a/b/c.arrow")


def test_no_maxval_probed_restricts_rows(tmp_path, rng):
    """maxval=None + coding/probes must still prune to probed cells
    (reference index.py:113-126)."""
    root = str(tmp_path)
    vecs = make_vec_table(root, "t", 1000, 16, rng)
    cfg: coder.Config = {
        "metric": "l2", "codebook_size": 4, "num_codebooks": 2,
        "batch_size": 128, "num_epochs": 1,
    }
    coder.make(root, "c", "t", "vector", cfg, seed=0)
    index.make(root, "c", "t", "vector")

    target = rng.standard_normal(16).astype(np.float32)
    out = index.call(root, "c", "t", "vector", target, metric="l2", probes=2)

    coding = coder.load(root, "c")
    cells = coder.call(target, coding, maxval=2)
    codes = np.argmin(oracles.cell_scores(vecs, coding["tensor"], "l2"), axis=-1)
    expected_rows = int(np.isin(codes, cells).sum())
    assert out.num_rows == expected_rows
    assert set(np.asarray(out.column(index.CODE_COL)).tolist()) <= set(cells.tolist())


def test_coder_call_maxval_clamped(tmp_path, rng):
    root = str(tmp_path)
    make_vec_table(root, "t", 300, 8, rng)
    cfg: coder.Config = {
        "metric": "l2", "codebook_size": 4, "num_codebooks": 2,
        "batch_size": 64, "num_epochs": 1,
    }
    coding = coder.make(root, "c", "t", "vector", cfg, seed=0)
    ranks = coder.call(np.zeros(8, np.float32), coding, maxval=10_000)
    assert ranks.shape == (16,)  # clamped to k^n


def test_cell_space_guard():
    from fenix_tpu.ops import cells

    with pytest.raises(ValueError, match="int32 composite-cell id space"):
        cells.check_cell_space(256, 4)
    cells.check_cell_space(256, 3)  # 2^24 ok


def test_quint8_slice_keeps_params(rng):
    from fenix_tpu import types

    x = rng.standard_normal((20, 8)).astype(np.float32)
    q = types.quint8.from_numpy(x).to_numpy()
    sliced = q[:5]
    assert sliced.scale == q.scale and sliced.shift == q.shift
    np.testing.assert_allclose(sliced.dequantize(), q.dequantize()[:5])


def test_replay_covers_join_aggregate(tmp_path, rng, monkeypatch):
    from fenix_tpu.engine import executor, service
    from fenix_tpu.utils import replay

    root = str(tmp_path)
    make_vec_table(root, "t", 800, 8, rng)
    ids = rng.permutation(800)[:500]
    table.make(
        root,
        "attrs",
        pa.table(
            {
                "key": pa.array(ids.astype(np.int64)),
                "grp": pa.array((ids % 3).astype(np.int64)),
            }
        ).to_reader(),
    )

    log = str(tmp_path / "q.jsonl")
    monkeypatch.setenv(replay.LOG_ENV, log)

    config = {
        "source": "t",
        "column": "vector",
        "metric": "l2",
        "maxval": 50,
        "join": {"source": "attrs", "right_on": "key"},
        "aggregate": {"group_by": "grp", "agg": "count"},
    }
    target_np = rng.standard_normal(8).astype(np.float32)
    target_table = pa.table({"target": pa.array(target_np)})
    cache = executor.get_cache(root)
    result = service.run_search_config(cache, config, target_table.column("target"))
    replay.record(config, target_table, result)

    stats = replay.replay(log, root)
    assert stats == {"total": 1, "matched": 1, "mismatched": 0}
