"""Regression tests for the round-1 advisor findings (ADVICE.md)."""

import os

import numpy as np
import pyarrow as pa
import pytest

from fenix_tpu import coder, index
from fenix_tpu.io import ingest, locks, table
from fenix_tpu.types import quint8


def make_vec_table(root, name, rows, dim, rng, columns=("vector",)):
    cols = {"id": pa.array(np.arange(rows))}
    for col in columns:
        vecs = rng.standard_normal((rows, dim)).astype(np.float32)
        cols[col] = ingest.numpy_to_fixed_size_list(vecs, pa.float32())
    table.make(root, name, pa.table(cols).to_reader())


CFG: coder.Config = {
    "metric": "l2", "codebook_size": 2, "num_codebooks": 1,
    "batch_size": 64, "num_epochs": 1,
}


# -- ADVICE #2: read_stable must retry, not fail, on a mid-read unlink ----


def test_read_stable_retries_file_not_found():
    state = {"stamp": 0, "reads": 0}

    def read_fn():
        state["reads"] += 1
        if state["reads"] == 1:
            state["stamp"] += 1  # concurrent compaction unlinked a part
            raise FileNotFoundError("part vanished")
        return "ok"

    value, token = locks.read_stable(lambda: state["stamp"], read_fn, "t")
    assert value == "ok"
    assert state["reads"] == 2


def test_read_stable_raises_when_truly_gone():
    def read_fn():
        raise FileNotFoundError("gone")

    with pytest.raises(FileNotFoundError):
        locks.read_stable(lambda: 1, read_fn, "t")


# -- ADVICE #3: overwrite must not strand dropped columns' index files ----


def test_drop_for_source_removes_stale_column_indexes(tmp_path, rng):
    root = str(tmp_path)
    make_vec_table(root, "t", 200, 8, rng, columns=("v1", "v2"))
    coder.make(root, "c", "t", "v2", CFG, seed=0)
    index.make(root, "c", "t", "v2")

    # Overwrite drops column v2 — the v2 index is now unattributable
    # under the new schema, but must still be removed.
    make_vec_table(root, "t", 200, 8, rng, columns=("v1",))
    index.drop_for_source(root, "t")
    assert [*index.list(root)] == []


def test_drop_for_source_preserves_nested_sibling(tmp_path, rng):
    root = str(tmp_path)
    make_vec_table(root, "a", 200, 8, rng)
    make_vec_table(root, "a/b", 200, 8, rng)
    for src in ("a", "a/b"):
        coder.make(root, f"c-{src.replace('/', '-')}", src, "vector", CFG, seed=0)
        index.make(root, f"c-{src.replace('/', '-')}", src, "vector")

    index.drop_for_source(root, "a")
    remaining = [*index.list(root)]
    assert remaining == ["a/b/vector/c-a-b"]


# -- ADVICE #4: appends into quint8 clip to the column's code range ------


def test_quint8_like_clips_to_recorded_qmax(rng):
    x = rng.standard_normal((16, 8)).astype(np.float32)
    arr = quint8.QUInt8TensorArray.from_numpy(x)
    assert arr.type.qmax == 127
    assert np.asarray(arr.storage.flatten()).max() <= 127

    # appended rows far outside the original range must not occupy
    # codes the original column never emits
    arr2 = quint8.QUInt8TensorArray.from_numpy(x * 100.0, like=arr.type)
    assert np.asarray(arr2.storage.flatten()).max() <= 127
    assert arr2.type == arr.type  # append schema check passes


# -- ADVICE r3 #1: empty-probe aggregate keeps the non-empty schema ------


@pytest.fixture
def agg_root(tmp_path, rng):
    from fenix_tpu.io import ingest as _ingest

    root = str(tmp_path)
    vecs = rng.standard_normal((256, 8)).astype(np.float32)
    table.make(
        root,
        "vec",
        pa.table(
            {
                "id": pa.array(np.arange(256)),
                "vector": _ingest.numpy_to_fixed_size_list(vecs, pa.float32()),
            }
        ).to_reader(),
    )
    table.make(
        root,
        "attrs",
        pa.table(
            {
                "key": pa.array(np.arange(256, dtype=np.int64)),
                "grp": pa.array((np.arange(256) % 5).astype(np.int64)),
                "iv": pa.array(np.arange(256, dtype=np.int64)),
                "fv": pa.array(np.arange(256, dtype=np.float64)),
            }
        ).to_reader(),
    )
    return root


@pytest.mark.parametrize(
    "value,agg,how",
    [
        ("iv", "sum", "left"),
        ("iv", "mean", "left"),
        ("fv", "sum", "left"),
        (None, "count", "left"),
        ("iv", "sum", "inner"),
    ],
)
def test_empty_probe_aggregate_schema_matches_nonempty(agg_root, rng, value, agg, how):
    from fenix_tpu import expr
    from fenix_tpu.engine import analytics, executor

    cache = executor.get_cache(agg_root)
    target = rng.standard_normal(8).astype(np.float32)
    join = analytics.JoinSpec(source="attrs", right_on="key", how=how)
    spec = analytics.AggregateSpec(group_by="grp", value=value, agg=agg, max_groups=16)

    def run(filt):
        req = executor.SearchRequest(
            source="vec", column="vector", target=target, metric="l2",
            maxval=20, filter=filt,
        )
        return analytics.execute_search_join(cache, req, join, spec)

    full = run(None)
    empty = run(expr.field("id") < 0)
    assert empty.num_rows == 0
    assert empty.schema == full.schema, (empty.schema, full.schema)


# -- ADVICE r3 #2: partitioned=True without a mesh downgrades LOUDLY ------


def test_partitioned_without_mesh_counts_downgrade(agg_root, rng):
    from fenix_tpu.engine import analytics, executor
    from fenix_tpu.engine.session import DeviceCache
    from fenix_tpu.utils.metrics import GLOBAL as METRICS

    cache = DeviceCache(agg_root, mesh=None)
    target = rng.standard_normal(8).astype(np.float32)
    req = executor.SearchRequest(
        source="vec", column="vector", target=target, metric="l2", maxval=10
    )
    before = METRICS.snapshot().get("join.partitioned_downgraded", 0)
    out = analytics.execute_search_join(
        cache,
        req,
        analytics.JoinSpec(source="attrs", right_on="key", partitioned=True),
    )
    assert out.num_rows == 10  # replicated path still serves the query
    assert METRICS.snapshot().get("join.partitioned_downgraded", 0) == before + 1


def test_quint8_qmax_round_trips_metadata(rng):
    x = rng.standard_normal((4, 8)).astype(np.float32)
    t = quint8.QUInt8TensorArray.from_numpy(x).type
    t2 = quint8.QUInt8TensorType.__arrow_ext_deserialize__(
        t.storage_type, t.__arrow_ext_serialize__()
    )
    assert (t2.shape, t2.scale, t2.shift, t2.qmax) == (
        t.shape, t.scale, t.shift, t.qmax,
    )


# -- round-4 advisor findings ---------------------------------------------


def _int8_cdir(root, name, column):
    import hashlib

    return os.path.join(
        table.int8cache_dir(root, name),
        hashlib.sha1(column.encode()).hexdigest()[:16],
    )


def test_sidecar_tmp_sweep_spares_live_writers(tmp_path, rng):
    """The orphan sweep must only delete tmp files whose embedded pid is
    DEAD: deleting a live concurrent writer's tmp files makes its
    os.replace raise and its handler destroy the whole sidecar dir
    (round-4 advisor #1)."""
    from fenix_tpu.engine import session

    root = str(tmp_path)
    make_vec_table(root, "t", 64, 8, rng)
    cdir = _int8_cdir(root, "t", "vector")
    os.makedirs(cdir)
    live = os.path.join(cdir, ".tmp-1-codes.npy")  # pid 1: always alive
    dead = os.path.join(cdir, ".tmp-3999999-codes.npy")  # no such pid
    for p in (live, dead):
        with open(p, "wb") as fh:
            fh.write(b"x")

    cache = session.DeviceCache(root, block=16, mesh=None)
    codes, scales = cache.host_int8("t", "vector")
    assert codes.shape == (64, 8)
    assert os.path.exists(live), "live writer's tmp file must survive"
    assert not os.path.exists(dead), "dead writer's orphan must be swept"
    # the sidecar itself is intact
    assert os.path.exists(os.path.join(cdir, "meta.json"))


def test_quantize_chunk_rows_scales_with_dim():
    """Host-quantize slices are sized in bytes (round-4 advisor #2): a
    fixed row count is ~6.4 GB/slice at d=1536."""
    from fenix_tpu.engine.session import _quantize_chunk_rows

    for d in (16, 128, 768, 1536, 8192):
        rows = _quantize_chunk_rows(d)
        assert rows >= 1
        assert rows * 4 * d <= (256 << 20) + 4 * d  # bounded in bytes
    assert _quantize_chunk_rows(1536) < _quantize_chunk_rows(128)
