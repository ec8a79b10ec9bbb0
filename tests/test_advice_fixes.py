"""Regression tests for the round-1 advisor findings (ADVICE.md)."""

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


def test_quint8_qmax_round_trips_metadata(rng):
    x = rng.standard_normal((4, 8)).astype(np.float32)
    t = quint8.QUInt8TensorArray.from_numpy(x).type
    t2 = quint8.QUInt8TensorType.__arrow_ext_deserialize__(
        t.storage_type, t.__arrow_ext_serialize__()
    )
    assert (t2.shape, t2.scale, t2.shift, t2.qmax) == (
        t.shape, t.scale, t.shift, t.qmax,
    )
