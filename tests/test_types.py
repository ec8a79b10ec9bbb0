"""Columnar type system: round-trips through Arrow + IPC files."""

import numpy as np
import pyarrow as pa
import pytest

from fenix_tpu import types
from fenix_tpu.io import arrow

types.register_all()


def test_tensor_array_roundtrip(rng):
    x = rng.standard_normal((10, 3, 4)).astype(np.float32)
    arr = types.tensor.from_numpy(x)
    assert arr.type.shape == (3, 4)
    np.testing.assert_array_equal(arr.to_numpy(), x)
    # scalar access
    s = arr[2]
    np.testing.assert_array_equal(s.to_numpy(), x[2])


def test_tensor_ipc_roundtrip(tmp_path, rng):
    x = rng.standard_normal((8, 5)).astype(np.float32)
    table = pa.table({"t": types.tensor.from_numpy(x)})
    out = arrow.make(str(tmp_path / "t.arrow"), table.to_reader())
    col = out.column("t").combine_chunks()
    assert isinstance(col.type, types.TensorType)
    np.testing.assert_array_equal(col.to_numpy(), x)


def test_nested_roundtrip(rng):
    data = {
        "a": rng.standard_normal((6, 2)).astype(np.float32),
        "inner": {"b": rng.standard_normal((6, 3, 2)).astype(np.float32)},
    }
    arr = types.nested.from_numpy(data)
    back = arr.to_numpy()
    np.testing.assert_array_equal(back["a"], data["a"])
    np.testing.assert_array_equal(back["inner"]["b"], data["inner"]["b"])

    # sub-tree projection
    leaf = arr.to_field("inner", "b")
    assert isinstance(leaf.type, types.TensorType)
    np.testing.assert_array_equal(leaf.to_numpy(), data["inner"]["b"])

    sub = arr.to_field("inner")
    assert isinstance(sub.type, types.NestedTensorType)
    np.testing.assert_array_equal(sub.to_numpy()["b"], data["inner"]["b"])


def test_nested_scalar(rng):
    data = {"a": rng.standard_normal((4, 2)).astype(np.float32)}
    arr = types.nested.from_numpy(data)
    s = arr[1]
    np.testing.assert_array_equal(s.to_numpy()["a"], data["a"][1])


def test_quint8_quantize_roundtrip(rng):
    x = rng.standard_normal((20, 16)).astype(np.float32) * 3
    arr = types.quint8.from_numpy(x)
    deq = arr.dequantize()
    assert deq.shape == x.shape
    # quantization error bounded by scale/2 per element
    assert np.abs(deq - x).max() <= arr.type.scale * 0.5 + 1e-6


def test_quint8_ipc_roundtrip(tmp_path, rng):
    x = rng.standard_normal((10, 8)).astype(np.float32)
    table = pa.table({"q": types.quint8.from_numpy(x)})
    out = arrow.make(str(tmp_path / "q.arrow"), table.to_reader())
    col = out.column("q").combine_chunks()
    assert isinstance(col.type, types.QUInt8TensorType)
    np.testing.assert_allclose(col.dequantize(), x, atol=col.type.scale * 0.5 + 1e-6)


def test_quint8_jax_bridge(rng):
    x = rng.standard_normal((10, 8)).astype(np.float32)
    arr = types.quint8.from_numpy(x)
    q, scale, shift = arr.to_jax_quantized()
    deq = scale * (np.asarray(q).astype(np.float32) - shift)
    np.testing.assert_allclose(deq, arr.dequantize(), atol=1e-6)


def test_tensor_column_searchable_end_to_end(tmp_path, rng):
    """A TensorType (extension) vector column flows through the full
    search path — pins the PARITY claim that typed columns are usable
    beyond IPC round-trips."""
    import pyarrow as pa

    from fenix_tpu import index
    from fenix_tpu.io import table
    from fenix_tpu.types import tensor as tensor_mod

    root = str(tmp_path)
    vecs = rng.standard_normal((500, 16)).astype(np.float32)
    table.make(
        root,
        "t",
        pa.table(
            {
                "id": pa.array(np.arange(500)),
                "vector": tensor_mod.TensorArray.from_numpy(vecs),
            }
        ).to_reader(),
    )
    out = index.call(root, None, "t", "vector", vecs[3], metric="l2", maxval=3)
    assert int(np.asarray(out.column("id"))[0]) == 3
    assert float(np.asarray(out.column(index.DIST_COL))[0]) < 1e-4


def test_quint8_column_searchable_dequantized(tmp_path, rng):
    """A quantized-at-rest quint8 column searches over its DEQUANTIZED
    fp32 form: exact match against a numpy oracle on the dequantized
    matrix, and __DISTANCE__ comes back float, not uint8 codes."""
    import pyarrow as pa

    from fenix_tpu import index
    from fenix_tpu.io import table
    from fenix_tpu.types import quint8 as quint8_mod

    root = str(tmp_path)
    vecs = rng.standard_normal((400, 8)).astype(np.float32)
    arr = quint8_mod.QUInt8TensorArray.from_numpy(vecs)
    scale, shift = arr.type.scale, arr.type.shift
    deq = (
        np.asarray(arr.storage.values).reshape(400, 8).astype(np.float32) - shift
    ) * scale

    table.make(
        root,
        "t",
        pa.table({"id": pa.array(np.arange(400)), "vector": arr}).to_reader(),
    )
    q = deq[7]
    out = index.call(root, None, "t", "vector", q, metric="l2", maxval=4)
    oracle = np.argsort(((deq - q) ** 2).sum(1), kind="stable")[:4]
    assert np.asarray(out.column("id")).tolist() == oracle.tolist()
    dists = np.asarray(out.column(index.DIST_COL))
    assert dists.dtype == np.float32 and dists[0] < 1e-5
