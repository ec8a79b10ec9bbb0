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


def test_registration_is_an_import_side_effect(tmp_path, rng):
    """A FRESH process that only imports fenix_tpu must register the
    extension types — otherwise a quint8 table read from disk is a
    plain uint8 list and the engine silently searches raw codes."""
    import subprocess
    import sys
    import textwrap

    import pyarrow as pa

    from fenix_tpu.io import table
    from fenix_tpu.types import quint8 as quint8_mod

    root = str(tmp_path)
    vecs = rng.standard_normal((300, 8)).astype(np.float32)
    arr = quint8_mod.QUInt8TensorArray.from_numpy(vecs)
    deq = arr.dequantize().reshape(300, 8)
    table.make(
        root, "t", pa.table({"id": pa.array(np.arange(300)), "vector": arr}).to_reader()
    )
    np.save(f"{root}/deq.npy", deq)

    code = textwrap.dedent(f"""
        import numpy as np
        import jax; jax.config.update("jax_platforms", "cpu")
        from fenix_tpu import index
        deq = np.load({root!r} + "/deq.npy")
        q = deq[7]
        out = index.call({root!r}, None, "t", "vector", q, metric="l2", maxval=3)
        oracle = np.argsort(((deq - q) ** 2).sum(1), kind="stable")[:3]
        ids = np.asarray(out.column("id"))
        assert ids.tolist() == oracle.tolist(), (ids, oracle)
        d = np.asarray(out.column("__DISTANCE__"))
        assert d.dtype == np.float32 and d[0] < 1e-5, d
        print("OK")
    """)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=240,
        env={
            "PYTHONPATH": "/root/repo",
            "JAX_PLATFORMS": "cpu",
            "PATH": "/usr/bin:/bin",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        },
    )
    assert out.returncode == 0 and "OK" in out.stdout, (out.stdout, out.stderr)


def test_quint8_column_full_lifecycle(tmp_path, rng):
    """Coder training, probed search, and appends (via like= params)
    all work over a quint8 column."""
    import pyarrow as pa

    from fenix_tpu import coder, index
    from fenix_tpu.io import table
    from fenix_tpu.types import quint8 as quint8_mod

    root = str(tmp_path)
    vecs = rng.standard_normal((600, 8)).astype(np.float32)
    vecs[300:] += 4.0
    arr = quint8_mod.QUInt8TensorArray.from_numpy(vecs)
    table.make(
        root, "t", pa.table({"id": pa.array(np.arange(600)), "vector": arr}).to_reader()
    )

    cfg: coder.Config = {
        "metric": "l2", "codebook_size": 2, "num_codebooks": 2,
        "batch_size": 128, "num_epochs": 1,
    }
    made = coder.make(root, "c", "t", "vector", cfg, seed=0)
    assert made["column"] == pa.list_(pa.float32(), 8)  # dequantized view
    index.make(root, "c", "t", "vector")
    out = index.call(
        root, "c", "t", "vector",
        arr.dequantize().reshape(600, 8)[5], metric="l2", maxval=3, probes=2,
    )
    assert int(np.asarray(out.column("id"))[0]) == 5

    # append with the TABLE's affine params (dynamic params would never
    # match the schema)
    extra = rng.standard_normal((32, 8)).astype(np.float32)
    table.append(
        root,
        "t",
        pa.table(
            {
                "id": pa.array(np.arange(600, 632)),
                "vector": quint8_mod.QUInt8TensorArray.from_numpy(extra, like=arr.type),
            }
        ),
    )
    assert table.load(root, "t").num_rows == 632


def test_extension_array_as_search_target(tmp_path, rng):
    """Typed Arrow arrays work as search TARGETS too (quint8 targets
    dequantize, matching column semantics)."""
    import pyarrow as pa

    from fenix_tpu import index
    from fenix_tpu.io import ingest, table
    from fenix_tpu.types import quint8 as quint8_mod
    from fenix_tpu.types import tensor as tensor_mod

    root = str(tmp_path)
    vecs = rng.standard_normal((200, 8)).astype(np.float32)
    table.make(
        root,
        "t",
        pa.table(
            {
                "id": pa.array(np.arange(200)),
                "vector": ingest.numpy_to_fixed_size_list(vecs, pa.float32()),
            }
        ).to_reader(),
    )
    t_target = tensor_mod.TensorArray.from_numpy(vecs[10:12])
    out = index.call(root, None, "t", "vector", t_target, metric="l2", maxval=1)
    assert np.asarray(out.column("id")).tolist() == [10, 11]

    q_target = quint8_mod.QUInt8TensorArray.from_numpy(vecs[33:34])
    out = index.call(root, None, "t", "vector", q_target, metric="l2", maxval=1)
    assert int(np.asarray(out.column("id"))[0]) == 33


def test_nested_projection_feeds_search(tmp_path, rng):
    """The nested-tensor pattern end-to-end: a dict-of-tensors column's
    projected leaf (to_field -> TensorArray) ingests as a searchable
    vector column."""
    import pyarrow as pa

    from fenix_tpu import index
    from fenix_tpu.io import table
    from fenix_tpu.types import nested as nested_mod

    text = rng.standard_normal((150, 8)).astype(np.float32)
    image = rng.standard_normal((150, 4)).astype(np.float32)
    col = nested_mod.NestedTensorArray.from_numpy({"text": text, "image": image})

    projected = col.to_field("text")  # TensorArray over FixedSizeList
    root = str(tmp_path)
    table.make(
        root,
        "t",
        pa.table({"id": pa.array(np.arange(150)), "vector": projected}).to_reader(),
    )
    out = index.call(root, None, "t", "vector", text[9], metric="cosine", maxval=1)
    assert int(np.asarray(out.column("id"))[0]) == 9
