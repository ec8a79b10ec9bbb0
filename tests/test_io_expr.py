"""Storage layer + predicate expression tests."""

import numpy as np
import pyarrow as pa
import pytest

from fenix_tpu import expr
from fenix_tpu.io import arrow, ingest, table


def make_table(rows: int = 100, dim: int = 8, seed: int = 0) -> pa.Table:
    rng = np.random.default_rng(seed)
    vec = rng.standard_normal((rows, dim)).astype(np.float32)
    return pa.table(
        {
            "id": pa.array(np.arange(rows)),
            "tag": pa.array(rng.integers(0, 5, rows)),
            "vector": ingest.numpy_to_fixed_size_list(vec, pa.float32()),
        }
    )


def test_arrow_roundtrip(tmp_path):
    data = make_table()
    path = str(tmp_path / "t.arrow")
    out = arrow.make(path, data.to_reader())
    assert out == data
    assert arrow.load(path) == data


def test_table_catalog(tmp_path):
    root = str(tmp_path)
    data = make_table()
    table.make(root, "ns/a", data.to_reader())
    table.make(root, "ns/b", data.to_reader())

    assert table.load(root, "ns/a") == data
    both = table.load(root, ["ns/a", "ns/b"])
    assert both.num_rows == 2 * data.num_rows
    assert sorted(table.list(root)) == ["ns/a", "ns/b"]

    table.drop(root, "ns/a")
    assert sorted(table.list(root)) == ["ns/b"]


def test_ingest_warns_on_out_of_device_range_int64(tmp_path, caplog):
    """int64 columns past the int32 device range are unjoinable on
    device (session.scalar raises at query time) — the warning must
    fire at INGEST, not first on a customer query (VERDICT r2 weak #7)."""
    import logging

    import numpy as np

    root = str(tmp_path)
    bad = pa.table({"id": pa.array(np.array([1, 2**40], np.int64))})
    good = pa.table({"id": pa.array(np.array([1, 2, 3], np.int64))})

    with caplog.at_level(logging.WARNING, logger="fenix_tpu"):
        table.make(root, "good", good.to_reader())
    assert not any("int32 range" in r.message for r in caplog.records)

    with caplog.at_level(logging.WARNING, logger="fenix_tpu"):
        table.make(root, "bad", bad.to_reader())
    assert any(
        "int32 range" in r.message and "'id'" in r.message for r in caplog.records
    )

    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="fenix_tpu"):
        table.append(root, "good", bad)
    assert any("int32 range" in r.message for r in caplog.records)


def test_table_join_axis1(tmp_path):
    data = make_table()
    extra = pa.table({"extra": pa.array(np.arange(data.num_rows))})
    joined = table.join(data, extra, axis=1)
    assert joined.column_names == [*data.column_names, "extra"]


def test_ingest_zero_copy_view():
    data = make_table(rows=10, dim=4)
    mat = ingest.fixed_size_list_to_numpy(data.column("vector"))
    assert mat.shape == (10, 4)
    np.testing.assert_array_equal(
        mat, np.asarray(data.column("vector").combine_chunks().values).reshape(10, 4)
    )


def test_ingest_padding():
    data = make_table(rows=100, dim=4)
    col = ingest.to_device_matrix(data.column("vector"), block=64)
    assert col.rows == 100
    assert col.rows_padded == 128
    assert np.asarray(col.data[100:]).sum() == 0


def test_expr_roundtrip_and_masks():
    data = make_table()
    f = (expr.field("id") >= 10) & (expr.field("tag").isin([1, 2]) | (expr.field("id") < 3))

    decoded = expr.Expr.from_json(f.to_json())
    host_mask = decoded.mask(data)

    ids = np.asarray(data.column("id"))
    tags = np.asarray(data.column("tag"))
    want = (ids >= 10) & (np.isin(tags, [1, 2]) | (ids < 3))
    np.testing.assert_array_equal(host_mask, want)

    import jax.numpy as jnp

    device_mask = np.asarray(
        decoded.device_mask({"id": jnp.asarray(ids), "tag": jnp.asarray(tags)})
    )
    np.testing.assert_array_equal(device_mask, want)

    assert decoded.fields() == {"id", "tag"}


def test_expr_to_arrow_filters_dataset():
    data = make_table()
    f = expr.field("id") < 5
    got = data.filter(f.to_arrow())
    assert got.num_rows == 5


def test_random_batch_iterator(tmp_path):
    from fenix_tpu.io import batch as batch_mod

    root = str(tmp_path)
    data = make_table(rows=103, dim=4)
    table.make(root, "t", data.to_reader())

    it = batch_mod.RandomBatchIterator(root, "t", size=10, column="vector", seed=0)
    batches = [*it]
    assert len(batches) == 10  # remainder dropped
    assert all(b.shape == (10, 4) for b in batches)

    # two epochs use different permutations
    batches2 = [*it]
    assert not all(np.array_equal(a, b) for a, b in zip(batches, batches2))


def test_prefetch_to_device(tmp_path):
    from fenix_tpu.io import batch as batch_mod

    root = str(tmp_path)
    data = make_table(rows=64, dim=4)
    table.make(root, "t", data.to_reader())

    it = batch_mod.RandomBatchIterator(root, "t", size=16, column="vector", seed=1)
    out = [*batch_mod.prefetch_to_device(iter(it))]
    assert len(out) == 4
    import jax

    assert all(isinstance(x, jax.Array) for x in out)


def test_expr_arithmetic_and_strings():
    """Arithmetic and string predicates (the reference exposed full
    pc.Expression algebra via pickle; these cover its common uses)."""
    import pyarrow as pa

    from fenix_tpu import expr

    t = pa.table(
        {
            "a": pa.array([1, 2, 3, 10, -7]),
            "b": pa.array([1, 1, 2, 5, 2]),
            "name": pa.array(["alpha", "beta", "alphabet", "Gamma", "beta2"]),
        }
    )

    cases = [
        ((expr.field("a") + expr.field("b")) > 4, [False, False, True, True, False]),
        ((expr.field("a") - 1).abs() <= 1, [True, True, False, False, False]),
        (expr.field("a") * expr.field("b") == 20, [False, False, False, False, False]),
        (expr.field("a") % 2 == 0, [False, True, False, True, False]),
        (expr.field("a").between(2, 9), [False, True, True, False, False]),
        (expr.field("name").contains("pha"), [True, False, True, False, False]),
        (expr.field("name").starts_with("beta"), [False, True, False, False, True]),
        (expr.field("name").ends_with("a"), [True, True, False, True, False]),
        ((1 + expr.field("a")) == 3, [False, True, False, False, False]),
    ]
    for e, want in cases:
        # wire round-trip then host evaluation
        got = expr.Expr.from_json(e.to_json()).mask(t)
        assert got.tolist() == want, (e, got.tolist(), want)

    # Python-mod semantics on negatives (matches device jnp.mod)
    assert (expr.field("a") % 3 == 2).mask(t).tolist() == [
        False, True, False, False, True,  # -7 % 3 == 2 in Python
    ]


def test_expr_arithmetic_device_parity():
    import jax.numpy as jnp
    import pyarrow as pa

    from fenix_tpu import expr

    t = pa.table({"a": pa.array([1, 5, -7, 12]), "b": pa.array([2, 2, 3, 5])})
    cols = {"a": jnp.asarray([1, 5, -7, 12]), "b": jnp.asarray([2, 2, 3, 5])}
    for e in [
        (expr.field("a") + expr.field("b")) % 3 == 1,
        (expr.field("a") - expr.field("b")).abs() > 2,
        (expr.field("a") * 2).between(0, 11),
    ]:
        host = e.mask(t)
        dev = np.asarray(expr.Expr.from_json(e.to_json()).device_mask(cols))
        assert host.tolist() == dev.tolist(), e


def test_append_writes_delta_parts(tmp_path):
    """Appends are O(rows appended): a part file publishes, the base is
    untouched; loads see base+parts in append order."""
    import os

    from fenix_tpu.io import table

    root = str(tmp_path)
    base = pa.table({"id": pa.array(np.arange(10_000))})
    table.make(root, "t", base.to_reader())
    base_stat = os.stat(table.path_of(root, "t")).st_mtime_ns

    table.append(root, "t", pa.table({"id": pa.array([10_000, 10_001])}))
    table.append(root, "t", pa.table({"id": pa.array([10_002])}))

    assert os.stat(table.path_of(root, "t")).st_mtime_ns == base_stat
    got = table.load(root, "t")
    assert np.asarray(got.column("id")).tolist() == [*range(10_003)]
    s1 = table.stamp(root, "t")
    table.append(root, "t", pa.table({"id": pa.array([10_003])}))
    assert table.stamp(root, "t") != s1  # cache invalidation token moves


def test_append_compaction_folds_parts(tmp_path):
    import glob
    import os

    from fenix_tpu.io import table

    root = str(tmp_path)
    table.make(root, "t", pa.table({"id": pa.array(np.arange(100))}).to_reader())
    # small base → the >25% (min 1024 rows) threshold needs volume;
    # the part-count limit (16) trips first
    for i in range(20):
        table.append(root, "t", pa.table({"id": pa.array([100 + i])}))
    parts = glob.glob(os.path.join(table.path_of(root, "t") + ".parts", "*.part"))
    assert len(parts) <= 16  # folded at least once
    got = table.load(root, "t")
    assert np.asarray(got.column("id")).tolist() == [*range(120)]

    table.compact(root, "t")
    assert not glob.glob(os.path.join(table.path_of(root, "t") + ".parts", "*.part"))
    assert table.load(root, "t").num_rows == 120


def test_compaction_crash_recovery(tmp_path):
    """Marker + old base ⇒ parts still live; marker + new base ⇒ parts
    already folded (dropped). Recovery keys on the recorded mtime."""
    import json
    import os
    import shutil

    from fenix_tpu.io import table

    root = str(tmp_path)
    table.make(root, "t", pa.table({"id": pa.array([0, 1, 2])}).to_reader())
    table.append(root, "t", pa.table({"id": pa.array([3, 4])}))
    part = os.path.join(table.path_of(root, "t") + ".parts", "00000000.part")
    assert os.path.exists(part)

    # crash BEFORE the new base landed: marker names the part, base
    # identity still matches the marker
    marker = table.path_of(root, "t") + ".compacting"
    st = os.stat(table.path_of(root, "t"))
    with open(marker, "w") as fh:
        json.dump(
            {
                "parts": ["00000000.part"],
                "base_ino": st.st_ino,
                "base_mtime_ns": st.st_mtime_ns,
            },
            fh,
        )
    got = table.load(root, "t")
    assert np.asarray(got.column("id")).tolist() == [0, 1, 2, 3, 4]
    assert not os.path.exists(marker)  # resolved
    assert os.path.exists(part)  # part survived

    # crash AFTER the new base landed: rewrite the base to the combined
    # table but leave the part + a marker pointing at the OLD identity
    old = os.stat(table.path_of(root, "t"))
    from fenix_tpu.io import arrow as arrow_io

    arrow_io.make(
        table.path_of(root, "t"),
        pa.table({"id": pa.array([0, 1, 2, 3, 4])}).to_reader(),
    )
    with open(marker, "w") as fh:
        json.dump(
            {
                "parts": ["00000000.part"],
                "base_ino": old.st_ino,
                "base_mtime_ns": old.st_mtime_ns,
            },
            fh,
        )
    got = table.load(root, "t")
    assert np.asarray(got.column("id")).tolist() == [0, 1, 2, 3, 4]  # no dupes
    assert not os.path.exists(part) and not os.path.exists(marker)

    shutil.rmtree(root)


def test_rewrite_clears_parts(tmp_path):
    import glob
    import os

    from fenix_tpu.io import table

    root = str(tmp_path)
    table.make(root, "t", pa.table({"id": pa.array([0, 1])}).to_reader())
    table.append(root, "t", pa.table({"id": pa.array([2])}))
    table.make(root, "t", pa.table({"id": pa.array([9])}).to_reader())  # overwrite
    assert not glob.glob(os.path.join(table.path_of(root, "t") + ".parts", "*.part"))
    assert np.asarray(table.load(root, "t").column("id")).tolist() == [9]
    assert [*table.list(root)] == ["t"]  # parts dir never lists as a table


def test_division_is_true_division_on_both_paths():
    """Same JSON predicate must select the same rows on host and
    device: '/' is true division (pc.divide would integer-divide)."""
    import jax.numpy as jnp

    from fenix_tpu import expr

    t = pa.table({"a": pa.array([3, 7, 0]), "b": pa.array([2, 2, 5])})
    cols = {"a": jnp.asarray([3, 7, 0]), "b": jnp.asarray([2, 2, 5])}
    e = (expr.field("a") / expr.field("b")) > 1.4
    host = e.mask(t).tolist()
    dev = np.asarray(e.device_mask(cols)).tolist()
    assert host == dev == [True, True, False]

    # zero divisor: host must not raise (float semantics, like device)
    e0 = (expr.field("b") / expr.field("a")) > 1e9
    assert e0.mask(t).tolist()[2] is np.True_ or e0.mask(t).tolist()[2] is True

    # reflected forms build (finding: __rtruediv__/__rmod__ were absent)
    assert (100 / expr.field("a") > 2).to_json()
    assert (10 % expr.field("b") == 0).to_json()


def test_dropped_table_parts_never_resurrect(tmp_path):
    """A crashed drop can strand parts; recreating the table (make or
    append-create) must not inherit them."""
    import os
    import shutil

    from fenix_tpu.io import table

    root = str(tmp_path)
    table.make(root, "t", pa.table({"id": pa.array([0, 1])}).to_reader())
    table.append(root, "t", pa.table({"id": pa.array([2])}))
    # simulate a drop that crashed after the base unlink
    os.unlink(table.path_of(root, "t"))
    assert os.path.exists(table.path_of(root, "t") + ".parts")

    table.make(root, "t", pa.table({"id": pa.array([7])}).to_reader())
    assert np.asarray(table.load(root, "t").column("id")).tolist() == [7]

    shutil.rmtree(root)
    os.makedirs(os.path.join(root))
    table.make(root, "t", pa.table({"id": pa.array([0, 1])}).to_reader())
    table.append(root, "t", pa.table({"id": pa.array([2])}))
    os.unlink(table.path_of(root, "t"))
    table.append(root, "t", pa.table({"id": pa.array([8])}))  # create path
    assert np.asarray(table.load(root, "t").column("id")).tolist() == [8]


def test_fixed_size_list_to_numpy_multichunk(rng):
    """Columns past 2^31 flat elements cannot combine_chunks — the
    multi-chunk path copies per chunk into one matrix (pinned at small
    scale; the capacity case is the 10M×768 engine benchmark)."""
    import pyarrow as pa

    from fenix_tpu.io import ingest

    m = rng.standard_normal((1000, 8)).astype(np.float32)
    ch = pa.chunked_array([
        ingest.numpy_to_fixed_size_list(m[:400], pa.float32()),
        ingest.numpy_to_fixed_size_list(m[400:], pa.float32()),
    ])
    np.testing.assert_array_equal(ingest.fixed_size_list_to_numpy(ch), m)


def test_fixed_size_list_zero_chunks():
    """A zero-chunk ChunkedArray (empty table, e.g. delete_rows removed
    every row) views as a clean [0, D] matrix — the per-chunk copy path
    added for >2^31-element columns crashed on it (round-4 review)."""
    import pyarrow as pa

    from fenix_tpu.io import ingest

    arr = pa.chunked_array([], type=pa.list_(pa.float32(), 4))
    out = ingest.fixed_size_list_to_numpy(arr)
    assert out.shape == (0, 4)
    assert out.dtype == np.float32
