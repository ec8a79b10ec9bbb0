"""Shuffle wired into the product (VERDICT r1 missing #3): the
``repartition`` action hash-partitions a catalog table across shard
tables via the device all_to_all shuffle (mesh path) or the native host
scatter, and the serving path transparently resolves the original name
to the shard list — search results must be IDENTICAL before and after.
"""

import numpy as np
import pyarrow as pa
import pytest

import fenix_tpu
from fenix_tpu import expr
from fenix_tpu.engine import executor as ex
from fenix_tpu.io import ingest, table
from fenix_tpu.parallel import distributed

ROWS, DIM = 2_000, 16


def make_table(root, rng):
    vecs = rng.standard_normal((ROWS, DIM)).astype(np.float32)
    table.make(
        root,
        "t",
        pa.table(
            {
                "id": pa.array(np.arange(ROWS)),
                "tag": pa.array((np.arange(ROWS) % 5).astype(np.int64)),
                "vector": ingest.numpy_to_fixed_size_list(vecs, pa.float32()),
            }
        ).to_reader(),
    )
    return vecs


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    root = str(tmp_path_factory.mktemp("repart_root"))
    server = fenix_tpu.Server(root, host="127.0.0.1", port=port)
    import threading

    t = threading.Thread(target=server.serve, daemon=True)
    t.start()
    yield root, port
    server.shutdown()


def test_repartition_device_path_search_identical(server, rng):
    root, port = server
    vecs = make_table(root, rng)
    client = fenix_tpu.Flight(host="127.0.0.1", port=port)

    q = vecs[42] + 0.01 * rng.standard_normal(DIM).astype(np.float32)
    before = client.search(q, "t", "vector", metric="l2", maxval=7)

    manifest = client.repartition("t")  # defaults to the mesh size
    import jax

    assert manifest["num_shards"] == jax.device_count()
    # shards exist, original is retired, name resolves
    resolved = distributed.resolve_source(root, "t")
    assert isinstance(resolved, list) and len(resolved) == manifest["num_shards"]
    all_ids = np.concatenate(
        [np.asarray(table.load(root, s).column("id")) for s in resolved]
    )
    assert sorted(all_ids.tolist()) == list(range(ROWS))

    after = client.search(q, "t", "vector", metric="l2", maxval=7)
    assert after.column("id").to_pylist() == before.column("id").to_pylist()
    np.testing.assert_allclose(
        np.asarray(after.column(ex.DIST_COL)),
        np.asarray(before.column(ex.DIST_COL)),
        atol=1e-5,
    )

    # filtered search resolves too (filter evaluates per shard)
    filt = expr.field("tag") == 2
    out = client.search(q, "t", "vector", metric="l2", maxval=5, filter=filt)
    assert all(t == 2 for t in out.column("tag").to_pylist())

    # reads resolve: every row comes back (shard-concatenated order)
    rt = client.read_table("t").read_all()
    assert rt.num_rows == ROWS
    assert sorted(np.asarray(rt.column("id")).tolist()) == list(range(ROWS))


def test_repartition_probed_and_mutation_guard(server, rng):
    root, port = server
    client = fenix_tpu.Flight(host="127.0.0.1", port=port)
    # table already repartitioned by the previous test; build an index
    # over the resolved shard list through the wire
    client.make_index(
        "ivf", "t", "vector",
        {"metric": "l2", "codebook_size": 4, "num_codebooks": 2,
         "batch_size": 256, "num_epochs": 1},
    )
    q = rng.standard_normal(DIM).astype(np.float32)
    out = client.search(q, "t", "vector", metric="l2", maxval=5,
                        coding="ivf", probes=4)
    assert out.num_rows <= 5

    # appends to a sharded name fail loudly
    extra = pa.table(
        {
            "id": pa.array(np.arange(ROWS, ROWS + 4)),
            "tag": pa.array(np.zeros(4, np.int64)),
            "vector": ingest.numpy_to_fixed_size_list(
                rng.standard_normal((4, DIM)).astype(np.float32), pa.float32()
            ),
        }
    )
    with pytest.raises(Exception, match="repartitioned"):
        client.append_table("t", extra.to_reader())

    # delete-rows fans out across shards and sums
    deleted = client.delete_rows("t", expr.field("id") >= ROWS - 100)
    assert deleted == 100

    # drop-table removes shards + manifest
    client.drop_table("t")
    assert distributed.load_manifest(root, "t") is None
    assert [*table.list(root)] == []


def test_repartition_host_path_matches_device_hash(tmp_path, rng):
    """Host-path repartition (no mesh / shard count != mesh size)
    places every row on the shard the engine hash owns."""
    from fenix_tpu import native

    root = str(tmp_path)
    make_table(root, rng)
    manifest = distributed.repartition(root, "t", 3, mesh=None)
    for s in range(3):
        ids = np.asarray(table.load(root, manifest.shard_name(s)).column("id"))
        parts, _ = native.hash_partition(ids.astype(np.int64), 3)
        assert (parts == s).all()
