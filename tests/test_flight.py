"""End-to-end Flight client/server tests.

Port of the reference's behavioral contract
(/root/reference/tests/test_flight.py): table round-trip via
do_put/do_get, index build schema (`__CODED_ID__:int64` appended),
search result schema (`__DISTANCE__` appended), metric aliases, remove.
Improvements per SURVEY.md §4: proper fixtures (no order-dependent
state), random free port, plus filtered-search and stats coverage the
reference lacks.
"""

import threading
from typing import Iterator

import numpy as np
import pyarrow as pa
import pytest

import fenix_tpu
from fenix_tpu import expr

VECTOR_SIZE = 64
NUM_VECTORS = 5_000
BATCH_SIZE = 500

VECTOR = pa.list_(pa.float32(), list_size=VECTOR_SIZE)
SCHEMA = pa.schema({"id": pa.int64(), "vector": VECTOR})

METRICS = ["cosine", "dot", "inner_product", "l2", "euclidean"]

CONFIG: fenix_tpu.coder.Config = {
    "metric": "l2",
    "codebook_size": 8,
    "num_codebooks": 2,
    "batch_size": 512,
    "num_epochs": 2,
}


def generate_batches(seed: int = 0) -> Iterator[pa.RecordBatch]:
    rng = np.random.default_rng(seed)
    num_rows = 0
    for _ in range(NUM_VECTORS // BATCH_SIZE):
        x = rng.standard_normal((BATCH_SIZE, VECTOR_SIZE)).astype(np.float32)
        x = x + 10 * x[0, :]  # cluster structure (reference test_flight.py:22)
        a = pa.FixedSizeListArray.from_arrays(
            pa.array(x.flatten()), list_size=VECTOR_SIZE
        )
        i = pa.array(np.arange(num_rows, num_rows + BATCH_SIZE))
        num_rows += BATCH_SIZE
        yield pa.record_batch([i, a], names=["id", "vector"])


@pytest.fixture(scope="module")
def source() -> pa.Table:
    return pa.Table.from_batches(generate_batches(), SCHEMA)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    import os

    os.environ["FENIX_ENABLE_FAULT_INJECTION"] = "1"
    root = str(tmp_path_factory.mktemp("fenix"))
    server = fenix_tpu.Server(root, host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.serve, daemon=True)
    thread.start()
    yield server
    server.shutdown()


@pytest.fixture(scope="module")
def flight(server, source) -> fenix_tpu.Flight:
    client = fenix_tpu.Flight(host="127.0.0.1", port=server.port)
    client.make_table("test/table", source.to_reader())
    client.make_index(name="test/coder", source="test/table", column="vector", config=CONFIG)
    return client


def test_make_table_roundtrip(flight, source):
    got = flight.read_table("test/table").read_all()
    assert source == got


def test_read_table_with_coding_schema(flight, source):
    got = flight.read_table("test/table", "test/coder", "vector").read_all()
    assert source == got.drop(["__CODED_ID__"])
    assert got.schema == pa.schema([*source.schema, pa.field("__CODED_ID__", pa.int64())])


def test_read_table_select_filter(flight, source):
    got = flight.read_table(
        "test/table", select=["id"], filter=expr.field("id") < 100
    ).read_all()
    assert got.column_names == ["id"]
    assert got.num_rows == 100


def test_list_actions(flight):
    assert flight.list_tables() == ["test/table"]
    assert flight.list_coders() == ["test/coder"]
    assert flight.list_indexes() == ["test/table/vector/test/coder"]
    assert flight.health() == {"status": "ok"}


@pytest.mark.parametrize("metric", METRICS)
def test_search_without_index(flight, source, metric, rng):
    result = flight.search(
        target=rng.standard_normal(VECTOR_SIZE).astype(np.float32),
        source="test/table",
        column="vector",
        metric=metric,
        maxval=10,
    )
    assert result.num_rows == 10
    assert result.schema == pa.schema(
        [*source.schema, pa.field("__DISTANCE__", VECTOR.value_type)]
    )


@pytest.mark.parametrize("metric", METRICS)
def test_search_with_index(flight, source, metric, rng):
    result = flight.search(
        target=rng.standard_normal(VECTOR_SIZE).astype(np.float32),
        source="test/table",
        column="vector",
        metric=metric,
        coding="test/coder",
        maxval=10,
        probes=16,
    )
    assert result.num_rows == 10
    assert result.schema == pa.schema(
        [
            *source.schema,
            pa.field("__CODED_ID__", pa.int64()),
            pa.field("__DISTANCE__", VECTOR.value_type),
        ]
    )


def test_search_with_filter(flight, rng):
    result = flight.search(
        target=rng.standard_normal(VECTOR_SIZE).astype(np.float32),
        source="test/table",
        column="vector",
        metric="l2",
        filter=expr.field("id") >= 4000,
        maxval=10,
    )
    assert result.num_rows == 10
    assert (np.asarray(result.column("id")) >= 4000).all()


def test_search_exactness_vs_oracle(flight, source, rng):
    from tests import oracles

    target = rng.standard_normal(VECTOR_SIZE).astype(np.float32)
    result = flight.search(
        target=target, source="test/table", column="vector", metric="l2", maxval=10
    )
    vectors = np.asarray(source.column("vector").combine_chunks().values).reshape(
        -1, VECTOR_SIZE
    )
    _, want = oracles.topk(oracles.distance(target[None], vectors, "l2"), 10)
    np.testing.assert_array_equal(np.asarray(result.column("id")), want[0])


def test_stats_counts_queries(flight):
    stats = flight.stats()
    assert stats["search.count"] >= 1
    assert stats["put.count"] >= 1
    # HBM capacity observability: warmed searches leave the corpus
    # matrix (+ aux) resident — at least rows × dim × 4 bytes
    assert stats["cache.device_bytes"] > 0


def test_fault_injection_and_retry(server, flight, rng):
    """Arm a one-shot search fault; a retrying client succeeds."""
    import pyarrow.flight as fl

    client = fenix_tpu.Flight(host="127.0.0.1", port=server.port, retries=2)
    client._action("fault-inject", {"spec": "search:1"})

    target = rng.standard_normal(VECTOR_SIZE).astype(np.float32)
    result = client.search(
        target=target, source="test/table", column="vector", metric="l2", maxval=5
    )
    assert result.num_rows == 5

    # without retries the armed fault surfaces
    client._action("fault-inject", {"spec": "search:1"})
    bare = fenix_tpu.Flight(host="127.0.0.1", port=server.port)
    with pytest.raises(fl.FlightError):
        bare.search(target=target, source="test/table", column="vector", metric="l2", maxval=5)
    client._action("fault-inject", {"spec": ""})


def test_query_log_replay(server, flight, rng, tmp_path, monkeypatch):
    """Recorded queries replay with identical result digests."""
    import os

    from fenix_tpu.utils import replay

    log = str(tmp_path / "queries.jsonl")
    monkeypatch.setenv(replay.LOG_ENV, log)

    target = rng.standard_normal(VECTOR_SIZE).astype(np.float32)
    for metric in ("l2", "cosine"):
        flight.search(target=target, source="test/table", column="vector", metric=metric, maxval=7)

    assert os.path.exists(log)
    stats = replay.replay(log, server.root)
    assert stats == {"total": 2, "matched": 2, "mismatched": 0}


def test_torch_tensor_target_client_compat(flight, source, rng):
    """Reference clients pass torch tensors (flight.py:273-275); the
    client SDK accepts anything numpy-convertible."""
    torch = pytest.importorskip("torch")
    target = torch.randn(VECTOR_SIZE)
    result = flight.search(
        target=target, source="test/table", column="vector", metric="l2", maxval=5
    )
    assert result.num_rows == 5


def test_concurrent_searches(flight, server, rng):
    """The Flight thread pool serves concurrent queries against a
    shared device cache (reference's session-state races are designed
    out; this guards the cache-fill path)."""
    import concurrent.futures

    targets = rng.standard_normal((8, VECTOR_SIZE)).astype(np.float32)

    def one(i):
        c = fenix_tpu.Flight(host="127.0.0.1", port=server.port)
        r = c.search(targets[i], "test/table", "vector", metric="l2", maxval=5)
        return np.asarray(r.column("id")).tolist()

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as pool:
        results = [*pool.map(one, range(8))]

    from tests import oracles

    vectors = np.asarray(
        flight.read_table("test/table").read_all().column("vector").combine_chunks().values
    ).reshape(-1, VECTOR_SIZE)
    for i, ids in enumerate(results):
        _, want = oracles.topk(oracles.distance(targets[i : i + 1], vectors, "l2"), 5)
        assert ids == want[0].tolist()


def test_read_table_order_by(flight):
    got = flight.read_table(
        "test/table", select=["id"], order_by=[("id", "descending")]
    ).read_all()
    ids = np.asarray(got.column("id"))
    assert ids[0] == NUM_VECTORS - 1
    assert (np.diff(ids) < 0).all()


def test_list_flights_and_info(flight, source):
    """Catalog discovery via standard Flight APIs (unimplemented in the
    reference, flight.py:24-32)."""
    infos = [*flight.conn.list_flights()]
    names = [i.descriptor.path[0].decode() for i in infos]
    assert "test/table" in names

    info = flight.conn.get_flight_info(
        __import__("pyarrow.flight", fromlist=["x"]).FlightDescriptor.for_path("test/table")
    )
    assert info.total_records == source.num_rows
    assert info.schema == source.schema


def test_append_delete_and_overwrite_lifecycle(server, flight, rng):
    """Incremental ingest: append extends indexes by scoring only the
    new rows; delete-rows filters table + indexes by one mask; overwrite
    drops stale indexes (they are no longer row-aligned)."""
    src = pa.Table.from_batches(generate_batches(seed=7), SCHEMA)
    flight.make_table("test/mut", src.to_reader())
    flight.make_index(
        name="test/mutcoder", source="test/mut", column="vector", config=CONFIG
    )

    # -- append: new rows searchable, index extended incrementally -----
    x = rng.standard_normal((BATCH_SIZE, VECTOR_SIZE)).astype(np.float32) + 100.0
    ids = np.arange(NUM_VECTORS, NUM_VECTORS + BATCH_SIZE)
    extra = pa.record_batch(
        [
            pa.array(ids),
            pa.FixedSizeListArray.from_arrays(
                pa.array(x.flatten()), list_size=VECTOR_SIZE
            ),
        ],
        names=["id", "vector"],
    )
    flight.append_table(
        "test/mut", pa.RecordBatchReader.from_batches(SCHEMA, iter([extra]))
    )

    total = NUM_VECTORS + BATCH_SIZE
    assert flight.read_table("test/mut").read_all().num_rows == total

    coded = flight.read_table(
        "test/mut", coding="test/mutcoder", column="vector"
    ).read_all()
    assert coded.num_rows == total
    incremental = np.asarray(coded.column("__CODED_ID__"))

    # appended vector is its own exact nearest neighbor
    hit = flight.search(
        target=x[3], source="test/mut", column="vector", metric="l2", maxval=1
    )
    assert np.asarray(hit.column("id"))[0] == ids[3]

    # incremental assignment must equal a full re-assignment
    flight.sync_index(name="test/mutcoder", source="test/mut", column="vector")
    full = np.asarray(
        flight.read_table("test/mut", coding="test/mutcoder", column="vector")
        .read_all()
        .column("__CODED_ID__")
    )
    assert (incremental == full).all()

    # schema mismatch is rejected
    bad = pa.record_batch([pa.array([1.5])], names=["id"])
    with pytest.raises(Exception, match="schema mismatch"):
        flight.append_table(
            "test/mut",
            pa.RecordBatchReader.from_batches(bad.schema, iter([bad])),
        )

    # -- delete-rows: same mask filters table and indexes --------------
    deleted = flight.delete_rows("test/mut", expr.field("id") < 100)
    assert deleted == 100
    remaining = flight.read_table("test/mut").read_all()
    assert remaining.num_rows == total - 100
    assert (np.asarray(remaining.column("id")) >= 100).all()

    kept = np.asarray(
        flight.read_table("test/mut", coding="test/mutcoder", column="vector")
        .read_all()
        .column("__CODED_ID__")
    )
    assert (kept == full[100:]).all()

    # probed search still works and never returns a deleted row
    probed = flight.search(
        target=x[3],
        source="test/mut",
        column="vector",
        metric="l2",
        coding="test/mutcoder",
        maxval=10,
        probes=16,
    )
    assert (np.asarray(probed.column("id")) >= 100).all()

    # -- explicit compaction folds the append's delta part --------------
    import glob as _glob

    from fenix_tpu.io import table as table_mod

    flight.append_table(
        "test/mut", pa.RecordBatchReader.from_batches(SCHEMA, iter([extra]))
    )
    flight.delete_rows("test/mut", expr.field("id") >= NUM_VECTORS)
    flight.append_table(
        "test/mut", pa.RecordBatchReader.from_batches(SCHEMA, iter([extra]))
    )
    parts_glob = table_mod.path_of(server.root, "test/mut") + ".parts/*.part"
    assert _glob.glob(parts_glob)  # the append left a delta part
    flight.compact_table("test/mut")
    assert not _glob.glob(parts_glob)
    after = flight.read_table("test/mut").read_all()
    assert after.num_rows == total - 100
    flight.delete_rows("test/mut", expr.field("id") >= NUM_VECTORS)

    # -- overwrite: stale indexes are dropped, not left lying ----------
    flight.make_table("test/mut", src.to_reader())
    assert "test/mut/vector/test/mutcoder" not in flight.list_indexes()

    flight.drop_index("test/mutcoder")
    flight.drop_table("test/mut")


def test_nested_sibling_sources_isolated(server, flight, rng):
    """Sources nest (`nest` vs `nest/sub`): mutations on the parent must
    never touch the sibling's index files (their directories overlap on
    disk: indexes/nest/...)."""
    import fenix_tpu.index as index_mod

    vecs = rng.standard_normal((256, VECTOR_SIZE)).astype(np.float32)
    data = pa.table(
        {
            "id": pa.array(np.arange(256)),
            "vector": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.flatten()), list_size=VECTOR_SIZE
            ),
        }
    )
    flight.make_table("nest", data.to_reader())
    flight.make_table("nest/sub", data.to_reader())
    flight.make_index(name="nestcoder", source="nest/sub", column="vector", config=CONFIG)
    sub_index = "nest/sub/vector/nestcoder"
    assert sub_index in flight.list_indexes()

    # overwrite + append + delete on the PARENT
    flight.make_table("nest", data.to_reader())
    flight.append_table("nest", data.slice(0, 8).to_reader())
    flight.delete_rows("nest", expr.field("id") < 4)

    # sibling's index untouched and still row-aligned
    assert sub_index in flight.list_indexes()
    coded = flight.read_table("nest/sub", coding="nestcoder", column="vector").read_all()
    assert coded.num_rows == 256

    # attribution helper itself never claims the sibling's files
    # (client and server share the process; server.root is visible)
    assert [*index_mod.indexes_for_source(server.root, "nest")] == []
    assert [*index_mod.indexes_for_source(server.root, "nest/sub")] == [
        ("nestcoder", "vector")
    ]

    flight.drop_index("nestcoder")
    flight.drop_table("nest/sub")
    flight.drop_table("nest")


def test_drop_table_removes_indexes(flight, rng):
    """drop-table must not strand index files a later same-named table
    would inherit (desynced probed search)."""
    src = pa.Table.from_batches(generate_batches(seed=9), SCHEMA)
    flight.make_table("test/orph", src.to_reader())
    flight.make_index(
        name="test/orphcoder", source="test/orph", column="vector", config=CONFIG
    )
    assert any("orphcoder" in ix for ix in flight.list_indexes())
    flight.drop_table("test/orph")
    assert not any("orphcoder" in ix for ix in flight.list_indexes())

    # recreate via APPEND (create-if-absent): must not extend leftovers
    flight.append_table("test/orph", src.slice(0, BATCH_SIZE).to_reader())
    assert not any("orphcoder" in ix for ix in flight.list_indexes())
    flight.drop_index("test/orphcoder")
    flight.drop_table("test/orph")


def test_concurrent_appends_lose_no_rows(flight, rng):
    """Appends serialize on the catalog lock: N concurrent appenders
    through the threaded gRPC server must all land."""
    import concurrent.futures

    base = pa.Table.from_batches([next(generate_batches(seed=3))], SCHEMA)
    flight.make_table("test/conc", base.to_reader())

    batches = []
    for i in range(8):  # rng is not thread-safe: build payloads up front
        x = rng.standard_normal((50, VECTOR_SIZE)).astype(np.float32)
        batches.append(
            pa.record_batch(
                [
                    pa.array(np.arange(i * 50, (i + 1) * 50) + 10_000),
                    pa.FixedSizeListArray.from_arrays(
                        pa.array(x.flatten()), list_size=VECTOR_SIZE
                    ),
                ],
                names=["id", "vector"],
            )
        )

    def append(i: int) -> None:
        client = fenix_tpu.Flight(host=flight.host, port=flight.port)
        client.append_table(
            "test/conc",
            pa.RecordBatchReader.from_batches(SCHEMA, iter([batches[i]])),
        )

    with concurrent.futures.ThreadPoolExecutor(8) as pool:
        [*pool.map(append, range(8))]

    got = flight.read_table("test/conc").read_all()
    assert got.num_rows == BATCH_SIZE + 8 * 50
    ids = np.asarray(got.column("id"))
    assert len(np.unique(ids)) == got.num_rows
    flight.drop_table("test/conc")


def test_upsert_rows(flight, rng):
    """Replace-or-insert by key: matched keys get the new vectors,
    unmatched keys append; the index follows both."""
    src = pa.Table.from_batches(generate_batches(seed=12), SCHEMA)
    flight.make_table("test/ups", src.to_reader())
    flight.make_index(
        name="test/upscoder", source="test/ups", column="vector", config=CONFIG
    )

    x = rng.standard_normal((4, VECTOR_SIZE)).astype(np.float32) + 200.0
    payload = pa.table(
        {
            "id": pa.array(np.array([10, 11, NUM_VECTORS, NUM_VECTORS + 1])),
            "vector": pa.FixedSizeListArray.from_arrays(
                pa.array(x.flatten()), list_size=VECTOR_SIZE
            ),
        }
    )
    res = flight.upsert_rows("test/ups", payload.to_reader())
    assert res == {"replaced": 2, "inserted": 2}

    got = flight.read_table("test/ups").read_all()
    assert got.num_rows == NUM_VECTORS + 2
    ids = np.asarray(got.column("id"))
    assert len(np.unique(ids)) == got.num_rows

    # replaced key now carries the NEW vector (exact nearest = itself)
    hit = flight.search(
        target=x[0], source="test/ups", column="vector", metric="l2", maxval=1
    )
    assert np.asarray(hit.column("id"))[0] == 10
    assert float(np.asarray(hit.column("__DISTANCE__"))[0]) < 1e-3

    # index stayed row-aligned and probed search sees the new rows
    probed = flight.search(
        target=x[2], source="test/ups", column="vector", metric="l2",
        coding="test/upscoder", maxval=1, probes=16,
    )
    assert np.asarray(probed.column("id"))[0] == NUM_VECTORS

    flight.drop_index("test/upscoder")
    flight.drop_table("test/ups")


def test_desynced_index_self_heals(server, flight, rng):
    """A crash between the table and index publishes leaves a row-count
    mismatch; the next coded access must resync the index instead of
    failing every probed search (engine/session._synced_index)."""
    import fenix_tpu.index as index_mod
    from fenix_tpu.io import arrow as arrow_io

    src = pa.Table.from_batches(generate_batches(seed=5), SCHEMA)
    flight.make_table("test/heal", src.to_reader())
    flight.make_index(
        name="test/healcoder", source="test/heal", column="vector", config=CONFIG
    )

    # simulate the crash window: truncate the index file by 100 rows
    path = index_mod.path_of(server.root, "test/healcoder", "test/heal", "vector")
    idx = arrow_io.load(path)
    arrow_io.make(path, idx.slice(0, idx.num_rows - 100).to_reader())

    hit = flight.search(
        target=np.asarray(src.column("vector")[3].values),
        source="test/heal",
        column="vector",
        metric="l2",
        coding="test/healcoder",
        maxval=1,
        probes=8,
    )
    assert np.asarray(hit.column("id"))[0] == 3
    assert arrow_io.load(path).num_rows == src.num_rows  # rebuilt

    flight.drop_index("test/healcoder")
    flight.drop_table("test/heal")


def test_drop_index_and_remove(server, source):
    client = fenix_tpu.Flight(host="127.0.0.1", port=server.port)
    client.drop_index("test/coder")
    assert client.list_coders() == []
    assert client.list_indexes() == []

    client.drop_table("test/table")
    assert client.list_tables() == []

    client.remove()
