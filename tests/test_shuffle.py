"""Distributed shuffle on the virtual 8-device mesh."""

import jax
import numpy as np
import pytest

from fenix_tpu import native
from fenix_tpu.parallel import mesh as mesh_mod
from fenix_tpu.parallel import shuffle
from fenix_tpu.parallel.mesh import row_sharding


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return mesh_mod.make_mesh(8, model_parallel=2)


@pytest.mark.parametrize("chunks", [1, 4], ids=["single", "double-buffered"])
def test_shuffle_routes_all_rows(mesh8, rng, chunks):
    n, d, cap = 8 * 256, 8, 256
    rows = rng.standard_normal((n, d)).astype(np.float32)
    keys = rng.integers(0, 1 << 30, n).astype(np.int64)

    rows_dev = jax.device_put(rows, row_sharding(mesh8, 2))
    keys_dev = jax.device_put(keys.astype(np.int32), row_sharding(mesh8, 1))

    fn = shuffle.build_shuffle(mesh8, capacity=cap, row_shape=(d,), chunks=chunks)
    recv_rows, recv_keys, valid, overflow = fn(rows_dev, keys_dev)

    assert not np.asarray(overflow).any()

    # reconstruct: every row must appear exactly once on its owner shard
    parts, _ = native.hash_partition(keys, 8)
    recv_rows = np.asarray(recv_rows)
    recv_keys = np.asarray(recv_keys)
    valid = np.asarray(valid)

    per_shard = recv_keys.reshape(8, -1)
    per_valid = valid.reshape(8, -1)
    per_rows = recv_rows.reshape(8, -1, d)

    key32 = keys.astype(np.int32)
    seen = 0
    for s in range(8):
        got = set(map(int, per_shard[s][per_valid[s]]))
        want = set(map(int, key32[parts == s]))
        assert got == want, f"shard {s}"
        seen += per_valid[s].sum()
        # row payloads arrive with their keys
        lookup = {int(k): rows[i] for i, k in enumerate(key32)}
        for k, r in zip(per_shard[s][per_valid[s]], per_rows[s][per_valid[s]]):
            np.testing.assert_array_equal(r, lookup[int(k)])
    assert seen == n


def test_shuffle_chunked_bitwise_matches_single(mesh8, rng):
    """Double-buffered exchange reassembles to the EXACT layout of the
    single all_to_all — same recv positions, keys, and validity."""
    n, d, cap = 8 * 128, 4, 128
    rows = rng.standard_normal((n, d)).astype(np.float32)
    keys = rng.integers(0, 1 << 30, n).astype(np.int32)
    rows_dev = jax.device_put(rows, row_sharding(mesh8, 2))
    keys_dev = jax.device_put(keys, row_sharding(mesh8, 1))

    one = shuffle.build_shuffle(mesh8, capacity=cap, row_shape=(d,))(rows_dev, keys_dev)
    four = shuffle.build_shuffle(mesh8, capacity=cap, row_shape=(d,), chunks=4)(
        rows_dev, keys_dev
    )
    for a, b in zip(one, four):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_shuffle_overflow_detected(mesh8, rng):
    n, d, cap = 8 * 64, 4, 8  # tiny capacity → guaranteed overflow
    rows = rng.standard_normal((n, d)).astype(np.float32)
    keys = np.zeros(n, dtype=np.int32)  # all rows to one shard

    rows_dev = jax.device_put(rows, row_sharding(mesh8, 2))
    keys_dev = jax.device_put(keys, row_sharding(mesh8, 1))

    fn = shuffle.build_shuffle(mesh8, capacity=cap, row_shape=(d,))
    _, _, _, overflow = fn(rows_dev, keys_dev)
    assert np.asarray(overflow).any()


def test_estimate_capacity(rng):
    keys = rng.integers(0, 1 << 30, 10_000).astype(np.int64)
    cap = shuffle.estimate_capacity(keys[:1000], 8, rows_per_shard=1024)
    assert 1024 / 8 <= cap <= 1024
    # skewed keys → larger capacity
    skewed = np.zeros(1000, dtype=np.int64)
    cap_skew = shuffle.estimate_capacity(skewed, 8, rows_per_shard=1024)
    assert cap_skew == 1024


def test_shard_table_and_manifest(tmp_path, rng):
    import pyarrow as pa

    from fenix_tpu.io import ingest, table
    from fenix_tpu.parallel import distributed

    root = str(tmp_path)
    n = 1000
    vecs = rng.standard_normal((n, 8)).astype(np.float32)
    table.make(root, "t", pa.table({
        "id": pa.array(np.arange(n)),
        "vector": ingest.numpy_to_fixed_size_list(vecs, pa.float32()),
    }).to_reader())

    manifest = distributed.shard_table(root, "t", num_shards=4)
    assert manifest.num_shards == 4

    total = 0
    seen_ids = []
    for s in range(4):
        part = table.load(root, manifest.shard_name(s))
        ids = np.asarray(part.column("id"))
        parts, _ = native.hash_partition(ids.astype(np.int64), 4)
        assert (parts == s).all()  # every row on its owning shard
        total += len(ids)
        seen_ids.append(ids)
    assert total == n
    assert set(np.concatenate(seen_ids).tolist()) == set(range(n))

    # round-trip manifest
    m2 = distributed.ShardManifest.from_json(manifest.to_json())
    assert m2 == manifest
    assert m2.local_shards(0, 2) == [0, 2]
    assert m2.local_shards(1, 2) == [1, 3]
