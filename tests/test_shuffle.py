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


def test_shuffle_routes_all_rows(mesh8, rng):
    n, d, cap = 8 * 256, 8, 256
    rows = rng.standard_normal((n, d)).astype(np.float32)
    keys = rng.integers(0, 1 << 30, n).astype(np.int64)

    rows_dev = jax.device_put(rows, row_sharding(mesh8, 2))
    keys_dev = jax.device_put(keys.astype(np.int32), row_sharding(mesh8, 1))

    fn = shuffle.build_shuffle(mesh8, capacity=cap, row_shape=(d,))
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
