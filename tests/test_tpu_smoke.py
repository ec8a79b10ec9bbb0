"""Real-TPU smoke tests (opt-in: FENIX_TESTS_TPU=1).

CPU tests cannot catch TPU-only behaviors — e.g. denormal flush
corrupting bitcast-packed integers (fixed in ops/topk2.pack_result) —
so this minimal suite re-runs the packed-transfer and executor paths
on the actual chip. Keep it small: each jit costs minutes of remote
compile in this environment."""

import os

import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    os.environ.get("FENIX_TESTS_TPU") != "1",
    reason="set FENIX_TESTS_TPU=1 to run on the real TPU",
)


@requires_tpu
def test_packed_result_survives_tpu_transfer():
    import jax
    import jax.numpy as jnp

    from fenix_tpu.ops import topk2

    dist_np = np.array([[0.5, 1.5, 1e-38]], np.float32)
    dist = jnp.asarray(dist_np)
    ids = jnp.asarray(np.array([[7, 70, 2_000_000_000]], np.int32))
    packed = jax.jit(topk2.pack_result)(dist, ids)
    d, i = topk2.unpack_result(packed)
    np.testing.assert_array_equal(i, [[7, 70, 2_000_000_000]])
    np.testing.assert_array_equal(d, dist_np)  # bit-exact fp32 round-trip


@requires_tpu
def test_executor_exact_search_on_tpu(tmp_path, rng):
    import pyarrow as pa

    from fenix_tpu.engine import executor
    from fenix_tpu.io import ingest, table

    root = str(tmp_path)
    vecs = rng.standard_normal((50_000, 64)).astype(np.float32)
    table.make(
        root,
        "t",
        pa.table(
            {
                "id": pa.array(np.arange(50_000)),
                "vector": ingest.numpy_to_fixed_size_list(vecs, pa.float32()),
            }
        ).to_reader(),
    )
    cache = executor.get_cache(root)
    q = rng.standard_normal(64).astype(np.float32)
    res = executor.execute_search(
        cache,
        executor.SearchRequest(source="t", column="vector", target=q, metric="l2", maxval=5),
    )
    want = np.argsort(np.sqrt(((vecs - q) ** 2).sum(1)), kind="stable")[:5]
    np.testing.assert_array_equal(np.asarray(res.column("id")), want)


@requires_tpu
def test_executor_distances_fp32_true_on_tpu(tmp_path, rng):
    """Returned distances must match the numpy oracle to fp32 reduction
    order — the rescore runs with Precision.HIGHEST (TPU DEFAULT would
    round matmul inputs to bf16 and show ~1e-3 relative error)."""
    import pyarrow as pa

    from fenix_tpu.engine import executor
    from fenix_tpu.io import ingest, table

    root = str(tmp_path)
    vecs = rng.standard_normal((20_000, 128)).astype(np.float32)
    table.make(
        root, "t",
        pa.table({
            "id": pa.array(np.arange(20_000)),
            "vector": ingest.numpy_to_fixed_size_list(vecs, pa.float32()),
        }).to_reader(),
    )
    cache = executor.get_cache(root)

    # Q=128 exercises the large-Q (fine-bucket, fusable-scan) path
    q = rng.standard_normal((128, 128)).astype(np.float32)
    res = executor.execute_search(
        cache,
        executor.SearchRequest(source="t", column="vector", target=q, metric="l2", maxval=5),
    )
    ids = np.asarray(res.column("id")).reshape(128, 5)
    dists = np.asarray(res.column("__DISTANCE__")).reshape(128, 5)

    full = np.sqrt(((q[:, None, :] - vecs[None, :, :]) ** 2).sum(-1))
    want = np.argsort(full, axis=1, kind="stable")[:, :5]
    np.testing.assert_array_equal(ids, want)
    np.testing.assert_allclose(
        dists, np.take_along_axis(full, ids, axis=1), rtol=2e-5, atol=2e-5
    )
