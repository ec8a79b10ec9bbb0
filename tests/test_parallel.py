"""Sharded search on the 8-device virtual CPU mesh (SURVEY.md §4:
multi-host tests runnable without a pod)."""

import jax
import numpy as np
import pytest

from fenix_tpu.ops import kmeans
from fenix_tpu.parallel import mesh as mesh_mod
from fenix_tpu.parallel import search as psearch
from tests import oracles


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return mesh_mod.make_mesh(8, model_parallel=2)


@pytest.mark.parametrize("metric", ["l2", "cosine", "dot"])
def test_sharded_search_matches_single_device(mesh8, rng, metric):
    n, d, q, k = 3000, 32, 4, 10
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)

    corpus_dev, mask_dev = psearch.shard_corpus(mesh8, corpus, block=128)
    fn = psearch.build_sharded_search(mesh8, k=k, metric=metric, block=128)
    dist, ids = fn(corpus_dev, jax.numpy.asarray(queries), mask_dev)

    want_d, want_i = oracles.topk(oracles.distance(queries, corpus, metric), k)
    np.testing.assert_array_equal(np.asarray(ids), want_i)
    np.testing.assert_allclose(np.asarray(dist), want_d, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("metric", ["l2", "cosine", "dot"])
def test_dim_sharded_search_matches_oracle(mesh8, rng, metric):
    """D-axis contraction sharded over MODEL with psum'd partials
    (SURVEY §5 "optionally the dimension axis"): exact results, tie
    contract included, against the float oracle."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fenix_tpu.ops import topk2
    from fenix_tpu.parallel.mesh import MODEL_AXIS

    n, d, q, k = 3000, 32, 8, 10  # d divisible by the model axis (2)
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    corpus[777] = corpus[13]  # tie spanning data shards
    queries = rng.standard_normal((q, d)).astype(np.float32)

    corpus_dev, mask_dev = psearch.shard_corpus_dim(mesh8, corpus, block=128)
    n_pad = corpus_dev.shape[0]
    full = np.zeros((n_pad, d), np.float32)
    full[:n] = corpus
    mask = np.zeros(n_pad, bool)
    mask[:n] = True
    # aux is a full-D per-row reduction — computed BEFORE placement
    aux_mul, aux_add = topk2.prepare_aux(jnp.asarray(full), jnp.asarray(mask), metric)
    aux_mul = jax.device_put(np.asarray(aux_mul), NamedSharding(mesh8, P("data")))
    aux_add = jax.device_put(np.asarray(aux_add), NamedSharding(mesh8, P("data")))

    qp = np.asarray(topk2.prepare_queries(jnp.asarray(queries), metric))
    qp_dev = jax.device_put(qp, NamedSharding(mesh8, P(None, MODEL_AXIS)))
    q_sq = jnp.asarray((queries.astype(np.float64) ** 2).sum(1).astype(np.float32))

    fn = psearch.build_dim_sharded_search(mesh8, k=k, metric=metric)
    dist, ids = topk2.unpack_result(
        np.asarray(fn(corpus_dev, qp_dev, aux_mul, aux_add, q_sq))
    )

    want_d, want_i = oracles.topk(oracles.distance(queries, corpus, metric), k)
    np.testing.assert_array_equal(ids, want_i)
    np.testing.assert_allclose(dist, want_d, rtol=1e-4, atol=1e-5)


def test_sharded_search_respects_mask(mesh8, rng):
    n, d, k = 1000, 16, 8
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((2, d)).astype(np.float32)
    user_mask = rng.random(n) < 0.2

    corpus_dev, mask_dev = psearch.shard_corpus(mesh8, corpus, user_mask, block=128)
    fn = psearch.build_sharded_search(mesh8, k=k, metric="l2", block=128)
    _, ids = fn(corpus_dev, jax.numpy.asarray(queries), mask_dev)

    allowed = set(np.flatnonzero(user_mask).tolist())
    for row in np.asarray(ids):
        for i in row:
            assert i == -1 or int(i) in allowed


def test_sharded_lloyd_step_matches_local(mesh8, rng):
    n_books, k, d, b = 2, 8, 16, 128
    q = rng.standard_normal((n_books, k, d)).astype(np.float32)
    v = rng.standard_normal((n_books, b, d)).astype(np.float32)

    step = kmeans.sharded_lloyd_step(mesh8, mesh_mod.DATA_AXIS, mesh_mod.MODEL_AXIS, "l2")
    got = np.asarray(step(jax.numpy.asarray(q), jax.numpy.asarray(v)))
    want = np.stack([oracles.lloyd_step(q[j], v[j], "l2") for j in range(n_books)])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sharded_probed_search(mesh8, rng):
    """IVF probe masks apply per shard; merged result equals the
    single-device probed oracle."""
    from fenix_tpu.parallel.mesh import row_sharding

    n, d, k, n_cells, probes = 2048, 16, 8, 32, 6
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    coded = rng.integers(0, n_cells, n).astype(np.int32)
    queries = rng.standard_normal((3, d)).astype(np.float32)
    cells = np.stack(
        [rng.choice(n_cells, probes, replace=False) for _ in range(3)]
    ).astype(np.int32)

    corpus_dev, mask_dev = psearch.shard_corpus(mesh8, corpus, block=64)
    # pad the coded column identically to the corpus
    n_pad = corpus_dev.shape[0]
    coded_pad = np.full(n_pad, -1, dtype=np.int32)
    coded_pad[:n] = coded
    coded_dev = jax.device_put(coded_pad, row_sharding(mesh8, 1))

    fn = psearch.build_sharded_search_probed(mesh8, k=k, metric="l2", block=64)
    dist, ids = fn(
        corpus_dev, jax.numpy.asarray(queries), mask_dev, coded_dev,
        jax.numpy.asarray(cells),
    )
    dist, ids = np.asarray(dist), np.asarray(ids)

    for qi in range(3):
        keep = np.isin(coded, cells[qi])
        cand = np.flatnonzero(keep)
        want_d, want_i = oracles.topk(
            oracles.distance(queries[qi : qi + 1], corpus[keep], "l2"), k
        )
        valid = ids[qi] >= 0
        assert valid.sum() == min(k, keep.sum())
        np.testing.assert_array_equal(ids[qi][valid], cand[want_i[0][: valid.sum()]])


def test_sharded_search_with_precomputed_aux_matches(rng, mesh8):
    """with_aux variant (serving path, no per-call aux pass) must equal
    the inline-aux builder."""
    n, d, k = 1024, 16, 7
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((4, d)).astype(np.float32)
    import jax.numpy as jnp

    corpus_dev, mask_dev = psearch.shard_corpus(mesh8, corpus, block=128)
    fn_inline = psearch.build_sharded_search(mesh8, k=k, metric="l2", block=128)
    d1, i1 = fn_inline(corpus_dev, jnp.asarray(queries), mask_dev)

    aux_mul, aux_add = psearch.shard_aux(corpus_dev, mask_dev, "l2")
    fn_aux = psearch.build_sharded_search(mesh8, k=k, metric="l2", with_aux=True)
    d2, i2 = fn_aux(corpus_dev, jnp.asarray(queries), mask_dev, aux_mul, aux_add)

    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6)


@pytest.mark.parametrize("precision", ["bf16", "int8"])
def test_sharded_search_precision_scan_modes(mesh8, rng, precision):
    """Sharded search with half/quarter-traffic scan copies: distances
    stay fp32-exact (per-shard rescore against the fp32 shard), recall
    near-perfect — the single-chip precision contract, per shard."""
    n, d, q, k = 3000, 32, 4, 10
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)

    corpus_dev, mask_dev = psearch.shard_corpus(mesh8, corpus, block=128)
    if precision == "int8":
        scan_args = psearch.shard_scan_int8(corpus_dev)
    else:
        scan_args = (psearch.shard_scan_bf16(corpus_dev),)
    for a in scan_args:
        assert a.sharding == corpus_dev.sharding or a.ndim == 1

    fn = psearch.build_sharded_search(mesh8, k=k, metric="l2", precision=precision)
    dist, ids = fn(corpus_dev, jax.numpy.asarray(queries), mask_dev, *scan_args)

    exact = oracles.distance(queries, corpus, "l2")
    _, want_i = oracles.topk(exact, k)
    got = np.asarray(ids)
    recall = np.mean(
        [len(set(got[i].tolist()) & set(want_i[i].tolist())) / k for i in range(q)]
    )
    assert recall >= 0.95
    for i in range(q):
        np.testing.assert_allclose(
            np.asarray(dist)[i], exact[i][got[i]], rtol=1e-4, atol=1e-5
        )


def test_train_sharded_quality_and_determinism(mesh8, rng):
    """Mesh-sharded training (psum'd Lloyd statistics, per-shard
    sampling): deterministic per seed, finite, and quantizes the data
    about as well as the single-device fused train."""
    import jax.numpy as jnp

    from fenix_tpu.ops import kmeans
    from fenix_tpu.parallel.search import shard_corpus

    n, d = 4096, 16
    data = rng.standard_normal((n, d)).astype(np.float32)
    data[2048:] += 5.0  # two obvious clusters
    corpus_dev, _ = shard_corpus(mesh8, data, block=128)
    kw = dict(
        num_codebooks=2, codebook_size=4, batch_size=256, num_epochs=3, metric="l2"
    )

    cb1 = np.asarray(kmeans.train_sharded(mesh8, corpus_dev, n, np.uint32(7), **kw))
    cb2 = np.asarray(kmeans.train_sharded(mesh8, corpus_dev, n, np.uint32(7), **kw))
    assert cb1.shape == (2, 4, d) and np.isfinite(cb1).all()
    np.testing.assert_array_equal(cb1, cb2)

    single = np.asarray(kmeans.train(jnp.asarray(data), np.uint32(7), **kw))

    def quantization_error(cb: np.ndarray) -> float:
        total = 0.0
        for j in range(cb.shape[0]):
            dist = ((data[:, None, :] - cb[j][None]) ** 2).sum(-1)
            total += float(dist.min(axis=1).mean())
        return total

    assert quantization_error(cb1) < 1.5 * quantization_error(single) + 1e-6
