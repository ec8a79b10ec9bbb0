"""Kernel-level unit tests vs numpy oracles (SURVEY.md §4 gap-fill)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fenix_tpu.ops import cells, distance, kmeans, topk2
from tests import oracles

METRICS = ["cosine", "dot", "inner_product", "l2", "euclidean"]


@pytest.mark.parametrize("metric", METRICS)
def test_pairwise_distance_matches_oracle(rng, metric):
    u = rng.standard_normal((7, 32)).astype(np.float32)
    v = rng.standard_normal((50, 32)).astype(np.float32)

    got = np.asarray(distance.pairwise_distance(jnp.asarray(u), jnp.asarray(v), metric))
    want = oracles.distance(u, v, metric)

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("metric", METRICS)
def test_topk_two_phase_matches_bruteforce(rng, metric):
    """Oracle parity for the production top-k kernel with padding rows
    masked through the aux (migrated from the removed round-1
    distance.topk_search scan)."""
    n, d, q, k = 1000, 32, 5, 10
    n_pad = 1024
    corpus = np.zeros((n_pad, d), dtype=np.float32)
    corpus[:n] = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    mask = np.zeros(n_pad, dtype=bool)
    mask[:n] = True

    aux_mul, aux_add = topk2.prepare_aux(jnp.asarray(corpus), jnp.asarray(mask), metric)
    dists, ids = topk2.topk_two_phase(
        jnp.asarray(corpus), jnp.asarray(queries), aux_mul, aux_add, k=k, metric=metric
    )
    dists, ids = np.asarray(dists), np.asarray(ids)

    want_d, want_i = oracles.topk(oracles.distance(queries, corpus[:n], metric), k)

    np.testing.assert_allclose(dists, want_d, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(ids, want_i)


@pytest.mark.parametrize("metric", ["l2", "cosine"])
def test_topk_two_phase_respects_mask(rng, metric):
    n_pad, d, k = 512, 16, 5
    corpus = rng.standard_normal((n_pad, d)).astype(np.float32)
    queries = rng.standard_normal((2, d)).astype(np.float32)
    mask = rng.random(n_pad) < 0.3

    aux_mul, aux_add = topk2.prepare_aux(jnp.asarray(corpus), jnp.asarray(mask), metric)
    dists, ids = topk2.topk_two_phase(
        jnp.asarray(corpus), jnp.asarray(queries), aux_mul, aux_add, k=k, metric=metric
    )
    ids = np.asarray(ids)

    allowed = set(np.flatnonzero(mask).tolist())
    for row in ids:
        for i in row:
            assert i == -1 or int(i) in allowed


def test_topk_two_phase_fewer_candidates_than_k(rng):
    n_pad, d = 256, 8
    corpus = rng.standard_normal((n_pad, d)).astype(np.float32)
    queries = rng.standard_normal((1, d)).astype(np.float32)
    mask = np.zeros(n_pad, dtype=bool)
    mask[:3] = True

    aux_mul, aux_add = topk2.prepare_aux(jnp.asarray(corpus), jnp.asarray(mask), "l2")
    dists, ids = topk2.topk_two_phase(
        jnp.asarray(corpus), jnp.asarray(queries), aux_mul, aux_add, k=10, metric="l2"
    )
    ids = np.asarray(ids)[0]
    assert (ids >= 0).sum() == 3
    assert np.isinf(np.asarray(dists)[0][ids < 0]).all()


@pytest.mark.parametrize("metric", METRICS)
def test_topk_two_phase_probed_oracle(rng, metric):
    n, d, k, n_cells = 1000, 16, 8, 16
    n_pad = 1024
    corpus = np.zeros((n_pad, d), dtype=np.float32)
    corpus[:n] = rng.standard_normal((n, d)).astype(np.float32)
    coded = np.full(n_pad, -1, dtype=np.int32)
    coded[:n] = rng.integers(0, n_cells, n).astype(np.int32)
    queries = rng.standard_normal((3, d)).astype(np.float32)
    cells_arr = np.stack([rng.choice(n_cells, 4, replace=False) for _ in range(3)]).astype(np.int32)
    mask = np.zeros(n_pad, dtype=bool)
    mask[:n] = True

    aux_mul, aux_add = topk2.prepare_aux(jnp.asarray(corpus), jnp.asarray(mask), metric)
    dists, ids = topk2.topk_two_phase_probed(
        jnp.asarray(corpus),
        jnp.asarray(queries),
        aux_mul,
        aux_add,
        jnp.asarray(coded),
        jnp.asarray(cells_arr),
        k=k,
        metric=metric,
    )
    dists, ids = np.asarray(dists), np.asarray(ids)

    for qi in range(3):
        keep = np.isin(coded[:n], cells_arr[qi])
        cand = np.flatnonzero(keep)
        want_d, want_i = oracles.topk(
            oracles.distance(queries[qi : qi + 1], corpus[:n][keep], metric), k
        )
        got_valid = ids[qi] >= 0
        assert got_valid.sum() == min(k, keep.sum())
        np.testing.assert_array_equal(ids[qi][got_valid], cand[want_i[0][: got_valid.sum()]])
        np.testing.assert_allclose(
            dists[qi][got_valid], want_d[0][: got_valid.sum()], rtol=1e-4, atol=1e-5
        )


@pytest.mark.parametrize("metric", ["l2", "cosine", "dot"])
def test_lloyd_step_matches_oracle(rng, metric):
    k, d, b, n_books = 8, 16, 64, 2
    q = rng.standard_normal((n_books, k, d)).astype(np.float32)
    v = rng.standard_normal((n_books, b, d)).astype(np.float32)

    got = np.asarray(kmeans.lloyd_step(jnp.asarray(q), jnp.asarray(v), metric=metric))
    want = np.stack([oracles.lloyd_step(q[j], v[j], metric) for j in range(n_books)])

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("metric", METRICS)
def test_assign_cells_matches_enumeration(rng, metric):
    n_books, k, d, rows = 3, 4, 8, 100
    codebooks = rng.standard_normal((n_books, k, d)).astype(np.float32)
    vectors = rng.standard_normal((rows, d)).astype(np.float32)

    got = np.asarray(cells.assign_cells(jnp.asarray(vectors), jnp.asarray(codebooks), metric=metric))
    want = np.argmin(oracles.cell_scores(vectors, codebooks, metric), axis=-1)

    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("metric", METRICS)
def test_topk_cells_matches_enumeration(rng, metric):
    n_books, k, d, q, m = 2, 8, 16, 4, 16
    codebooks = rng.standard_normal((n_books, k, d)).astype(np.float32)
    targets = rng.standard_normal((q, d)).astype(np.float32)

    got = np.asarray(cells.topk_cells(jnp.asarray(targets), jnp.asarray(codebooks), metric=metric, maxval=m))
    scores = oracles.cell_scores(targets, codebooks, metric)
    want = np.argsort(scores, axis=-1, kind="stable")[:, :m]

    np.testing.assert_array_equal(got, want)


def test_topk_cells_bounded_matches_dense(rng):
    n_books, k, d, q, m = 3, 8, 16, 4, 10
    codebooks = rng.standard_normal((n_books, k, d)).astype(np.float32)
    targets = rng.standard_normal((q, d)).astype(np.float32)

    dense = np.asarray(cells.topk_cells(jnp.asarray(targets), jnp.asarray(codebooks), metric="l2", maxval=m))
    bounded = np.asarray(cells.topk_cells_bounded(jnp.asarray(targets), jnp.asarray(codebooks), "l2", m))

    np.testing.assert_array_equal(dense, bounded)


@pytest.mark.parametrize("metric", ["cosine", "l2", "dot"])
def test_topk_cells_np_matches_device(rng, metric):
    """Host probe-cell ranking must equal the device topk_cells it
    replaced on the serving path (same math, same tie rule)."""
    from fenix_tpu.ops import cells as cells_ops

    q, n_books, k_book, d = 16, 2, 8, 24
    targets = rng.standard_normal((q, d)).astype(np.float32)
    books = rng.standard_normal((n_books, k_book, d)).astype(np.float32)
    for maxval in (3, 16, 64):  # 64 = all cells
        want = np.asarray(cells_ops.topk_cells(
            jnp.asarray(targets), jnp.asarray(books), metric=metric, maxval=maxval))
        got = cells_ops.topk_cells_np(targets, books, metric, maxval)
        np.testing.assert_array_equal(got, want)


def test_topk_cells_np_argpartition_path(rng):
    """Wide grids (k^n > 4096) take the argpartition branch — results
    must still match the device ranking (no exact score ties here)."""
    from fenix_tpu.ops import cells as cells_ops

    q, n_books, k_book, d = 4, 2, 72, 16  # 5184 cells
    targets = rng.standard_normal((q, d)).astype(np.float32)
    books = rng.standard_normal((n_books, k_book, d)).astype(np.float32)
    want = np.asarray(cells_ops.topk_cells(
        jnp.asarray(targets), jnp.asarray(books), metric="l2", maxval=16))
    got = cells_ops.topk_cells_np(targets, books, "l2", 16)
    np.testing.assert_array_equal(got, want)
