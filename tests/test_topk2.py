"""Two-phase exact top-k vs oracles; Pallas kernel in interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fenix_tpu.ops import topk2
from fenix_tpu.ops.distance import NEG_INF
from tests import oracles

METRICS = ["cosine", "dot", "inner_product", "l2", "euclidean"]


def build(rng, n, d, q):
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    return corpus, queries


@pytest.mark.parametrize("metric", METRICS)
def test_two_phase_matches_bruteforce(rng, metric):
    n, d, q, k = 4096, 32, 5, 10
    corpus, queries = build(rng, n, d, q)
    aux_mul, aux_add = topk2.prepare_aux(jnp.asarray(corpus), None, metric)

    dist, ids = topk2.topk_two_phase(
        jnp.asarray(corpus), jnp.asarray(queries), aux_mul, aux_add, k=k, metric=metric
    )

    want_d, want_i = oracles.topk(oracles.distance(queries, corpus, metric), k)
    np.testing.assert_array_equal(np.asarray(ids), want_i)
    np.testing.assert_allclose(np.asarray(dist), want_d, rtol=1e-4, atol=1e-5)


def test_two_phase_respects_mask(rng):
    n, d, k = 2048, 16, 8
    corpus, queries = build(rng, n, d, 3)
    mask = rng.random(n) < 0.2
    aux_mul, aux_add = topk2.prepare_aux(jnp.asarray(corpus), jnp.asarray(mask), "l2")

    dist, ids = topk2.topk_two_phase(
        jnp.asarray(corpus), jnp.asarray(queries), aux_mul, aux_add, k=k, metric="l2"
    )
    ids = np.asarray(ids)
    allowed = set(np.flatnonzero(mask).tolist())
    for row in ids:
        for i in row:
            assert i == -1 or int(i) in allowed

    cand = np.flatnonzero(mask)
    want_d, want_i = oracles.topk(oracles.distance(queries, corpus[mask], "l2"), k)
    np.testing.assert_array_equal(ids, cand[want_i])


def test_two_phase_large_q_chunking(rng):
    n, d, q, k = 2048, 16, 100, 5  # q not a multiple of 64 → padding path
    corpus, queries = build(rng, n, d, q)
    aux_mul, aux_add = topk2.prepare_aux(jnp.asarray(corpus), None, "cosine")

    dist, ids = topk2.topk_two_phase(
        jnp.asarray(corpus), jnp.asarray(queries), aux_mul, aux_add, k=k, metric="cosine"
    )
    want_d, want_i = oracles.topk(oracles.distance(queries, corpus, "cosine"), k)
    np.testing.assert_array_equal(np.asarray(ids), want_i)


def test_two_phase_fewer_valid_than_k(rng):
    n, d = 1024, 16
    corpus, queries = build(rng, n, d, 2)
    mask = np.zeros(n, dtype=bool)
    mask[:3] = True
    aux_mul, aux_add = topk2.prepare_aux(jnp.asarray(corpus), jnp.asarray(mask), "dot")

    dist, ids = topk2.topk_two_phase(
        jnp.asarray(corpus), jnp.asarray(queries), aux_mul, aux_add, k=10, metric="dot"
    )
    ids = np.asarray(ids)
    assert ((ids >= 0).sum(axis=1) == 3).all()
    assert np.isinf(np.asarray(dist)[ids < 0]).all()


def test_pallas_kernel_interpret_matches_xla(rng):
    from jax.experimental.pallas import tpu as pltpu

    n, d, qt = 4096, 64, 16
    corpus = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    queries = jnp.asarray(rng.standard_normal((qt, d)).astype(np.float32))
    aux_mul, aux_add = topk2.prepare_aux(corpus, None, "cosine")
    qp = topk2.prepare_queries(queries, "cosine")

    want = np.asarray(topk2.bucket_scores_xla(qp, corpus, aux_mul, aux_add))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(topk2.bucket_scores_pallas(qp, corpus, aux_mul, aux_add, 1024))

    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("q", [1, 5, 100])
def test_two_phase_probed_matches_scan(rng, q):
    n, d, k, n_cells, probes = 2048, 16, 8, 16, 4
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    coded = rng.integers(0, n_cells, n).astype(np.int32)
    cells = np.stack([rng.choice(n_cells, probes, replace=False) for _ in range(q)]).astype(np.int32)

    aux_mul, aux_add = topk2.prepare_aux(jnp.asarray(corpus), None, "l2")
    dist, ids = topk2.topk_two_phase_probed(
        jnp.asarray(corpus), jnp.asarray(queries), aux_mul, aux_add,
        jnp.asarray(coded), jnp.asarray(cells), k=k, metric="l2",
    )
    dist, ids = np.asarray(dist), np.asarray(ids)

    for qi in range(q):
        keep = np.isin(coded, cells[qi])
        cand = np.flatnonzero(keep)
        want_d, want_i = oracles.topk(
            oracles.distance(queries[qi:qi+1], corpus[keep], "l2"), k
        )
        got_valid = ids[qi] >= 0
        assert got_valid.sum() == min(k, keep.sum())
        np.testing.assert_array_equal(ids[qi][got_valid], cand[want_i[0][:got_valid.sum()]])
        np.testing.assert_allclose(dist[qi][got_valid], want_d[0][:got_valid.sum()],
                                   rtol=1e-4, atol=1e-5)


def test_two_phase_bf16_scan_high_recall(rng):
    n, d, q, k = 4096, 32, 8, 10
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    aux_mul, aux_add = topk2.prepare_aux(jnp.asarray(corpus), None, "cosine")

    dist, ids = topk2.topk_two_phase(
        jnp.asarray(corpus), jnp.asarray(queries), aux_mul, aux_add,
        k=k, metric="cosine",
        corpus_scan=jnp.asarray(corpus, dtype=jnp.bfloat16),
    )
    _, want_i = oracles.topk(oracles.distance(queries, corpus, "cosine"), k)

    # recall@k over the batch must be near-perfect; distances are fp32-exact
    recall = np.mean([
        len(set(ids[i].tolist()) & set(want_i[i].tolist())) / k for i in range(q)
    ])
    assert recall >= 0.95
    # distances of returned rows are the exact fp32 values
    got_ids = np.asarray(ids)
    exact = oracles.distance(queries, corpus, "cosine")
    for i in range(q):
        np.testing.assert_allclose(
            np.asarray(dist)[i], exact[i][got_ids[i]], rtol=1e-4, atol=1e-5
        )
