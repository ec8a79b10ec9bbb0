"""Coder training + index build + search executor tests (library level,
no Flight server). Oracle: numpy brute force (tests/oracles.py)."""

import numpy as np
import pyarrow as pa
import pytest

from fenix_tpu import coder, expr, index
from fenix_tpu.engine import executor
from fenix_tpu.io import arrow, ingest, table
from tests import oracles

ROWS, DIM = 2000, 32


@pytest.fixture
def root(tmp_path, rng):
    root = str(tmp_path)
    # Clustered data so k-means has structure (reference test_flight.py:22).
    x = rng.standard_normal((ROWS, DIM)).astype(np.float32)
    x[: ROWS // 2] += 3.0
    data = pa.table(
        {
            "id": pa.array(np.arange(ROWS)),
            "tag": pa.array(rng.integers(0, 4, ROWS)),
            "vector": ingest.numpy_to_fixed_size_list(x, pa.float32()),
        }
    )
    table.make(root, "test/table", data.to_reader())
    return root


CONFIG: coder.Config = {
    "metric": "l2",
    "codebook_size": 4,
    "num_codebooks": 2,
    "batch_size": 256,
    "num_epochs": 2,
}


def corpus(root) -> np.ndarray:
    return ingest.fixed_size_list_to_numpy(table.load(root, "test/table").column("vector"))


def test_coder_lifecycle(root):
    coding = coder.make(root, "test/l2", "test/table", "vector", CONFIG, seed=0)
    assert coding["tensor"].shape == (2, 4, DIM)
    assert coding["config"] == CONFIG
    assert coding["column"] == pa.list_(pa.float32(), DIM)

    assert [*coder.list(root)] == ["test/l2"]

    loaded = coder.load(root, "test/l2")
    np.testing.assert_array_equal(loaded["tensor"], coding["tensor"])

    ranks = coder.call(np.zeros(DIM, dtype=np.float32), loaded, maxval=5)
    assert ranks.shape == (5,)
    scores = oracles.cell_scores(np.zeros((1, DIM), np.float32), loaded["tensor"], "l2")
    np.testing.assert_array_equal(ranks, np.argsort(scores[0], kind="stable")[:5])

    coder.drop(root, "test/l2")
    assert [*coder.list(root)] == []


def test_index_make_assigns_nearest_cells(root):
    coder.make(root, "test/l2", "test/table", "vector", CONFIG, seed=0)
    data = index.make(root, "test/l2", "test/table", "vector")

    assert data.column_names[-1] == index.CODE_COL
    codes = np.asarray(data.column(index.CODE_COL))

    coding = coder.load(root, "test/l2")
    scores = oracles.cell_scores(corpus(root), coding["tensor"], "l2")
    np.testing.assert_array_equal(codes, np.argmin(scores, axis=-1))

    assert [*index.list(root)] == ["test/table/vector/test/l2"]
    index.drop(root, "test/l2", "test/table", "vector")
    assert [*index.list(root)] == []


@pytest.mark.parametrize("metric", ["cosine", "dot", "inner_product", "l2", "euclidean"])
def test_exact_search_matches_oracle(root, rng, metric):
    target = rng.standard_normal(DIM).astype(np.float32)
    result = index.call(
        root, None, "test/table", "vector", target, metric=metric, maxval=10
    )

    assert result.num_rows == 10
    assert result.column_names[-1] == index.DIST_COL

    dist = oracles.distance(target[None], corpus(root), metric)
    want_d, want_i = oracles.topk(dist, 10)

    np.testing.assert_array_equal(np.asarray(result.column("id")), want_i[0])
    np.testing.assert_allclose(
        np.asarray(result.column(index.DIST_COL)), want_d[0], rtol=1e-4, atol=1e-5
    )


def test_filtered_search_pushdown(root, rng):
    target = rng.standard_normal(DIM).astype(np.float32)
    f = expr.field("tag") == 2
    result = index.call(
        root, None, "test/table", "vector", target, metric="l2", maxval=10, filter=f
    )

    assert result.num_rows == 10
    assert set(np.asarray(result.column("tag")).tolist()) == {2}

    data = table.load(root, "test/table")
    keep = np.asarray(data.column("tag")) == 2
    cand = np.flatnonzero(keep)
    dist = oracles.distance(target[None], corpus(root)[keep], "l2")
    _, want_i = oracles.topk(dist, 10)
    np.testing.assert_array_equal(np.asarray(result.column("id")), cand[want_i[0]])


def test_search_fewer_rows_than_maxval(root, rng):
    target = rng.standard_normal(DIM).astype(np.float32)
    f = expr.field("id") < 4
    result = index.call(
        root, None, "test/table", "vector", target, metric="l2", maxval=10, filter=f
    )
    assert result.num_rows == 4


def test_search_no_maxval_returns_all_with_distance(root, rng):
    target = rng.standard_normal(DIM).astype(np.float32)
    result = index.call(root, None, "test/table", "vector", target, metric="l2")
    assert result.num_rows == ROWS
    dist = oracles.distance(target[None], corpus(root), "l2")[0]
    np.testing.assert_allclose(
        np.asarray(result.column(index.DIST_COL)), dist, rtol=1e-4, atol=1e-5
    )


def test_probed_search_restricts_to_cells(root, rng):
    coder.make(root, "test/l2", "test/table", "vector", CONFIG, seed=0)
    index.make(root, "test/l2", "test/table", "vector")

    target = rng.standard_normal(DIM).astype(np.float32)
    result = index.call(
        root, "test/l2", "test/table", "vector", target, metric="l2", maxval=10, probes=4
    )

    assert result.num_rows == 10
    assert index.CODE_COL in result.column_names

    coding = coder.load(root, "test/l2")
    cells = coder.call(target, coding, maxval=4)
    assert set(np.asarray(result.column(index.CODE_COL)).tolist()) <= set(cells.tolist())

    # oracle: brute force restricted to probed cells
    scores = oracles.cell_scores(corpus(root), coding["tensor"], "l2")
    codes = np.argmin(scores, axis=-1)
    keep = np.isin(codes, cells)
    cand = np.flatnonzero(keep)
    dist = oracles.distance(target[None], corpus(root)[keep], "l2")
    _, want_i = oracles.topk(dist, 10)
    np.testing.assert_array_equal(np.asarray(result.column("id")), cand[want_i[0]])


def test_batched_search_adds_query_column(root, rng):
    targets = rng.standard_normal((3, DIM)).astype(np.float32)
    result = index.call(
        root, None, "test/table", "vector", targets, metric="cosine", maxval=5
    )
    assert result.num_rows == 15
    assert executor.QUERY_COL in result.column_names
    qids = np.asarray(result.column(executor.QUERY_COL))
    np.testing.assert_array_equal(qids, np.repeat([0, 1, 2], 5))

    for qi in range(3):
        dist = oracles.distance(targets[qi : qi + 1], corpus(root), "cosine")
        _, want_i = oracles.topk(dist, 5)
        got = np.asarray(result.filter(pa.array(qids == qi)).column("id"))
        np.testing.assert_array_equal(got, want_i[0])


def test_multi_source_search(root, rng):
    """Searches across a list of sources concatenate row spaces
    (reference table.py:18-21 multi-load semantics)."""
    extra = rng.standard_normal((500, DIM)).astype(np.float32) + 5.0
    table.make(
        root,
        "test/extra",
        pa.table(
            {
                "id": pa.array(np.arange(ROWS, ROWS + 500)),
                "tag": pa.array(rng.integers(0, 4, 500)),
                "vector": ingest.numpy_to_fixed_size_list(extra, pa.float32()),
            }
        ).to_reader(),
    )

    target = rng.standard_normal(DIM).astype(np.float32)
    result = index.call(
        root, None, ["test/table", "test/extra"], "vector", target, metric="l2", maxval=10
    )
    assert result.num_rows == 10

    both = np.concatenate([corpus(root), extra])
    dist = oracles.distance(target[None], both, "l2")
    _, want_pos = oracles.topk(dist, 10)
    all_ids = np.concatenate(
        [np.arange(ROWS), np.arange(ROWS, ROWS + 500)]
    )
    np.testing.assert_array_equal(np.asarray(result.column("id")), all_ids[want_pos[0]])


@pytest.mark.parametrize("precision", ["bf16", "int8"])
def test_quantized_scan_precision_end_to_end(root, rng, precision):
    """precision="bf16"/"int8" through the executor: high recall,
    exact fp32 distances on the returned rows."""
    from fenix_tpu.engine import executor as ex

    k = 10
    target = rng.standard_normal((4, DIM)).astype(np.float32)
    cache = ex.get_cache(root)
    out = ex.execute_search(
        cache,
        ex.SearchRequest(
            source="test/table", column="vector", target=target,
            metric="cosine", maxval=k, precision=precision,
        ),
    )
    assert out.num_rows == 4 * k

    exact = oracles.distance(target, corpus(root), "cosine")
    _, want_i = oracles.topk(exact, k)
    got_ids = np.asarray(out.column("id")).reshape(4, k)
    got_d = np.asarray(out.column(ex.DIST_COL)).reshape(4, k)
    recall = np.mean([
        len(set(got_ids[i].tolist()) & set(want_i[i].tolist())) / k for i in range(4)
    ])
    assert recall >= 0.95
    for i in range(4):
        np.testing.assert_allclose(got_d[i], exact[i][got_ids[i]], rtol=1e-4, atol=1e-5)


def test_clustered_ivf_matches_masked_scan(root, rng):
    """The clustered gather route must return EXACTLY what the
    masked-scan probed kernel returns (same exact-within-probes set,
    same deterministic tie order), including with a filter."""
    import jax.numpy as jnp

    from fenix_tpu.engine import executor as ex
    from fenix_tpu.ops import topk2

    coder.make(root, "c/l2", "test/table", "vector", CONFIG, seed=0)
    index.make(root, "c/l2", "test/table", "vector")
    # single-device cache: this test pins the CLUSTERED route, which the
    # executor only takes without a serving mesh (the 8-device test env
    # would otherwise route to the sharded probed kernel)
    from fenix_tpu.engine import session

    cache = session.DeviceCache(root, mesh=None)

    target = rng.standard_normal((4, DIM)).astype(np.float32)
    for filt in (None, expr.field("tag") == 2):
        req = ex.SearchRequest(
            source="test/table", column="vector", target=target,
            metric="l2", maxval=7, coding="c/l2", probes=6, filter=filt,
        )
        got = ex.execute_search(cache, req)  # clustered route

        # reference: masked-scan kernel on the unsorted layout
        data, corpus, _ = cache.snapshot("test/table", "vector", coding="c/l2")
        coding_data = cache.coding("c/l2")
        queries = jnp.asarray(target)
        cells = ex._rank_cells(queries, coding_data, "l2", 6)
        coded = cache.coded_ids("c/l2", "test/table", "vector")
        aux_mul, aux_add = cache.metric_aux("test/table", "vector", "l2")
        if filt is not None:
            m = np.zeros(corpus.rows_padded, bool)
            m[: corpus.rows] = filt.mask(data)
            aux_add = jnp.where(jnp.asarray(m), aux_add, float("-inf"))
        d_ref, i_ref = topk2.topk_two_phase_probed(
            corpus.data, queries, aux_mul, aux_add, coded.data, cells,
            k=8, metric="l2",
        )
        d_ref, i_ref = np.asarray(d_ref)[:, :7], np.asarray(i_ref)[:, :7]

        got_ids = np.asarray(got.column("id")).reshape(4, -1)
        got_d = np.asarray(got.column(ex.DIST_COL)).reshape(4, -1)
        for qi in range(4):
            valid = i_ref[qi] >= 0
            np.testing.assert_array_equal(got_ids[qi], i_ref[qi][valid])
            np.testing.assert_allclose(got_d[qi], d_ref[qi][valid], rtol=1e-4, atol=1e-5)


def test_multi_source_probed_clustered(root, rng):
    """Probed search over a LIST of sources goes through the clustered
    layout built on the concatenated row space; results must match the
    masked-scan kernel on the same concatenation."""
    import jax.numpy as jnp

    from fenix_tpu.engine import executor as ex
    from fenix_tpu.ops import topk2

    extra = rng.standard_normal((512, DIM)).astype(np.float32) + 3.0
    table.make(
        root, "test/extra2",
        pa.table({
            "id": pa.array(np.arange(ROWS, ROWS + 512)),
            "tag": pa.array(rng.integers(0, 4, 512)),
            "vector": ingest.numpy_to_fixed_size_list(extra, pa.float32()),
        }).to_reader(),
    )
    sources = ["test/table", "test/extra2"]
    coder.make(root, "m/l2", sources, "vector", CONFIG, seed=0)
    for s in sources:
        index.make(root, "m/l2", s, "vector")

    # single-device cache: pins the clustered route (see above)
    from fenix_tpu.engine import session

    cache = session.DeviceCache(root, mesh=None)
    target = rng.standard_normal((2, DIM)).astype(np.float32)
    req = ex.SearchRequest(source=sources, column="vector", target=target,
                           metric="l2", maxval=6, coding="m/l2", probes=5)
    got = ex.execute_search(cache, req)
    assert got.num_rows == 12

    data, corpus_dc, _ = cache.snapshot(sources, "vector", coding="m/l2")
    coding_data = cache.coding("m/l2")
    cells = ex._rank_cells(target, coding_data, "l2", 5)
    coded = cache.coded_ids("m/l2", sources, "vector")
    am, aa = cache.metric_aux(sources, "vector", "l2")
    d_ref, i_ref = topk2.topk_two_phase_probed(
        corpus_dc.data, jnp.asarray(target), am, aa, coded.data,
        jnp.asarray(cells), k=8, metric="l2",
    )
    i_ref = np.asarray(i_ref)[:, :6]
    got_pos = np.asarray(got.column("__QUERY_ID__"))
    all_ids = np.asarray(data.column("id"))
    for qi in range(2):
        rows_q = np.asarray(got.column("id"))[got_pos == qi]
        want = all_ids[i_ref[qi][i_ref[qi] >= 0]]
        np.testing.assert_array_equal(rows_q, want)


# -- streaming training (host corpus, VERDICT r4: coder past HBM) ---------


def test_train_streaming_matches_per_step_oracle(rng):
    """train_streaming's math is IDENTICAL to a hand-rolled loop of
    per-step Lloyd updates over the same host permutation — chunking
    and double-buffering must not change the update sequence."""
    import jax.numpy as jnp

    from fenix_tpu.ops import kmeans

    n, d, books, k, b, epochs, seed = 2048, 8, 2, 4, 64, 2, 7
    matrix = rng.standard_normal((n, d)).astype(np.float32)

    got = np.asarray(
        kmeans.train_streaming(
            matrix, seed, num_codebooks=books, codebook_size=k,
            batch_size=b, num_epochs=epochs, metric="l2",
            chunk_rows=384,  # forces several ragged chunks per epoch
        )
    )

    oracle_rng = np.random.default_rng(seed)
    init = oracle_rng.choice(n, k * books, replace=False)
    cbs = jnp.asarray(matrix[init].reshape(books, k, d))
    rows_per_step = books * b
    steps = n // rows_per_step
    for _ in range(epochs):
        perm = oracle_rng.permutation(n)[: steps * rows_per_step]
        for s in range(steps):
            sample = jnp.asarray(
                matrix[perm[s * rows_per_step : (s + 1) * rows_per_step]].reshape(
                    books, b, d
                )
            )
            cbs = kmeans.lloyd_step(cbs, sample, "l2")
    np.testing.assert_allclose(got, np.asarray(cbs), atol=1e-5, rtol=1e-5)


def test_train_streaming_int8_transport_pins_to_dequantized_fp32(rng):
    """int8 chunk transport (VERDICT r4 next #5) is EXACTLY fp32
    streaming over the dequantized corpus: same seed → same permutation
    → same (dequantized) samples; only the transfer carries int8."""
    from fenix_tpu.ops import kmeans, topk2

    n, d, books, k, b, epochs, seed = 2048, 8, 2, 4, 64, 2, 11
    matrix = rng.standard_normal((n, d)).astype(np.float32)
    codes, scales = topk2.quantize_rows_int8_np(matrix)
    deq = codes.astype(np.float32) * scales[:, None]

    kw = dict(num_codebooks=books, codebook_size=k, batch_size=b,
              num_epochs=epochs, metric="l2", chunk_rows=384)
    got = np.asarray(
        kmeans.train_streaming(matrix, seed, precision="int8", **kw)
    )
    want = np.asarray(kmeans.train_streaming(deq, seed, **kw))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)

    # quality: int8-transport centroids track true-fp32 training within
    # the quantization noise floor on a clusterable corpus
    centers = rng.standard_normal((4, d)).astype(np.float32) * 3
    blob = (centers[rng.integers(0, 4, n)]
            + 0.1 * rng.standard_normal((n, d))).astype(np.float32)
    f32 = np.asarray(kmeans.train_streaming(blob, seed, **kw))
    i8 = np.asarray(kmeans.train_streaming(blob, seed, precision="int8", **kw))
    rel = np.linalg.norm(i8 - f32) / np.linalg.norm(f32)
    assert rel < 0.02, rel

    # a prebuilt mirror (the serving cache's sidecar) gives the same run
    mir = np.asarray(
        kmeans.train_streaming(
            matrix, seed, precision="int8", int8_mirror=(codes, scales), **kw
        )
    )
    np.testing.assert_allclose(mir, got, atol=1e-6, rtol=1e-6)


def test_train_streaming_bf16_transport_close_to_fp32(rng):
    from fenix_tpu.ops import kmeans

    n, d, books, k, b, seed = 2048, 8, 2, 4, 64, 3
    # clusterable corpus: on pure noise the Lloyd trajectory is chaotic
    # (one flipped assignment diverges the runs), which would measure
    # trajectory sensitivity, not transport error
    centers = rng.standard_normal((4, d)).astype(np.float32) * 3
    matrix = (centers[rng.integers(0, 4, n)]
              + 0.1 * rng.standard_normal((n, d))).astype(np.float32)
    kw = dict(num_codebooks=books, codebook_size=k, batch_size=b,
              num_epochs=1, metric="l2", chunk_rows=384)
    f32 = np.asarray(kmeans.train_streaming(matrix, seed, **kw))
    b16 = np.asarray(kmeans.train_streaming(matrix, seed, precision="bf16", **kw))
    rel = np.linalg.norm(b16 - f32) / np.linalg.norm(f32)
    assert rel < 0.02, rel


def test_coder_make_streams_int8_when_configured(tmp_path, rng, monkeypatch):
    """coder.make with stream_precision='int8' trains through the
    quantized transport (reusing the serving cache's host mirror) and
    produces a servable coder whose probed search still hits."""
    import pyarrow as pa

    from fenix_tpu import coder as coder_mod
    from fenix_tpu import index as index_mod
    from fenix_tpu.engine import executor as executor_mod
    from fenix_tpu.io import ingest, table
    from fenix_tpu.utils.metrics import GLOBAL as METRICS

    root = str(tmp_path)
    n, d = 4096, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    table.make(root, "t", pa.table({
        "id": pa.array(np.arange(n)),
        "vector": ingest.numpy_to_fixed_size_list(vecs, pa.float32()),
    }).to_reader())

    monkeypatch.setenv("FENIX_HBM_BUDGET", str(64 << 10))
    before = METRICS.snapshot().get("cache.mirror_rows_quantized", 0)
    coder_mod.make(
        root, "c", "t", "vector",
        {"metric": "l2", "codebook_size": 4, "num_codebooks": 2,
         "batch_size": 128, "num_epochs": 1, "stream_precision": "int8"},
        seed=0,
    )
    # the quantize ran once through the shared host mirror
    assert METRICS.snapshot().get("cache.mirror_rows_quantized", 0) == before + n
    index_mod.make(root, "c", "t", "vector")
    cache = executor_mod.get_cache(root)
    out = executor_mod.execute_search(
        cache,
        executor_mod.SearchRequest(
            source="t", column="vector", target=vecs[11], metric="l2",
            maxval=3, coding="c", probes=8,
        ),
    )
    assert int(np.asarray(out.column("id"))[0]) == 11


def test_coder_make_routes_streaming_past_budget(tmp_path, rng, monkeypatch):
    """coder.make over a corpus past FENIX_HBM_BUDGET trains through the
    streaming path and produces a servable coder."""
    import pyarrow as pa

    from fenix_tpu import coder as coder_mod
    from fenix_tpu import index as index_mod
    from fenix_tpu.io import ingest, table

    root = str(tmp_path)
    n, d = 4096, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    table.make(root, "t", pa.table({
        "id": pa.array(np.arange(n)),
        "vector": ingest.numpy_to_fixed_size_list(vecs, pa.float32()),
    }).to_reader())

    monkeypatch.setenv("FENIX_HBM_BUDGET", str(64 << 10))  # 64 KB: force streaming
    cfg = {"metric": "l2", "codebook_size": 4, "num_codebooks": 2,
           "batch_size": 128, "num_epochs": 1}
    coding = coder_mod.make(root, "c", "t", "vector", cfg, seed=0)
    assert np.isfinite(coding["tensor"]).all()
    monkeypatch.delenv("FENIX_HBM_BUDGET")
    index_mod.make(root, "c", "t", "vector")  # probed search stays servable


@pytest.mark.parametrize("metric", ["l2", "cosine", "dot"])
def test_host_assignment_matches_device(root, rng, metric, monkeypatch):
    """FENIX_ASSIGN=host (and the auto route for host-resident tables)
    must produce the device assignment bit-for-bit — the oversized
    lifecycle (make-index past the HBM budget) hangs off it."""
    cfg = dict(CONFIG, metric=metric)
    coder.make(root, "ha", "test/table", "vector", cfg, seed=3)

    monkeypatch.setenv("FENIX_ASSIGN", "device")
    index.make(root, "ha", "test/table", "vector")
    dev = ingest.scalar_column_to_numpy(
        arrow.load(index.path_of(root, "ha", "test/table", "vector")).column(
            index.CODE_COL
        )
    ).copy()

    monkeypatch.setenv("FENIX_ASSIGN", "host")
    index.make(root, "ha", "test/table", "vector")
    host = ingest.scalar_column_to_numpy(
        arrow.load(index.path_of(root, "ha", "test/table", "vector")).column(
            index.CODE_COL
        )
    )
    np.testing.assert_array_equal(dev, host)

    # auto routes host when the corpus exceeds the budget
    from fenix_tpu.utils.metrics import GLOBAL as METRICS

    monkeypatch.setenv("FENIX_ASSIGN", "auto")
    monkeypatch.setenv("FENIX_HBM_BUDGET", "4096")
    before = METRICS.snapshot().get("index.host_assigns", 0)
    index.make(root, "ha", "test/table", "vector")
    assert METRICS.snapshot().get("index.host_assigns", 0) == before + 1
