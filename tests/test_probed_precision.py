"""Probed × precision × filter completeness (VERDICT r1 #7).

The bf16/int8 scan copies now feed the PROBED phase-1 scan too (and the
mesh-sharded probed fallback); the clustered gather route rescores
fp32-exactly regardless. Every combination must return the fp32 probed
result: phase 2 always rescores candidates against the fp32 corpus and
the widened candidate margin absorbs scan quantization at this scale.
"""

import numpy as np
import pyarrow as pa
import pytest

from fenix_tpu import coder, expr, index
from fenix_tpu.engine import executor as ex
from fenix_tpu.engine import session
from fenix_tpu.io import ingest, table

ROWS, DIM = 3_000, 32

CONFIG: coder.Config = {
    "metric": "l2", "codebook_size": 4, "num_codebooks": 2,
    "batch_size": 512, "num_epochs": 2,
}


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    rng = np.random.default_rng(21)
    root = str(tmp_path_factory.mktemp("pp_root"))
    vecs = rng.standard_normal((ROWS, DIM)).astype(np.float32)
    vecs[1500:] += 4.0  # cluster structure for the coder
    table.make(
        root,
        "t",
        pa.table(
            {
                "id": pa.array(np.arange(ROWS)),
                "tag": pa.array(rng.integers(0, 4, ROWS)),
                "vector": ingest.numpy_to_fixed_size_list(vecs, pa.float32()),
            }
        ).to_reader(),
    )
    coder.make(root, "c", "t", "vector", CONFIG, seed=0)
    index.make(root, "c", "t", "vector")
    return root


def _req(precision, probed, filtered):
    rng = np.random.default_rng(9)
    return ex.SearchRequest(
        source="t", column="vector", metric="l2",
        target=rng.standard_normal((4, DIM)).astype(np.float32),
        maxval=10,
        precision=precision,
        coding="c" if probed else None,
        probes=8 if probed else None,
        filter=(expr.field("tag") != 2) if filtered else None,
    )


@pytest.mark.parametrize("meshed", [False, True], ids=["flat", "sharded"])
@pytest.mark.parametrize("filtered", [False, True], ids=["nofilter", "filtered"])
@pytest.mark.parametrize("probed", [False, True], ids=["exact", "probed"])
@pytest.mark.parametrize("precision", ["fp32", "bf16", "int8"])
def test_matrix_matches_fp32(root, precision, probed, filtered, meshed):
    cache = session.DeviceCache(root, block=128, mesh="auto" if meshed else None)
    got = ex.execute_search(cache, _req(precision, probed, filtered))

    oracle_cache = session.DeviceCache(root, block=128, mesh=None)
    ref = ex.execute_search(oracle_cache, _req("fp32", probed, filtered))

    assert got.column("id").to_pylist() == ref.column("id").to_pylist()
    np.testing.assert_allclose(
        np.asarray(got.column(ex.DIST_COL)),
        np.asarray(ref.column(ex.DIST_COL)),
        atol=1e-5,
    )
    if filtered:
        assert all(t != 2 for t in got.column("tag").to_pylist())


@pytest.mark.parametrize("precision", ["bf16", "int8"])
def test_probed_precision_batches(root, precision):
    """Probed low-precision requests coalesce (same batch key) and the
    batched path returns the solo result."""
    cache = session.DeviceCache(root, block=128)
    reqs = [_req(precision, True, False) for _ in range(2)]
    assert all(ex.batchable(r) for r in reqs)
    assert len({ex.batch_key(r) for r in reqs}) == 1
    outs = ex.execute_search_batched(cache, reqs)
    solo = ex.execute_search(cache, reqs[0])
    for got in outs:
        assert got.column("id").to_pylist() == solo.column("id").to_pylist()
