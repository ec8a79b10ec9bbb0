"""Row-sharded vs DIMENSION-sharded distance contraction (VERDICT r2
missing #4 / SURVEY §5 "optionally the dimension axis").

Measures both placements at the config-2 shape (D=768, scaled rows) on
whatever mesh is available (virtual CPU mesh in tests; a pod slice
would use the same code). The dim-sharded path psums a
[Q, N/S_data] partial score per dispatch where the row-sharded path
exchanges only S·k candidates — row sharding is expected to win
whenever the corpus row shard fits HBM; the dim split is a CAPACITY
option (a row shard wider than HBM can split columns instead). This
script records the measured ratio so that claim is a number, not an
argument.
"""

from __future__ import annotations

import numpy as np

from benchmarks import common


def main() -> None:
    args = common.parser("dim-sharded vs row-sharded contraction").parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fenix_tpu.ops import topk2
    from fenix_tpu.parallel import mesh as mesh_mod
    from fenix_tpu.parallel import search as psearch
    from fenix_tpu.parallel.mesh import MODEL_AXIS

    devs = jax.devices()
    assert len(devs) >= 2, "needs a mesh"
    mesh = mesh_mod.make_mesh(
        len(devs) - len(devs) % 2, model_parallel=2 if len(devs) % 2 == 0 else 1
    )

    n = int(2_000_000 * min(args.scale, 1.0)) // 65536 * 65536 or 65536
    d, q, k = 768, 8, 128
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)

    # --- row-sharded reference (candidate-only merge) -------------------
    corpus_row, mask_row = psearch.shard_corpus(mesh, corpus, block=4096)
    aux_mul_r, aux_add_r = psearch.shard_aux(corpus_row, mask_row, "l2")
    row_fn = psearch.build_serving_search(mesh, k=k, metric="l2")
    t_row = common.timeit(
        lambda: row_fn(corpus_row, jnp.asarray(queries), aux_mul_r, aux_add_r),
        args.iters,
    )

    # --- dim-sharded (psum'd partial contraction) -----------------------
    corpus_dim, _ = psearch.shard_corpus_dim(mesh, corpus, block=4096)
    n_pad = corpus_dim.shape[0]
    full = np.zeros((n_pad, d), np.float32)
    full[:n] = corpus
    mask = np.zeros(n_pad, bool)
    mask[:n] = True
    aux_mul, aux_add = topk2.prepare_aux(jnp.asarray(full), jnp.asarray(mask), "l2")
    aux_mul = jax.device_put(np.asarray(aux_mul), NamedSharding(mesh, P("data")))
    aux_add = jax.device_put(np.asarray(aux_add), NamedSharding(mesh, P("data")))
    qp = jax.device_put(
        np.asarray(topk2.prepare_queries(jnp.asarray(queries), "l2")),
        NamedSharding(mesh, P(None, MODEL_AXIS)),
    )
    q_sq = jnp.asarray((queries**2).sum(1))
    dim_fn = psearch.build_dim_sharded_search(mesh, k=k, metric="l2")
    t_dim = common.timeit(
        lambda: dim_fn(corpus_dim, qp, aux_mul, aux_add, q_sq), args.iters
    )

    # equality spot-check while we're here
    a = topk2.unpack_result(
        np.asarray(row_fn(corpus_row, jnp.asarray(queries), aux_mul_r, aux_add_r))
    )
    b = topk2.unpack_result(np.asarray(dim_fn(corpus_dim, qp, aux_mul, aux_add, q_sq)))
    ids_equal = bool((a[1] == b[1]).all())

    common.emit(
        "dim_sharded_vs_row_sharded",
        t_dim / t_row,
        "x (dim/row time ratio; >1 = row sharding wins)",
        n=n,
        d=d,
        q=q,
        k=k,
        t_row_s=round(t_row, 4),
        t_dim_s=round(t_dim, 4),
        ids_equal=ids_equal,
        mesh=dict(mesh.shape),
        backend=jax.default_backend(),
    )


if __name__ == "__main__":
    main()
