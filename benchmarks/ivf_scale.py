"""IVF clustered-gather vs brute force at scale (8M×128 default).

docs/DESIGN.md documents the clustered layout at parity with brute
force at 1M rows ("wins grow with corpus size"); this benchmark
quantifies that at 8M: probed search touches probes/n_cells of the
corpus (gather cost ∝ probed rows), while brute force always pays the
full scan. Uses a ground-truth clustering (synthetic centers) so the
engine-path costs (host probe ranking → bucket lists → clustered
gather kernel) are exercised end-to-end and recall@10 vs brute force
is measurable.

    python -m benchmarks.ivf_scale [--scale 1.0]   # 1.0 → 8M rows
"""

from __future__ import annotations

import functools

import numpy as np

from benchmarks import common


def main() -> None:
    p = common.parser("IVF clustered vs brute at scale")
    p.add_argument("--probes", type=int, default=16)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from fenix_tpu.engine.executor import _ivf_bucket_lists
    from fenix_tpu.ops import topk2

    n = int(8 * 1_048_576 * min(args.scale, 2.0)) // 131072 * 131072 or 131072
    d, k, q, n_cells, probes = 128, 16, 8, 4096, args.probes
    rng = np.random.default_rng(0)

    centers = rng.standard_normal((n_cells, d)).astype(np.float32) * 4.0
    assign = np.sort(rng.integers(0, n_cells, n))  # rows already cell-sorted
    perm = np.arange(n, dtype=np.int32)  # generated in sorted order → identity
    counts = np.bincount(assign, minlength=n_cells)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)

    # corpus generated directly in clustered order on device
    corpus_s = jnp.asarray(centers)[jnp.asarray(assign)] + jax.random.normal(
        jax.random.PRNGKey(1), (n, d), dtype=jnp.float32
    )
    aux_mul_s, aux_add_s = topk2.prepare_aux(corpus_s, None, "l2")
    coded_s = jnp.asarray(assign.astype(np.int32))
    orig_ids_s = jnp.asarray(perm)
    common.sync(aux_add_s)

    bucket = topk2.bucket_for(q, n)
    n_buckets = n // bucket

    def make_batch(seed):
        r = np.random.default_rng(seed)
        rows = r.integers(0, n, q)
        qs = np.asarray(corpus_s[jnp.asarray(rows)]) + 0.1 * r.standard_normal(
            (q, d)
        ).astype(np.float32)
        # host probe-cell ranking (engine route for dense grids)
        dc = ((qs[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        cells = np.argsort(dc, axis=1)[:, :probes].astype(np.int32)
        bl = _ivf_bucket_lists(cells, offsets, bucket, n_buckets)
        return qs, cells, bl

    inner = 8
    batches = [make_batch(100 + i) for i in range(inner)]
    bmax = max(b[2].shape[1] for b in batches)
    qs_s = jnp.asarray(np.stack([b[0] for b in batches]))
    cells_s = jnp.asarray(np.stack([b[1] for b in batches]))
    bl_s = jnp.asarray(
        np.stack([
            np.pad(b[2], ((0, 0), (0, bmax - b[2].shape[1])), constant_values=-1)
            for b in batches
        ])
    )

    # corpus/aux passed as jit ARGUMENTS — closing over them captures
    # GBs of constants that upload to the remote compiler (CLAUDE.md)
    @functools.partial(jax.jit, static_argnames=("k_",))
    def ivf_sustained(corpus, mul, add, coded, orig_ids, qb, cb, blb, k_):
        def body(_, x):
            qs, cells, bl = x
            return None, topk2.topk_ivf_clustered(
                corpus, qs, mul, add, coded, orig_ids,
                cells, bl, k=k_, metric="l2",
            )

        _, out = jax.lax.scan(body, None, (qb, cb, blb))
        return out

    @functools.partial(jax.jit, static_argnames=("k_",))
    def brute_sustained(corpus, mul, add, qb, k_):
        def body(_, qs):
            return None, topk2.topk_two_phase(corpus, qs, mul, add, k=k_, metric="l2")

        _, out = jax.lax.scan(body, None, qb)
        return out

    def run_ivf():
        return ivf_sustained(
            corpus_s, aux_mul_s, aux_add_s, coded_s, orig_ids_s,
            qs_s, cells_s, bl_s, k,
        )

    def run_brute():
        return brute_sustained(corpus_s, aux_mul_s, aux_add_s, qs_s, k)

    t_ivf = common.timeit(run_ivf, 4) / inner
    t_brute = common.timeit(run_brute, 4) / inner

    # recall@10: ivf ids vs brute ids on batch 0
    di, ii = run_ivf()
    db, ib = run_brute()
    ii0, ib0 = np.asarray(ii[0])[:, :10], np.asarray(ib[0])[:, :10]
    recall = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(ii0, ib0)])

    common.emit(
        "ivf_clustered_speedup_vs_brute",
        t_brute / t_ivf,
        "x",
        n=n,
        d=d,
        q=q,
        n_cells=n_cells,
        probes=probes,
        ivf_ms=round(t_ivf * 1e3, 3),
        brute_ms=round(t_brute * 1e3, 3),
        gathered_rows_per_query=int(bmax) * bucket,
        recall_at_10=round(float(recall), 4),
    )


if __name__ == "__main__":
    main()
