"""BASELINE config 5: 1024-query batches with mixed predicates.

Alternating predicate masks across the batch exercise per-request mask
overlays on the cached score aux (the exchange/compute overlap of the
full config belongs to the multi-host harness)."""

from __future__ import annotations

import numpy as np

from benchmarks import common


def main() -> None:
    args = common.parser("batched mixed-predicate search").parse_args()

    import jax.numpy as jnp

    from fenix_tpu.ops import topk2

    n = int(1_048_576 * min(args.scale, 8.0)) // 262144 * 262144 or 262144
    d, k, q = 128, 16, 1024
    rng = np.random.default_rng(0)

    corpus = jnp.asarray(common.make_corpus(n, d))
    queries = jnp.asarray(rng.standard_normal((q, d)).astype(np.float32))
    tags = rng.integers(0, 10, n)

    # three predicate classes cycling through the workload
    masks = [
        jnp.asarray(tags < 3),
        jnp.asarray((tags >= 3) & (tags < 7)),
        jnp.asarray(np.ones(n, dtype=bool)),
    ]
    auxes = [topk2.prepare_aux(corpus, m, "cosine") for m in masks]

    def run(i=[0]):
        aux_mul, aux_add = auxes[i[0] % len(auxes)]
        i[0] += 1
        return topk2.topk_two_phase(
            corpus, queries, aux_mul, aux_add, k=k, metric="cosine"
        )

    t_disp = common.timeit(run, args.iters)

    # sustained: cycle the predicate auxes INSIDE one dispatch
    # (bench.py methodology; ~1.3 ms fixed dispatch per lone jit call)
    import functools

    import jax

    mul_s = jnp.stack([a[0] for a in auxes])  # [3, N]
    add_s = jnp.stack([a[1] for a in auxes])

    @functools.partial(jax.jit, static_argnames=("k_",))
    def sustained(corpus_, queries_, mul_stack, add_stack, idx, k_):
        def body(_, i):
            return None, topk2.topk_two_phase(
                corpus_, queries_, mul_stack[i], add_stack[i], k=k_, metric="cosine"
            )

        _, out = jax.lax.scan(body, None, idx)
        return out

    inner = 6
    idx = jnp.asarray(np.arange(inner) % len(auxes), dtype=np.int32)
    t = common.timeit(
        lambda: sustained(corpus, queries, mul_s, add_s, idx, k),
        max(args.iters // 2, 2),
    ) / inner
    common.emit(
        "mixed_predicate_batch_qps",
        q / t,
        "queries/s",
        n=n,
        d=d,
        q=q,
        k=k,
        seconds=round(t, 5),
        per_dispatch_qps=round(q / t_disp, 1),
    )


if __name__ == "__main__":
    main()
