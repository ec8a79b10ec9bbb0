"""Rescore-granularity sweep: BUCKET in {32, 64, 128} at 1M x 128.

Phase-2 gather traffic per query is kp * BUCKET * D * 4; a finer bucket
cuts it linearly while the exactness argument is granularity-free.
Costs: 128/BUCKET x larger bucket-max output (still tiny) and shorter
lane-group reductions in phase 1.

    python -m benchmarks.exp_bucket
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from fenix_tpu.ops import topk2


def timed(fn, iters=10):
    np.asarray(fn()[0])
    start = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(out[0])
    return (time.perf_counter() - start) / iters


def main():
    n, d, k = 1_048_576, 128, 16
    corpus = jax.random.normal(jax.random.PRNGKey(0), (n, d), dtype=jnp.float32)
    aux_mul, aux_add = topk2.prepare_aux(corpus, None, "cosine")
    q8 = jax.random.normal(jax.random.PRNGKey(1), (8, d), dtype=jnp.float32)
    q1024 = jax.random.normal(jax.random.PRNGKey(2), (1024, d), dtype=jnp.float32)
    np.asarray(q8[0, 0])

    ref_ids = None
    for bucket in (128, 64, 32):
        topk2.BUCKET = bucket
        # BUCKET is baked into the trace but not the jit key — force retrace
        topk2.topk_two_phase.clear_cache()

        t8 = timed(lambda: topk2.topk_two_phase(corpus, q8, aux_mul, aux_add, k=k, metric="cosine"))
        t1024 = timed(lambda: topk2.topk_two_phase(corpus, q1024, aux_mul, aux_add, k=k, metric="cosine"))
        _, ids = topk2.topk_two_phase(corpus, q8, aux_mul, aux_add, k=k, metric="cosine")
        ids = np.asarray(ids)
        if ref_ids is None:
            ref_ids = ids
        print(json.dumps({
            "bucket": bucket,
            "q8_ms": round(t8 * 1e3, 2),
            "q8_rows_per_s_M": round(n / t8 / 1e6, 1),
            "q1024_ms": round(t1024 * 1e3, 2),
            "q1024_qps": round(1024 / t1024, 1),
            "ids_match_bucket128": bool((ids == ref_ids).all()),
        }), flush=True)


if __name__ == "__main__":
    main()
