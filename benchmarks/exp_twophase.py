"""End-to-end two-phase kernel timing at bench.py shapes, after the
oneshot/fusable-block restructure. Run on the real chip (ONE process):
    python -m benchmarks.exp_twophase
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from fenix_tpu.ops import topk2


def timeit(fn, iters=10):
    np.asarray(fn()[0])
    start = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(out[0])
    return (time.perf_counter() - start) / iters


def main():
    dev = jax.devices()[0]
    print(f"device: {getattr(dev, 'device_kind', dev)}", flush=True)

    n, d, k = 1_048_576, 128, 16
    key = jax.random.PRNGKey(0)
    corpus = jax.random.normal(key, (n, d), dtype=jnp.float32)
    aux_mul, aux_add = topk2.prepare_aux(corpus, None, "cosine")
    corpus_bf16 = corpus.astype(jnp.bfloat16)
    v8, sv = topk2.quantize_corpus_int8(corpus)
    np.asarray(v8[0, 0])

    def run(q, **kw):
        queries = jax.random.normal(jax.random.PRNGKey(1), (q, d), dtype=jnp.float32)
        return lambda: topk2.topk_two_phase(
            corpus, queries, aux_mul, aux_add, k=k, metric="cosine", **kw
        )

    for q in (8, 1024):
        for name, kw in (
            ("fp32", {}),
            ("bf16", {"corpus_scan": corpus_bf16}),
            ("int8", {"corpus_scan_int8": (v8, sv)}),
        ):
            t = timeit(run(q, **kw))
            print(json.dumps({
                "variant": f"{name}_q{q}", "ms": round(t * 1e3, 2),
                "rows_per_s_M": round(n / t / 1e6, 1),
                "qps": round(q / t, 1),
            }), flush=True)

    # recall check for int8 at this scale (vs fp32 result)
    q = 64
    queries = jax.random.normal(jax.random.PRNGKey(2), (q, d), dtype=jnp.float32)
    _, ids_exact = topk2.topk_two_phase(corpus, queries, aux_mul, aux_add, k=k, metric="cosine")
    _, ids_int8 = topk2.topk_two_phase(
        corpus, queries, aux_mul, aux_add, k=k, metric="cosine", corpus_scan_int8=(v8, sv)
    )
    ids_exact, ids_int8 = np.asarray(ids_exact), np.asarray(ids_int8)
    recall = np.mean([
        len(set(ids_exact[i].tolist()) & set(ids_int8[i].tolist())) / k for i in range(q)
    ])
    print(json.dumps({"int8_recall_at_16_1M": round(float(recall), 4)}), flush=True)


if __name__ == "__main__":
    main()
