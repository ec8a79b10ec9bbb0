"""Phase-2 cost breakdown at Q=1024 (the dominant cost: 34 of 39 ms).

Each stage adds one component; all variants reduce to a scalar so the
tunnel fetch is constant. Also re-times full two-phase at 8M rows, Q=8
(dispatch amortized) for the scan-rate story.

    python -m benchmarks.exp_phase2
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from fenix_tpu.ops import topk2

BUCKET = topk2.BUCKET


def timeit(fn, *args, iters=8):
    np.asarray(fn(*args))
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - start) / iters


@jax.jit
def p1_only(qp, corpus, aux_mul, aux_add):
    bm = topk2.bucket_scores_xla(qp, corpus, aux_mul, aux_add)
    return jnp.max(bm)


@functools.partial(jax.jit, static_argnames=("kp",))
def p1_topk_buckets(qp, corpus, aux_mul, aux_add, kp):
    bm = topk2.bucket_scores_xla(qp, corpus, aux_mul, aux_add)
    _, bidx = jax.lax.top_k(bm, kp)
    return jnp.sum(bidx)


@functools.partial(jax.jit, static_argnames=("kp",))
def p1_topk_gather(qp, corpus, aux_mul, aux_add, kp):
    n, d = corpus.shape
    bm = topk2.bucket_scores_xla(qp, corpus, aux_mul, aux_add)
    _, bidx = jax.lax.top_k(bm, kp)
    bidx = jnp.sort(bidx, axis=-1)
    rows = corpus.reshape(n // BUCKET, BUCKET, d)
    cand = rows[bidx]  # [Q, kp, 128, D]
    return jnp.sum(cand) + jnp.float32(jnp.sum(bidx))


@functools.partial(jax.jit, static_argnames=("kp",))
def p1_topk_gather_einsum(qp, corpus, aux_mul, aux_add, kp):
    n, d = corpus.shape
    bm = topk2.bucket_scores_xla(qp, corpus, aux_mul, aux_add)
    _, bidx = jax.lax.top_k(bm, kp)
    bidx = jnp.sort(bidx, axis=-1)
    rows = corpus.reshape(n // BUCKET, BUCKET, d)
    cand = rows[bidx]
    s = jnp.einsum("qd,qkbd->qkb", qp, cand, preferred_element_type=jnp.float32)
    mul_b = aux_mul.reshape(n // BUCKET, BUCKET)
    add_b = aux_add.reshape(n // BUCKET, BUCKET)
    s = s * mul_b[bidx] + add_b[bidx]
    return jnp.sum(s)


@functools.partial(jax.jit, static_argnames=("kp", "kk"))
def p2_full_nomap(qp, corpus, aux_mul, aux_add, kp, kk):
    """Phase 2 with no lax.map chunking: one big gather+einsum+top_k."""
    n, d = corpus.shape
    q = qp.shape[0]
    bm = topk2.bucket_scores_xla(qp, corpus, aux_mul, aux_add)
    _, bidx = jax.lax.top_k(bm, kp)
    bidx = jnp.sort(bidx, axis=-1)
    rows = corpus.reshape(n // BUCKET, BUCKET, d)
    cand = rows[bidx]
    s = jnp.einsum("qd,qkbd->qkb", qp, cand, preferred_element_type=jnp.float32)
    mul_b = aux_mul.reshape(n // BUCKET, BUCKET)
    add_b = aux_add.reshape(n // BUCKET, BUCKET)
    s = (s * mul_b[bidx] + add_b[bidx]).reshape(q, kp * BUCKET)
    top_s, pos = jax.lax.top_k(s, kk)
    return jnp.sum(top_s) + jnp.float32(jnp.sum(pos))


def main():
    dev = jax.devices()[0]
    print(f"device: {getattr(dev, 'device_kind', dev)}", flush=True)

    n, d, k = 1_048_576, 128, 16
    kp = k + topk2.BUCKET_PAD
    corpus = jax.random.normal(jax.random.PRNGKey(0), (n, d), dtype=jnp.float32)
    aux_mul, aux_add = topk2.prepare_aux(corpus, None, "cosine")
    qp = topk2.prepare_queries(
        jax.random.normal(jax.random.PRNGKey(1), (1024, d), dtype=jnp.float32), "cosine"
    )
    np.asarray(qp[0, 0])

    for name, fn, args in (
        ("p1_only", p1_only, (qp, corpus, aux_mul, aux_add)),
        ("p1+topk_buckets", p1_topk_buckets, (qp, corpus, aux_mul, aux_add, kp)),
        ("p1+topk+gather", p1_topk_gather, (qp, corpus, aux_mul, aux_add, kp)),
        ("p1+topk+gather+einsum", p1_topk_gather_einsum, (qp, corpus, aux_mul, aux_add, kp)),
        ("p2_full_nomap", p2_full_nomap, (qp, corpus, aux_mul, aux_add, kp, k)),
    ):
        t = timeit(fn, *args)
        print(json.dumps({"stage": name, "ms": round(t * 1e3, 2)}), flush=True)

    # 8M two-phase, Q=8 — the scan-rate story with dispatch amortized
    n8 = 8 * 1024 * 1024
    corpus8m = jax.random.normal(jax.random.PRNGKey(2), (n8, d), dtype=jnp.float32)
    am8, aa8 = topk2.prepare_aux(corpus8m, None, "cosine")
    cb = corpus8m.astype(jnp.bfloat16)
    v8, sv = topk2.quantize_corpus_int8(corpus8m)
    q8 = jax.random.normal(jax.random.PRNGKey(3), (8, d), dtype=jnp.float32)
    np.asarray(v8[0, 0])

    for name, kw in (
        ("fp32", {}),
        ("bf16", {"corpus_scan": cb}),
        ("int8", {"corpus_scan_int8": (v8, sv)}),
    ):
        fn = lambda: topk2.topk_two_phase(corpus8m, q8, am8, aa8, k=k, metric="cosine", **kw)
        np.asarray(fn()[0])
        start = time.perf_counter()
        for _ in range(8):
            out = fn()
        np.asarray(out[0])
        t = (time.perf_counter() - start) / 8
        print(json.dumps({"variant": f"8M_{name}_q8", "ms": round(t * 1e3, 2),
                          "rows_per_s_M": round(n8 / t / 1e6, 1)}), flush=True)


if __name__ == "__main__":
    main()
