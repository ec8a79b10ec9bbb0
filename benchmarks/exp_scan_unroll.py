"""XLA fusable-scan phase 1 with unrolling — can it beat the Mosaic tax?

exp_dma3: every Mosaic kernel execution costs ~3.5-4 ms FIXED on this
stack (in-jit, data-independent), so the Pallas bigq kernel's 5.3 ms is
mostly tax. The XLA fusable scan has no tax but stalls between steps
(~184 GB/s). `lax.scan(unroll=u)` merges u steps per loop iteration —
XLA can overlap DMA across the merged steps. Sweep unroll × dtype at
Q=1024, 1M×128; consume with jnp.sum(bucket_max) (constant fetch,
keeps per-bucket structure live).

    python -m benchmarks.exp_scan_unroll
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from fenix_tpu.ops import topk2


def fence(x):
    return np.asarray(x)


def timeit(fn, *args, iters=8):
    out = fn(*args)
    fence(out[0] if isinstance(out, tuple) else out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - start) / iters


BUCKET = topk2.BUCKET_LARGE_Q  # 32


def scan_p1(queries_p, corpus, aux_mul, aux_add, block_rows, unroll):
    n, d = corpus.shape
    qt = queries_p.shape[0]
    nb = n // block_rows
    xs = (
        corpus.reshape(nb, block_rows, d),
        aux_mul.reshape(nb, block_rows),
        aux_add.reshape(nb, block_rows),
    )
    acc = jnp.bfloat16 if corpus.dtype == jnp.bfloat16 else jnp.float32

    def body(_, x):
        vb, mb, ab = x
        s = jax.lax.dot_general(
            queries_p, vb,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc,
        )
        s = s * mb[None, :].astype(acc) + ab[None, :].astype(acc)
        return None, s.reshape(qt, block_rows // BUCKET, BUCKET).max(axis=-1)

    _, stacked = jax.lax.scan(body, None, xs, unroll=unroll)
    return stacked  # [nb, QT, bpb] — leave un-transposed (consumer sums)


def scan_p1_int8(q8, corpus8, aux_mul_s, aux_add, inv_sq, block_rows, unroll):
    n, d = corpus8.shape
    qt = q8.shape[0]
    nb = n // block_rows
    xs = (
        corpus8.reshape(nb, block_rows, d),
        aux_mul_s.reshape(nb, block_rows),
        aux_add.reshape(nb, block_rows),
    )

    def body(_, x):
        vb, mb, ab = x
        s32 = jax.lax.dot_general(
            q8, vb,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        s = s32.astype(jnp.float32) * mb[None, :] + ab[None, :] * inv_sq[:, None]
        return None, s.reshape(qt, block_rows // BUCKET, BUCKET).max(axis=-1)

    _, stacked = jax.lax.scan(body, None, xs, unroll=unroll)
    return stacked


@functools.partial(jax.jit, static_argnames=("block_rows", "unroll"))
def f32_sum(qp, corpus, aux_mul, aux_add, block_rows, unroll):
    return jnp.sum(scan_p1(qp, corpus, aux_mul, aux_add, block_rows, unroll))


@functools.partial(jax.jit, static_argnames=("block_rows", "unroll"))
def int8_sum(q8, v8, aux_mul_s, aux_add, inv_sq, block_rows, unroll):
    return jnp.sum(scan_p1_int8(q8, v8, aux_mul_s, aux_add, inv_sq, block_rows, unroll))


@jax.jit
def pallas_sum(qp, corpus, aux_mul, aux_add):
    return jnp.sum(topk2.bucket_scores_pallas_bigq(qp, corpus, aux_mul, aux_add,
                                                   bucket=BUCKET))


def main():
    dev = jax.devices()[0]
    print(f"device: {getattr(dev, 'device_kind', dev)}", flush=True)

    n, d = 1_048_576, 128
    rng = np.random.default_rng(0)
    corpus = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    aux_mul, aux_add = topk2.prepare_aux(corpus, None, "cosine")
    queries = jnp.asarray(rng.standard_normal((1024, d)).astype(np.float32))
    qp = topk2.prepare_queries(queries, "cosine")
    v8, sv = topk2.quantize_corpus_int8(corpus)
    q8, inv_sq = topk2.quantize_queries_int8(qp)
    aux_mul_s = aux_mul * sv
    cb = corpus.astype(jnp.bfloat16)
    qb = qp.astype(jnp.bfloat16)
    fence(q8[0, 0])

    t = timeit(pallas_sum, qp, corpus, aux_mul, aux_add, iters=8)
    print(json.dumps({"variant": "p1_pallas_prod", "ms": round(t * 1e3, 3)}), flush=True)

    for block in (1024, 2048):
        for unroll in (1, 2, 4):
            t = timeit(f32_sum, qp, corpus, aux_mul, aux_add, block, unroll, iters=8)
            print(json.dumps({"variant": f"p1_scan_f32_b{block}_u{unroll}",
                              "ms": round(t * 1e3, 3)}), flush=True)

    for unroll in (1, 2, 4, 8):
        t = timeit(int8_sum, q8, v8, aux_mul_s, aux_add, inv_sq, 2048, unroll, iters=8)
        print(json.dumps({"variant": f"p1_scan_int8_b2048_u{unroll}",
                          "ms": round(t * 1e3, 3)}), flush=True)

    for unroll in (1, 2, 4):
        t = timeit(f32_sum, qb, cb, aux_mul, aux_add, 4096, unroll, iters=8)
        print(json.dumps({"variant": f"p1_scan_bf16_b4096_u{unroll}",
                          "ms": round(t * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
