"""Phase-1 kernel timings done right: args as jit params (no constant
capture → no 512 MB uploads to the remote compiler), scalar-reduced
outputs (no 128 MB bucket_max fetch), reduction before any transpose.

Variants at Q=1024, N=1M, D=128:
- fp32 loop (production) vs reshape-max reduction, and HIGHEST passes
- int8 production (post slicewise-convert edit: (2048, 1024) tiles)
- e2e fp32 / int8 two-phase for context

    python -m benchmarks.exp_int8_slice
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
BN, BQ = 2048, 1024


def f32_kernel(queries_p, corpus, aux_mul, aux_add, mode):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    qt, d = queries_p.shape
    n = corpus.shape[0]
    ni, nj = n // BN, qt // BQ
    bpb = BN // BUCKET
    prec = jax.lax.Precision.HIGHEST if mode == "highest" else None

    def kernel(q_ref, v_ref, mul_ref, add_ref, out_ref):
        s = jax.lax.dot_general(
            v_ref[:], q_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        s = s * mul_ref[:][:, None] + add_ref[:][:, None]
        if mode == "reshape":
            out_ref[:, :] = s.reshape(bpb, BUCKET, BQ).max(axis=1)
        else:
            for j in range(bpb):
                out_ref[j, :] = jnp.max(s[j * BUCKET : (j + 1) * BUCKET], axis=0)

    return pl.pallas_call(
        kernel,
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec((BQ, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN,), lambda i, j: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN,), lambda i, j: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bpb, BQ), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // BUCKET, qt), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * qt * d,
            bytes_accessed=n * d * 4 + n * 8 + qt * d * 4 * ni + (n // BUCKET) * qt * 4,
            transcendentals=0,
        ),
    )(queries_p, corpus, aux_mul, aux_add)


@functools.partial(jax.jit, static_argnames=("mode",))
def f32_scalar(qp, corpus, aux_mul, aux_add, mode):
    return jnp.max(f32_kernel(qp, corpus, aux_mul, aux_add, mode))


@jax.jit
def int8_scalar(q8, v8, aux_mul_s, aux_add, inv_sq):
    return jnp.max(topk2.bucket_scores_scan_int8(q8, v8, aux_mul_s, aux_add, inv_sq, BUCKET))


@jax.jit
def int8_bm(q8, v8, aux_mul_s, aux_add, inv_sq):
    return topk2.bucket_scores_scan_int8(q8, v8, aux_mul_s, aux_add, inv_sq, BUCKET)


def main():
    dev = jax.devices()[0]
    print(f"device: {getattr(dev, 'device_kind', dev)}", flush=True)

    n, d, k = 1_048_576, 128, 16
    rng = np.random.default_rng(0)
    corpus = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    aux_mul, aux_add = topk2.prepare_aux(corpus, None, "cosine")
    queries = jnp.asarray(rng.standard_normal((1024, d)).astype(np.float32))
    qp = topk2.prepare_queries(queries, "cosine")
    v8, sv = topk2.quantize_corpus_int8(corpus)
    q8, inv_sq = topk2.quantize_queries_int8(qp)
    aux_mul_s = aux_mul * sv
    fence(q8[0, 0])

    for mode in ("loop", "reshape", "highest"):
        try:
            t = timeit(f32_scalar, qp, corpus, aux_mul, aux_add, mode, iters=8)
        except Exception as e:
            print(json.dumps({"variant": f"p1_f32_{mode}", "error": str(e)[:160]}),
                  flush=True)
            continue
        print(json.dumps({"variant": f"p1_f32_{mode}", "ms": round(t * 1e3, 3)}),
              flush=True)

    t = timeit(int8_scalar, q8, v8, aux_mul_s, aux_add, inv_sq, iters=8)
    print(json.dumps({"variant": "p1_int8_slicewise", "ms": round(t * 1e3, 3)}), flush=True)

    # correctness spot-check vs fp32 phase-1 ordering is covered by CPU
    # tests; here just confirm the kernel emits sane values (scalar fetch)
    bm_max = float(np.asarray(int8_scalar(q8, v8, aux_mul_s, aux_add, inv_sq)))
    print(json.dumps({"check": "int8_bm_max_finite", "value": bm_max}), flush=True)

    # e2e context
    t = timeit(
        functools.partial(topk2.topk_two_phase, k=k, metric="cosine"),
        corpus, queries, aux_mul, aux_add, iters=8,
    )
    print(json.dumps({"variant": "e2e_fp32", "ms": round(t * 1e3, 3),
                      "qps": round(1024 / t, 1)}), flush=True)

    jf = functools.partial(topk2.topk_two_phase, k=k, metric="cosine",
                           corpus_scan_int8=(v8, sv))
    t = timeit(jf, corpus, queries, aux_mul, aux_add, iters=8)
    print(json.dumps({"variant": "e2e_int8", "ms": round(t * 1e3, 3),
                      "qps": round(1024 / t, 1)}), flush=True)

    # int8 exactness at k: recall vs fp32 exact on-chip
    d_ref, i_ref = topk2.topk_two_phase(corpus, queries, aux_mul, aux_add,
                                        k=k, metric="cosine")
    d_q, i_q = jf(corpus, queries, aux_mul, aux_add)
    i_ref_np, i_q_np = np.asarray(i_ref), np.asarray(i_q)
    recall = float(np.mean([
        len(set(i_ref_np[r]) & set(i_q_np[r])) / len(set(i_ref_np[r]))
        for r in range(i_ref_np.shape[0])
    ]))
    print(json.dumps({"check": "int8_recall_at_16_vs_fp32", "value": round(recall, 5)}),
          flush=True)


if __name__ == "__main__":
    main()
