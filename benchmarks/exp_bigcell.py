"""Bigger bigq grid cells via slicewise dots (per-cell overhead attack).

exp_int8_slice pinned the phase-1 floor: fp32/int8/bf16 all run
~5.3 ms at Q=1024/1M = ~10 µs per (2048, 1024) grid cell, far above
the MXU (2.7 µs) + DMA (1.3 µs) components — fixed per-cell overhead
dominates. The [BN, BQ] f32 score tile (8 MB) is what caps BN at 2048.
Slicing the dot inside the kernel ([S, D]×[D, BQ] per slice, bucket-max
immediately) keeps only [S, BQ] tiles live, so BN can grow 2-8× and the
cell count (→ overhead) shrinks accordingly.

    python -m benchmarks.exp_bigcell
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
BQ = 1024


def sliced_kernel(queries_p, corpus, aux_mul, aux_add, bn, srows, int8_inv_sq=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    qt, d = queries_p.shape
    n = corpus.shape[0]
    ni, nj = n // bn, qt // BQ
    bpb = bn // BUCKET
    spb = srows // BUCKET
    int8_mode = int8_inv_sq is not None

    def kernel(q_ref, v_ref, mul_ref, add_ref, *rest):
        if int8_mode:
            inv_sq_ref, out_ref = rest
            inv_sq_row = inv_sq_ref[pl.program_id(1), :]
        else:
            (out_ref,) = rest
        for t in range(bn // srows):
            sl = slice(t * srows, (t + 1) * srows)
            s = jax.lax.dot_general(
                v_ref[sl], q_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32 if int8_mode else jnp.float32,
            )  # [S, BQ]
            if int8_mode:
                s = (
                    s.astype(jnp.float32) * mul_ref[sl][:, None]
                    + add_ref[sl][:, None] * inv_sq_row[None, :]
                )
            else:
                s = s * mul_ref[sl][:, None] + add_ref[sl][:, None]
            out_ref[t * spb : (t + 1) * spb, :] = s.reshape(spb, BUCKET, BQ).max(axis=1)

    in_specs = [
        pl.BlockSpec((BQ, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bn,), lambda i, j: (i,), memory_space=pltpu.VMEM),
        pl.BlockSpec((bn,), lambda i, j: (i,), memory_space=pltpu.VMEM),
    ]
    args = [queries_p, corpus, aux_mul, aux_add]
    if int8_mode:
        in_specs.append(pl.BlockSpec((nj, BQ), lambda i, j: (0, 0), memory_space=pltpu.VMEM))
        args.append(int8_inv_sq.reshape(nj, BQ))

    itemsize = corpus.dtype.itemsize
    return pl.pallas_call(
        kernel,
        grid=(ni, nj),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bpb, BQ), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // BUCKET, qt), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * qt * d,
            bytes_accessed=n * d * itemsize + n * 8 + qt * d * itemsize * ni
            + (n // BUCKET) * qt * 4,
            transcendentals=0,
        ),
    )(*args)


@functools.partial(jax.jit, static_argnames=("bn", "srows"))
def f32_scalar(qp, corpus, aux_mul, aux_add, bn, srows):
    return jnp.max(sliced_kernel(qp, corpus, aux_mul, aux_add, bn, srows))


@functools.partial(jax.jit, static_argnames=("bn", "srows"))
def f32_bm(qp, corpus, aux_mul, aux_add, bn, srows):
    return sliced_kernel(qp, corpus, aux_mul, aux_add, bn, srows)


@functools.partial(jax.jit, static_argnames=("bn", "srows"))
def int8_scalar(q8, v8, aux_mul_s, aux_add, inv_sq, bn, srows):
    return jnp.max(sliced_kernel(q8, v8, aux_mul_s, aux_add, bn, srows, inv_sq))


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
    fence(q8[0, 0])

    # correctness anchor: sliced (2048, 512) must equal the production kernel
    prod = topk2.bucket_scores_pallas_bigq(qp, corpus, aux_mul, aux_add,
                                           bucket=BUCKET)
    got = f32_bm(qp, corpus, aux_mul, aux_add, 2048, 512)  # [nb, qt]
    md = float(np.asarray(jnp.max(jnp.abs(got.T - prod))))
    print(json.dumps({"check": "sliced_matches_prod", "maxdiff": md}), flush=True)

    for bn, srows in ((2048, 512), (4096, 512), (4096, 1024), (8192, 512)):
        try:
            t = timeit(f32_scalar, qp, corpus, aux_mul, aux_add, bn, srows, iters=8)
        except Exception as e:
            print(json.dumps({"variant": f"f32_bn{bn}_s{srows}", "error": str(e)[:160]}),
                  flush=True)
            continue
        print(json.dumps({"variant": f"f32_bn{bn}_s{srows}", "ms": round(t * 1e3, 3)}),
              flush=True)

    for bn, srows in ((4096, 512), (8192, 512), (16384, 512)):
        try:
            t = timeit(int8_scalar, q8, v8, aux_mul_s, aux_add, inv_sq, bn, srows, iters=8)
        except Exception as e:
            print(json.dumps({"variant": f"int8_bn{bn}_s{srows}", "error": str(e)[:160]}),
                  flush=True)
            continue
        print(json.dumps({"variant": f"int8_bn{bn}_s{srows}", "ms": round(t * 1e3, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
