"""Decompose the large-Q phase-1 kernel's 5.3 ms (Q=1024, 1M×128).

Neither dtype (fp32/bf16/int8 all ~5.3 ms) nor cell size (bn 2048→4096
only −10%) moves the floor, so it isn't MXU, DMA bandwidth, or fixed
per-cell overhead. Isolate the pieces:

  dma_only   — corpus blocks DMA'd, trivial body        → DMA pipeline floor
  dot_only   — + matmul + bucket max, NO epilogue       → MXU + reduce
  full       — + scale/add epilogue (production)        → epilogue cost
  full_T     — + the 128 MB [nb, qt] → [qt, nb] transpose XLA inserts
               for the production return layout          → transpose cost

Then the two consumers that would let the transpose die:
  sel_prod        — topk_buckets on [qt, nb] (needs the transpose)
  sel_notranspose — same selection computed straight off [nb, qt]

    python -m benchmarks.exp_decomp
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from fenix_tpu.ops import topk2
from fenix_tpu.ops.distance import NEG_INF


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


def kernel_variant(queries_p, corpus, aux_mul, aux_add, mode):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    qt, d = queries_p.shape
    n = corpus.shape[0]
    ni, nj = n // BN, qt // BQ
    bpb = BN // BUCKET

    def kernel(q_ref, v_ref, mul_ref, add_ref, out_ref):
        if mode == "dma_only":
            out_ref[:, :] = jnp.zeros((bpb, BQ), jnp.float32) + v_ref[0, 0]
            return
        s = jax.lax.dot_general(
            v_ref[:], q_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if mode != "dot_only":
            s = s * mul_ref[:][:, None] + add_ref[:][:, None]
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
def k_scalar(qp, corpus, aux_mul, aux_add, mode):
    return jnp.max(kernel_variant(qp, corpus, aux_mul, aux_add, mode))


@jax.jit
def k_full_T(qp, corpus, aux_mul, aux_add):
    bm = kernel_variant(qp, corpus, aux_mul, aux_add, "full").T
    # consume the transposed layout so it can't be elided
    return jnp.max(bm[:, ::7])


_SEL_GROUP = 128


@functools.partial(jax.jit, static_argnames=("kp",))
def sel_notranspose(bm_nb_q, kp):
    """topk_buckets semantics computed directly on [nb, Q] layout."""
    nb, q = bm_nb_q.shape
    g = nb // _SEL_GROUP
    grouped = bm_nb_q.reshape(g, _SEL_GROUP, q)
    gmax = grouped.max(axis=1)  # [g, Q]
    kg = min(kp, g)
    _, gidx = jax.lax.top_k(gmax.T, kg)  # [Q, kg] — small transpose only
    gidx = jnp.sort(gidx, axis=-1)
    # per-query gather of kg groups: [Q, kg, 128]
    cand = jnp.take_along_axis(
        grouped.transpose(2, 0, 1),  # [Q, g, 128] — logical; XLA fuses into gather
        gidx[:, :, None],
        axis=1,
    )
    cand = cand.reshape(q, kg * _SEL_GROUP)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _SEL_GROUP), 2)
    cand_ids = (gidx[:, :, None] * _SEL_GROUP + lane).reshape(q, kg * _SEL_GROUP)
    _, pos = jax.lax.top_k(cand, kp)
    bidx = jnp.take_along_axis(cand_ids, pos, axis=1)
    return jnp.minimum(bidx, nb - 1)


def main():
    dev = jax.devices()[0]
    print(f"device: {getattr(dev, 'device_kind', dev)}", flush=True)

    n, d, k = 1_048_576, 128, 16
    kp = k + topk2.BUCKET_PAD
    rng = np.random.default_rng(0)
    corpus = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    aux_mul, aux_add = topk2.prepare_aux(corpus, None, "cosine")
    queries = jnp.asarray(rng.standard_normal((1024, d)).astype(np.float32))
    qp = topk2.prepare_queries(queries, "cosine")
    fence(qp[0, 0])

    for mode in ("dma_only", "dot_only", "full"):
        t = timeit(k_scalar, qp, corpus, aux_mul, aux_add, mode, iters=8)
        print(json.dumps({"variant": f"k_{mode}", "ms": round(t * 1e3, 3)}), flush=True)

    t = timeit(k_full_T, qp, corpus, aux_mul, aux_add, iters=8)
    print(json.dumps({"variant": "k_full_T", "ms": round(t * 1e3, 3)}), flush=True)

    # selection on both layouts (device-resident inputs)
    bm_nbq = kernel_variant(qp, corpus, aux_mul, aux_add, "full")
    bm_qnb = bm_nbq.T
    bm_nbq, bm_qnb = jax.device_put(bm_nbq), jax.device_put(bm_qnb)
    fence(bm_qnb[0, 0])

    jsel1 = jax.jit(functools.partial(topk2.topk_buckets, kp=kp))
    ref = np.sort(np.asarray(jsel1(bm_qnb)), axis=1)
    t = timeit(jsel1, bm_qnb, iters=16)
    print(json.dumps({"variant": "sel_prod", "ms": round(t * 1e3, 3)}), flush=True)

    got = np.sort(np.asarray(sel_notranspose(bm_nbq, kp)), axis=1)
    t = timeit(functools.partial(sel_notranspose, kp=kp), bm_nbq, iters=16)
    print(json.dumps({"variant": "sel_notranspose", "ms": round(t * 1e3, 3),
                      "match": bool(np.array_equal(got, ref))}), flush=True)


if __name__ == "__main__":
    main()
