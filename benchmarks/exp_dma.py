"""Pallas input-DMA pipeline: why does the bigq kernel stream at ~90 GB/s?

exp_decomp pinned the large-Q phase-1 floor on the corpus DMA itself
(k_dma_only 6.5 ms ≈ k_full 5.3 ms for a 512 MB read the XLA oneshot
streams at 522 GB/s). Hypothesis: grid=(ni, nj) puts the corpus-block
stream on the OUTER grid dim (nj=1 inner), and Mosaic only overlaps
DMA with compute across the INNERMOST steps — so every corpus block is
a synchronous fetch. Variants:

  g2_outer   — grid (ni, 1), corpus indexed by outer dim  [production]
  g1         — grid (ni,), 1-D, corpus on the only (inner) dim
  g2_inner   — grid (1, ni), corpus indexed by inner dim
  g1_bn8192  — 1-D with 4 MB blocks (DMA-latency check)
  full_g1    — the real kernel body on the best grid

    python -m benchmarks.exp_dma
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


def dma_kernel(queries_p, corpus, aux_mul, aux_add, grid_mode, bn, body):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    qt, d = queries_p.shape
    n = corpus.shape[0]
    ni = n // bn
    bpb = bn // BUCKET

    if grid_mode == "g2_outer":
        grid = (ni, 1)
        vmap_ = lambda i, j: (i, 0)
        qmap = lambda i, j: (j, 0)
        omap = lambda i, j: (i, j)
        amap = lambda i, j: (i,)
    elif grid_mode == "g2_inner":
        grid = (1, ni)
        vmap_ = lambda i, j: (j, 0)
        qmap = lambda i, j: (i, 0)
        omap = lambda i, j: (j, i)
        amap = lambda i, j: (j,)
    else:  # 1-D
        grid = (ni,)
        vmap_ = lambda i: (i, 0)
        qmap = lambda i: (0, 0)
        omap = lambda i: (i, 0)
        amap = lambda i: (i,)

    def kernel(q_ref, v_ref, mul_ref, add_ref, out_ref):
        if body == "dma":
            out_ref[:, :] = jnp.zeros((bpb, BQ), jnp.float32) + v_ref[0, 0]
            return
        s = jax.lax.dot_general(
            v_ref[:], q_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * mul_ref[:][:, None] + add_ref[:][:, None]
        for j in range(bpb):
            out_ref[j, :] = jnp.max(s[j * BUCKET : (j + 1) * BUCKET], axis=0)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BQ, d), qmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), vmap_, memory_space=pltpu.VMEM),
            pl.BlockSpec((bn,), amap, memory_space=pltpu.VMEM),
            pl.BlockSpec((bn,), amap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bpb, BQ), omap, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // BUCKET, qt), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * qt * d,
            bytes_accessed=n * d * 4 + n * 8 + qt * d * 4 + (n // BUCKET) * qt * 4,
            transcendentals=0,
        ),
    )(queries_p, corpus, aux_mul, aux_add)


@functools.partial(jax.jit, static_argnames=("grid_mode", "bn", "body"))
def k_scalar(qp, corpus, aux_mul, aux_add, grid_mode, bn, body):
    return jnp.max(dma_kernel(qp, corpus, aux_mul, aux_add, grid_mode, bn, body))


def main():
    dev = jax.devices()[0]
    print(f"device: {getattr(dev, 'device_kind', dev)}", flush=True)

    n, d = 1_048_576, 128
    rng = np.random.default_rng(0)
    corpus = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    aux_mul, aux_add = topk2.prepare_aux(corpus, None, "cosine")
    qp = topk2.prepare_queries(
        jnp.asarray(rng.standard_normal((1024, d)).astype(np.float32)), "cosine")
    fence(qp[0, 0])
    gb = n * d * 4 / 1e9

    for name, grid_mode, bn, body in (
        ("dma_g2_outer_bn2048", "g2_outer", 2048, "dma"),
        ("dma_g1_bn2048", "g1", 2048, "dma"),
        ("dma_g2_inner_bn2048", "g2_inner", 2048, "dma"),
        ("dma_g1_bn8192", "g1", 8192, "dma"),
        ("full_g1_bn2048", "g1", 2048, "full"),
        ("full_g2_inner_bn2048", "g2_inner", 2048, "full"),
    ):
        try:
            t = timeit(k_scalar, qp, corpus, aux_mul, aux_add, grid_mode, bn, body,
                       iters=8)
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:160]}), flush=True)
            continue
        print(json.dumps({"variant": name, "ms": round(t * 1e3, 3),
                          "gb_per_s": round(gb / t, 1)}), flush=True)

    # correctness: full_g1 must match production kernel output
    got = dma_kernel(qp, corpus, aux_mul, aux_add, "g1", 2048, "full")
    prod = topk2.bucket_scores_pallas_bigq(qp, corpus, aux_mul, aux_add, bucket=BUCKET)
    md = float(np.asarray(jnp.max(jnp.abs(got.T - prod))))
    print(json.dumps({"check": "full_g1_matches_prod", "maxdiff": md}), flush=True)


if __name__ == "__main__":
    main()
