"""Isolate the bigq kernel's ~4.4 ms floor: input stream vs output write.

exp_dma: every grid shape / block size lands at ~122 GB/s, but int8
(¼ the input bytes) times the same as fp32 — so the floor is NOT the
corpus read. The one constant across all variants: the [nb=32768,
Q=1024] f32 output (128 MB per call). Variants (1-D grid, bn=2048
unless noted):

  in_only_tiny_out   — corpus in, (8, 128) out block      → input floor
  in_only_full_out   — corpus in, (64, 1024) out block    → +output cost
  out_only           — no corpus read (index map pins block 0), full out
  in8192_tiny_out    — 4 MB blocks, tiny out
  full_tiny_out      — real body, bucket max, but only 1 of 64 rows written
                       (what phase 1 could look like if the output shrank)

    python -m benchmarks.exp_dma2
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


def kvariant(queries_p, corpus, mode, bn):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    qt, d = queries_p.shape
    n = corpus.shape[0]
    ni = n // bn
    bpb = bn // BUCKET

    tiny_out = mode in ("in_only_tiny_out", "in8192_tiny_out", "full_tiny_out")
    read_corpus = mode != "out_only"

    def kernel(q_ref, v_ref, out_ref):
        if mode == "full_tiny_out":
            s = jax.lax.dot_general(
                v_ref[:], q_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = jnp.max(s.reshape(bpb, BUCKET, BQ).max(axis=1), axis=0)  # [BQ]
            out_ref[:, :] = jnp.broadcast_to(m[:128][None, :], (8, 128))
        elif tiny_out:
            out_ref[:, :] = jnp.zeros((8, 128), jnp.float32) + v_ref[0, 0]
        elif mode == "out_only":
            out_ref[:, :] = jnp.zeros((bpb, BQ), jnp.float32) + q_ref[0, 0]
        else:  # in_only_full_out
            out_ref[:, :] = jnp.zeros((bpb, BQ), jnp.float32) + v_ref[0, 0]

    vmap_ = (lambda i: (i, 0)) if read_corpus else (lambda i: (0, 0))
    if tiny_out:
        out_specs = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((ni * 8, 128), jnp.float32)
    else:
        out_specs = pl.BlockSpec((bpb, BQ), lambda i: (i, 0), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n // BUCKET, qt), jnp.float32)

    return pl.pallas_call(
        kernel,
        grid=(ni,),
        in_specs=[
            pl.BlockSpec((BQ, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), vmap_, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * qt * d,
            bytes_accessed=n * d * 4,
            transcendentals=0,
        ),
    )(queries_p, corpus)


@functools.partial(jax.jit, static_argnames=("mode", "bn"))
def k_scalar(qp, corpus, mode, bn):
    return jnp.max(kvariant(qp, corpus, mode, bn))


def main():
    dev = jax.devices()[0]
    print(f"device: {getattr(dev, 'device_kind', dev)}", flush=True)

    n, d = 1_048_576, 128
    rng = np.random.default_rng(0)
    corpus = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    qp = topk2.prepare_queries(
        jnp.asarray(rng.standard_normal((1024, d)).astype(np.float32)), "cosine")
    fence(qp[0, 0])
    gb = n * d * 4 / 1e9

    for name, mode, bn in (
        ("in_only_tiny_out", "in_only_tiny_out", 2048),
        ("in_only_full_out", "in_only_full_out", 2048),
        ("out_only", "out_only", 2048),
        ("in8192_tiny_out", "in8192_tiny_out", 8192),
        ("full_tiny_out", "full_tiny_out", 2048),
    ):
        try:
            t = timeit(k_scalar, qp, corpus, mode, bn, iters=8)
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:160]}), flush=True)
            continue
        print(json.dumps({"variant": name, "ms": round(t * 1e3, 3),
                          "corpus_gb_per_s": round(gb / t, 1)}), flush=True)


if __name__ == "__main__":
    main()
