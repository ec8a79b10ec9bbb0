"""Large-Q phase-1 kernel reduction + phase-2 selection variants.

docs/DESIGN.md: at Q=1024 the floor is per-grid-cell overhead in the
bigq kernel plus phase-2 selection (~3 ms). Variants measured here:

A. bigq kernel, production unrolled per-bucket max loop (baseline)
B. bigq kernel, reshape max: s.reshape(-1, bucket, bq).max(axis=1)
C. bigq kernel emitting a SECOND output: per-cell (row-block) maxima —
   a free selection hierarchy level (group-max never re-read from HBM)
D. selection: production topk_buckets on a precomputed bucket_max
E. selection: iterative max+min-id (kp passes, no sort)
F. selection: jax.lax.approx_max_k (TPU PartialReduce op), timing +
   empirical exactness on random data
G. e2e: production topk_two_phase fp32 (context)

    python -m benchmarks.exp_bigq_reduce
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


def timeit(fn, iters=8):
    out = fn()
    fence(out[0] if isinstance(out, tuple) else out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn()
    fence(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - start) / iters


def bigq_variant(queries_p, corpus, aux_mul, aux_add, mode):
    """bigq phase 1 with selectable in-kernel reduction shape."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    qt, d = queries_p.shape
    n = corpus.shape[0]
    bucket = topk2.BUCKET_LARGE_Q
    bn, bq = 2048, 1024
    ni, nj = n // bn, qt // bq
    bpb = bn // bucket

    if mode == "loop":
        kernel = topk2._make_bigq_kernel(bn, bucket, False)
    elif mode == "reshape":

        def kernel(q_ref, v_ref, mul_ref, add_ref, out_ref):
            s = jax.lax.dot_general(
                v_ref[:], q_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s * mul_ref[:][:, None] + add_ref[:][:, None]
            out_ref[:, :] = s.reshape(bpb, bucket, bq).max(axis=1)

    elif mode == "twolevel":

        def kernel(q_ref, v_ref, mul_ref, add_ref, out_ref, cell_ref):
            s = jax.lax.dot_general(
                v_ref[:], q_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s * mul_ref[:][:, None] + add_ref[:][:, None]
            bm = s.reshape(bpb, bucket, bq).max(axis=1)
            out_ref[:, :] = bm
            cell_ref[0, :] = jnp.max(bm, axis=0)

    out_shapes = jax.ShapeDtypeStruct((n // bucket, qt), jnp.float32)
    out_specs = pl.BlockSpec((bpb, bq), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    if mode == "twolevel":
        out_shapes = (out_shapes, jax.ShapeDtypeStruct((ni, qt), jnp.float32))
        out_specs = (out_specs,
                     pl.BlockSpec((1, bq), lambda i, j: (i, j), memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        kernel,
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec((bq, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn,), lambda i, j: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn,), lambda i, j: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * qt * d,
            bytes_accessed=n * d * 4 + n * 8 + qt * d * 4 * ni + (n // bucket) * qt * 4,
            transcendentals=0,
        ),
    )(queries_p, corpus, aux_mul, aux_add)
    if mode == "twolevel":
        return out[0].T, out[1].T  # [QT, nb], [QT, ni]
    return out.T


@functools.partial(jax.jit, static_argnames=("kp",))
def sel_hier(bucket_max, kp):
    return topk2.topk_buckets(bucket_max, kp)


@functools.partial(jax.jit, static_argnames=("kp",))
def sel_iter(bucket_max, kp):
    """kp passes of max + min-index — no sort anywhere."""
    q, nb = bucket_max.shape
    ids = jnp.broadcast_to(jnp.arange(nb, dtype=jnp.int32)[None, :], (q, nb))
    _, bidx = topk2.topk_values_min_id(bucket_max, ids, kp)
    return bidx


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

    # --- kernel variants ----------------------------------------------------
    ref_bm = None
    for mode in ("loop", "reshape", "twolevel"):
        jf = jax.jit(functools.partial(bigq_variant, mode=mode))
        try:
            t = timeit(lambda: jf(qp, corpus, aux_mul, aux_add), iters=8)
        except Exception as e:
            print(json.dumps({"variant": f"p1_{mode}", "error": str(e)[:200]}), flush=True)
            continue
        out = jf(qp, corpus, aux_mul, aux_add)
        bm = np.asarray(out[0] if mode == "twolevel" else out)
        if ref_bm is None:
            ref_bm = bm
        print(json.dumps({"variant": f"p1_{mode}", "ms": round(t * 1e3, 3),
                          "match": bool(np.array_equal(bm, ref_bm))}), flush=True)

    # --- selection variants over precomputed bucket_max ---------------------
    bucket_max = jnp.asarray(ref_bm)
    fence(bucket_max[0, 0])

    ref_sel = np.asarray(sel_hier(bucket_max, kp))
    t = timeit(lambda: sel_hier(bucket_max, kp), iters=8)
    print(json.dumps({"variant": "sel_hier", "ms": round(t * 1e3, 3)}), flush=True)

    out = np.sort(np.asarray(sel_iter(bucket_max, kp)), axis=1)
    t = timeit(lambda: sel_iter(bucket_max, kp), iters=8)
    print(json.dumps({"variant": "sel_iter", "ms": round(t * 1e3, 3),
                      "match": bool(np.array_equal(out, np.sort(ref_sel, axis=1)))}),
          flush=True)

    for rt in (0.95, 0.99):
        jf = jax.jit(functools.partial(jax.lax.approx_max_k, k=kp, recall_target=rt))
        t = timeit(lambda: jf(bucket_max), iters=8)
        _, idx = jf(bucket_max)
        got = np.sort(np.asarray(idx), axis=1)
        exact = float((got == np.sort(ref_sel, axis=1)).all(axis=1).mean())
        print(json.dumps({"variant": f"sel_approx_{rt}", "ms": round(t * 1e3, 3),
                          "frac_rows_exact": round(exact, 4)}), flush=True)

    # --- e2e context ---------------------------------------------------------
    t = timeit(lambda: topk2.topk_two_phase(corpus, queries, aux_mul, aux_add,
                                            k=k, metric="cosine"), iters=8)
    print(json.dumps({"variant": "e2e_two_phase_fp32", "ms": round(t * 1e3, 3),
                      "qps": round(1024 / t, 1)}), flush=True)


if __name__ == "__main__":
    main()
