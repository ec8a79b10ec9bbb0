"""Sustained on-device scan rate + small-Q Pallas phase-1 sweep.

Two questions (docs/DESIGN.md "remaining known headroom"):

1. What does the 1M Q=8 scan run at when the fixed per-dispatch tunnel
   cost is amortized INSIDE one dispatch (``lax.scan`` over query
   batches — one enqueue, one fetch)? This is the kernel's sustained
   rate, the number the HBM-roofline target actually speaks about.
2. Can a Pallas fused phase 1 with queries padded to one 128-lane tile
   beat the oneshot dot at small Q by skipping the [N, Q] HBM
   intermediate (12.5% extra traffic at Q=8)? Sweep row-block sizes.

    python -m benchmarks.exp_sustained
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


def timeit(fn, iters=4):
    out = fn()
    fence(out[0] if isinstance(out, tuple) else out)
    start = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    fence(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - start) / iters


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def sustained_two_phase(corpus, qbatches, aux_mul, aux_add, k, metric):
    """lax.scan over [I, Q, D] query batches — one device dispatch."""

    def body(_, q):
        d, i = topk2.topk_two_phase(corpus, q, aux_mul, aux_add, k=k, metric=metric)
        return None, (d, i)

    _, (dist, ids) = jax.lax.scan(body, None, qbatches)
    return dist, ids


def small_q_pallas(queries_pad, corpus, aux_mul, aux_add, bn):
    """Phase 1 via the bigq kernel machinery at BQ=128 (one lane tile)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    qt, d = queries_pad.shape
    n = corpus.shape[0]
    bucket = topk2.BUCKET
    assert qt == 128 and n % bn == 0
    ni = n // bn
    bpb = bn // bucket
    kernel = topk2._make_bigq_kernel(bn, bucket, False)
    out = pl.pallas_call(
        kernel,
        grid=(ni, 1),
        in_specs=[
            pl.BlockSpec((qt, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn,), lambda i, j: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn,), lambda i, j: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bpb, qt), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // bucket, qt), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * qt * d,
            bytes_accessed=n * d * 4 + n * 8 + qt * d * 4 + (n // bucket) * qt * 4,
            transcendentals=0,
        ),
    )(queries_pad, corpus, aux_mul, aux_add)
    return out.T


def main():
    dev = jax.devices()[0]
    print(f"device: {getattr(dev, 'device_kind', dev)}", flush=True)

    n, d, k = 1_048_576, 128, 16
    rng = np.random.default_rng(0)
    corpus = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    aux_mul, aux_add = topk2.prepare_aux(corpus, None, "cosine")
    fence(aux_add[0])

    # --- 1. per-dispatch vs sustained, 1M Q=8 ------------------------------
    q8 = jnp.asarray(rng.standard_normal((8, d)).astype(np.float32))
    t_disp = timeit(
        lambda: topk2.topk_two_phase(corpus, q8, aux_mul, aux_add, k=k, metric="cosine"),
        iters=20,
    )
    print(json.dumps({"variant": "1M_q8_per_dispatch", "ms": round(t_disp * 1e3, 3),
                      "rows_per_s_M": round(n / t_disp / 1e6, 1)}), flush=True)

    for i_inner in (16, 64):
        qb = jnp.asarray(rng.standard_normal((i_inner, 8, d)).astype(np.float32))
        t = timeit(
            lambda qb=qb: sustained_two_phase(corpus, qb, aux_mul, aux_add, k, "cosine"),
            iters=4,
        )
        per = t / i_inner
        print(json.dumps({"variant": f"1M_q8_sustained_x{i_inner}",
                          "ms_per_scan": round(per * 1e3, 3),
                          "rows_per_s_M": round(n / per / 1e6, 1),
                          "gb_per_s": round(n * d * 4 / per / 1e9, 1)}), flush=True)

    # --- 2. small-Q Pallas phase 1 (BQ=128) vs oneshot dot ------------------
    qp8 = topk2.prepare_queries(q8, "cosine")
    qpad = jnp.zeros((128, d), jnp.float32).at[:8].set(qp8)
    fence(qpad[0, 0])

    t_one = timeit(lambda: topk2.bucket_scores_xla(qp8, corpus, aux_mul, aux_add), iters=10)
    print(json.dumps({"variant": "p1_oneshot_q8", "ms": round(t_one * 1e3, 3),
                      "gb_per_s": round(n * d * 4 / t_one / 1e9, 1)}), flush=True)

    ref = None
    for bn in (2048, 4096, 8192):
        jf = jax.jit(functools.partial(small_q_pallas, bn=bn))
        try:
            t = timeit(lambda: jf(qpad, corpus, aux_mul, aux_add), iters=10)
        except Exception as e:  # VMEM overflow etc.
            print(json.dumps({"variant": f"p1_pallas_q128_bn{bn}", "error": str(e)[:120]}),
                  flush=True)
            continue
        out = np.asarray(jf(qpad, corpus, aux_mul, aux_add))[:8]
        if ref is None:
            ref = np.asarray(topk2.bucket_scores_xla(qp8, corpus, aux_mul, aux_add))
        ok = bool(np.allclose(out, ref, atol=1e-3, rtol=1e-4))
        print(json.dumps({"variant": f"p1_pallas_q128_bn{bn}", "ms": round(t * 1e3, 3),
                          "gb_per_s": round(n * d * 4 / t / 1e9, 1), "match": ok}),
              flush=True)

    # --- 3. sustained 8M Q=8 (fp32) — roofline anchor -----------------------
    n8 = 8 * 1_048_576
    corpus8 = jax.random.normal(jax.random.PRNGKey(7), (n8, d), dtype=jnp.float32)
    am8, aa8 = topk2.prepare_aux(corpus8, None, "cosine")
    fence(aa8[0])
    qb = jnp.asarray(rng.standard_normal((8, 8, d)).astype(np.float32))
    t = timeit(lambda: sustained_two_phase(corpus8, qb, am8, aa8, k, "cosine"), iters=3)
    per = t / 8
    print(json.dumps({"variant": "8M_q8_sustained_x8", "ms_per_scan": round(per * 1e3, 3),
                      "rows_per_s_M": round(n8 / per / 1e6, 1),
                      "gb_per_s": round(n8 * d * 4 / per / 1e9, 1)}), flush=True)


if __name__ == "__main__":
    main()
