"""Live-chip trial of the big-Q Pallas fused bucket-max kernel.

Compares bucket_scores_pallas_bigq against the production fusable-scan
phase 1 at Q=1024 over 1M x 128, fp32 and bf16, with a REAL consumer
(topk_buckets) so nothing fuses away. Mosaic compile may take 10-30
min in this environment — run alone, never kill an in-flight compile.

    python -m benchmarks.exp_pallas_bigq
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from fenix_tpu.ops import topk2


@functools.partial(jax.jit, static_argnames=("kp",))
def scan_then_select(qp, corpus, am, aa, kp):
    bm = topk2.bucket_scores_scan(qp, corpus, am, aa, 128)
    return jnp.sum(topk2.topk_buckets(bm, kp))


@functools.partial(jax.jit, static_argnames=("kp",))
def pallas_then_select(qp, corpus, am, aa, kp):
    bm = topk2.bucket_scores_pallas_bigq(qp, corpus, am, aa)
    return jnp.sum(topk2.topk_buckets(bm, kp))


def timeit(fn, *args, iters=10):
    np.asarray(fn(*args))
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - start) / iters


def main():
    n, d, kp = 1_048_576, 128, 24
    corpus = jax.random.normal(jax.random.PRNGKey(0), (n, d), dtype=jnp.float32)
    am, aa = topk2.prepare_aux(corpus, None, "cosine")
    qp = jax.random.normal(jax.random.PRNGKey(1), (1024, d), dtype=jnp.float32)
    cb = corpus.astype(jnp.bfloat16)
    qb = qp.astype(jnp.bfloat16)
    np.asarray(cb[0, 0])

    t = timeit(scan_then_select, qp, corpus, am, aa, kp)
    print(json.dumps({"variant": "scan_fp32", "ms": round(t * 1e3, 2)}), flush=True)

    t = timeit(scan_then_select, qb, cb, am, aa, kp)
    print(json.dumps({"variant": "scan_bf16", "ms": round(t * 1e3, 2)}), flush=True)

    print("compiling pallas fp32 (may take many minutes)...", flush=True)
    t0 = time.perf_counter()
    t = timeit(pallas_then_select, qp, corpus, am, aa, kp)
    print(json.dumps({"variant": "pallas_fp32", "ms": round(t * 1e3, 2),
                      "compile_s": round(time.perf_counter() - t0, 1)}), flush=True)

    print("compiling pallas bf16...", flush=True)
    t0 = time.perf_counter()
    t = timeit(pallas_then_select, qb, cb, am, aa, kp)
    print(json.dumps({"variant": "pallas_bf16", "ms": round(t * 1e3, 2),
                      "compile_s": round(time.perf_counter() - t0, 1)}), flush=True)

    # correctness on chip
    bm_scan = np.asarray(topk2.bucket_scores_scan(qp[:64], corpus, am, aa, 128))
    bm_pal = np.asarray(topk2.bucket_scores_pallas_bigq(
        jnp.concatenate([qp[:64]] * 4), corpus, am, aa))[:64]
    print(json.dumps({"pallas_matches_scan": bool(np.allclose(bm_scan, bm_pal, rtol=1e-5, atol=1e-5))}), flush=True)


if __name__ == "__main__":
    main()
