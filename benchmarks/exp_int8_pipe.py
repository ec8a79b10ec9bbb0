"""int8 two-phase pipeline decomposition at 8M (post-acc_t fix).

bench.py: int8 sustained = 3.63 ms/scan at 8M.  Isolated phase 1
(dot+FMA+bucket-max, f32 acc, single reduce consumer) = 1.98 ms
(exp_int8_fuse2 bucket_fma).  Decompose where the other 1.65 ms goes:

  A  phase1, consumer = max over buckets (known-fused anchor)
  B  phase1, full [Q, nb] bucket-max written out (materialization?)
  C  B + topk_buckets selection (selection cost?)
  D  full topk_two_phase (adds sort+gather+rescore)
  E  D with fp32 (reference decomposition)

    python -m benchmarks.exp_int8_pipe
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from fenix_tpu.ops import topk2

INNER = 16


def fence(x):
    return np.asarray(x)


def timeit(fn, iters=4):
    fence(fn())
    start = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    fence(out)
    return (time.perf_counter() - start) / iters


def main():
    dev = jax.devices()[0]
    print(f"device: {getattr(dev, 'device_kind', dev)}", flush=True)
    rng = np.random.default_rng(0)
    n, d, k = 8 * 1_048_576, 128, 16

    corpus = jax.random.normal(jax.random.PRNGKey(3), (n, d), dtype=jnp.float32)
    aux_mul, aux_add = topk2.prepare_aux(corpus, None, "cosine")
    v8, sv = topk2.quantize_corpus_int8(corpus)
    mul_s = aux_mul * sv
    qs = jnp.asarray(rng.standard_normal((INNER, 8, d)).astype(np.float32))
    fence(v8[0, 0])
    bucket = 128
    kp = min(k + topk2.BUCKET_PAD * 2, n // bucket)

    def scan_over(fn, *arrs):
        @jax.jit
        def run(qb, *a):
            def body(_, q):
                return None, fn(q, *a)

            _, out = lax.scan(body, None, qb)
            return out

        return timeit(lambda: run(qs, *arrs), iters=4) / INNER

    def p1(q, vv, mm, aa):
        qp = topk2.prepare_queries(q, "cosine")
        q8, inv_sq = topk2.quantize_queries_int8(qp)
        return topk2.bucket_scores_scan_int8(q8, vv, mm, aa, inv_sq, bucket)

    t = scan_over(lambda q, vv, mm, aa: p1(q, vv, mm, aa).max(axis=1), v8, mul_s, aux_add)
    print(json.dumps({"variant": "A_p1_maxreduce", "ms": round(t * 1e3, 3),
                      "rows_per_s_B": round(n / t / 1e9, 2)}), flush=True)

    t = scan_over(p1, v8, mul_s, aux_add)
    print(json.dumps({"variant": "B_p1_full_bm_out", "ms": round(t * 1e3, 3),
                      "rows_per_s_B": round(n / t / 1e9, 2)}), flush=True)

    t = scan_over(lambda q, vv, mm, aa: topk2.topk_buckets(p1(q, vv, mm, aa), kp),
                  v8, mul_s, aux_add)
    print(json.dumps({"variant": "C_p1_select", "ms": round(t * 1e3, 3),
                      "rows_per_s_B": round(n / t / 1e9, 2)}), flush=True)

    t = scan_over(
        lambda q, cc, mm, aa, vv, ss: topk2.topk_two_phase(
            cc, q, mm, aa, k=k, metric="cosine", corpus_scan_int8=(vv, ss)),
        corpus, aux_mul, aux_add, v8, sv)
    print(json.dumps({"variant": "D_full_int8", "ms": round(t * 1e3, 3),
                      "rows_per_s_B": round(n / t / 1e9, 2)}), flush=True)

    t = scan_over(
        lambda q, cc, mm, aa: topk2.topk_two_phase(cc, q, mm, aa, k=k, metric="cosine"),
        corpus, aux_mul, aux_add)
    print(json.dumps({"variant": "E_full_fp32", "ms": round(t * 1e3, 3),
                      "rows_per_s_B": round(n / t / 1e9, 2)}), flush=True)


if __name__ == "__main__":
    main()
