"""int8 selection bottleneck: isolate + bucket-width sweep at 8M.

exp_int8_pipe: fused phase 1 = 1.97 ms, + topk_buckets = 2.98 ms,
full two-phase = 3.33 ms.  (Its "B" variant fetched 33 MB of bucket
maxima through the tunnel — harness artifact, not device cost.)
Questions:
  1. selection-only cost on a PRECOMPUTED [8, 65536] bucket-max —
     distinguishes "selection is slow" from "selection breaks the
     dot's epilogue fusion";
  2. end-to-end int8 two-phase with bucket ∈ {128, 256, 512}: coarser
     buckets shrink the selection input 2-4x; rescore gather grows
     kp·bucket·D per query (still ≤ 67 MB total at 512).

    python -m benchmarks.exp_int8_sel
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
    qs = jnp.asarray(rng.standard_normal((INNER, 8, d)).astype(np.float32))
    fence(v8[0, 0])

    # --- 1. selection-only on precomputed bucket maxima ---------------------
    nb = n // 128
    kp = min(k + topk2.BUCKET_PAD * 2, nb)
    bms = jax.random.normal(jax.random.PRNGKey(9), (INNER, 8, nb), dtype=jnp.float32)
    fence(bms[0, 0, 0])

    @jax.jit
    def sel_only(bmb):
        def body(_, bm):
            return None, topk2.topk_buckets(bm, kp)

        _, out = lax.scan(body, None, bmb)
        return out

    t = timeit(lambda: sel_only(bms), iters=4) / INNER
    print(json.dumps({"variant": "sel_only_nb65536", "ms": round(t * 1e3, 3)}),
          flush=True)
    del bms

    # --- 2. bucket-width sweep, full int8 two-phase --------------------------
    @jax.jit
    def ref(qb, cc, mm, aa):
        def body(_, q):
            return None, topk2.topk_two_phase(cc, q, mm, aa, k=k, metric="cosine")

        _, out = lax.scan(body, None, qb)
        return out

    _, ib = ref(qs, corpus, aux_mul, aux_add)
    ib0 = np.asarray(ib[0])[:, :10]

    orig = topk2.BUCKET
    try:
        for b in (128, 256, 512):
            topk2.BUCKET = b

            @jax.jit
            def run(qb, cc, mm, aa, vv, ss):
                def body(_, q):
                    return None, topk2.topk_two_phase(
                        cc, q, mm, aa, k=k, metric="cosine",
                        corpus_scan_int8=(vv, ss))

                _, out = lax.scan(body, None, qb)
                return out

            t = timeit(lambda: run(qs, corpus, aux_mul, aux_add, v8, sv),
                       iters=4) / INNER
            # correctness vs fp32 exact (recall@10 on batch 0)
            _, ii = run(qs, corpus, aux_mul, aux_add, v8, sv)
            a = np.asarray(ii[0])[:, :10]
            recall = np.mean([len(set(x) & set(y)) / 10 for x, y in zip(a, ib0)])
            print(json.dumps({"variant": f"int8_e2e_bucket{b}",
                              "ms": round(t * 1e3, 3),
                              "rows_per_s_B": round(n / t / 1e9, 2),
                              "recall_at_10": round(float(recall), 3)}), flush=True)
    finally:
        topk2.BUCKET = orig


if __name__ == "__main__":
    main()
