"""Pallas big-Q kernel tile-size sweep at Q=1024, 1M x 128.

The (1024, 256) grid = 4096 cells; fp32 and bf16 timed equal (~8.4 ms
incl. selection), implying per-cell overhead / VPU epilogue dominates,
not the MXU. Larger tiles cut cell count 2-4x.

    python -m benchmarks.exp_bigq_tiles
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from fenix_tpu.ops import topk2


def timed(fn, iters=10):
    np.asarray(fn()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(out[0])
    return (time.perf_counter() - t0) / iters


def main():
    n, d, k = 1_048_576, 128, 16
    corpus = jax.random.normal(jax.random.PRNGKey(0), (n, d), dtype=jnp.float32)
    am, aa = topk2.prepare_aux(corpus, None, "cosine")
    cb = corpus.astype(jnp.bfloat16)
    q1024 = jax.random.normal(jax.random.PRNGKey(1), (1024, d), dtype=jnp.float32)
    np.asarray(cb[0, 0])

    ref_ids = None
    for bn, bq in (
        (1024, 256), (2048, 256), (2048, 512), (4096, 256),
        (2048, 1024), (4096, 1024),  # adopted winner / VMEM-blowout point
    ):
        topk2._BIGQ_BN, topk2._BIGQ_BQ = bn, bq
        topk2.topk_two_phase.clear_cache()
        t32 = timed(lambda: topk2.topk_two_phase(corpus, q1024, am, aa, k=k, metric="cosine"))
        tb = timed(lambda: topk2.topk_two_phase(corpus, q1024, am, aa, k=k, metric="cosine", corpus_scan=cb))
        _, ids = topk2.topk_two_phase(corpus, q1024, am, aa, k=k, metric="cosine")
        ids = np.asarray(ids)
        if ref_ids is None:
            ref_ids = ids
        print(json.dumps({
            "tiles": f"{bn}x{bq}",
            "fp32_ms": round(t32 * 1e3, 2), "fp32_qps": round(1024 / t32, 1),
            "bf16_ms": round(tb * 1e3, 2), "bf16_qps": round(1024 / tb, 1),
            "ids_match": bool((ids == ref_ids).all()),
        }), flush=True)


if __name__ == "__main__":
    main()
