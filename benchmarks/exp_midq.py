"""Mid-size query batches (32 < Q < 256) fall in a kernel gap.

The oneshot dot is capped at Q<=32 (ONESHOT_MAX_Q) and the Pallas bigq
kernel needs Q divisible by its 256-wide minimum query tile, so the
executor's canonical Q=64 (and any 128) lands on the blocked fusable
lax.scan — the slowest phase-1 lowering (stalls between steps,
benchmarks/exp_phase1b.py). Candidates at 1M×128, k=16:

  a) production today (blocked scan),
  b) oneshot dot with the cap raised to 128 ([N, Q] f32 tile = Q/32
     of the corpus bytes; epilogue may stop fusing past some Q),
  c) pad queries to 256 and take the Pallas kernel (4x/2x MXU work,
     one Mosaic fixed tax).

RESULT (v5e, 1M×128 k=16): pad256-Pallas wins at both sizes —
Q=64: prod-scan 4.06 ms / oneshot 3.19 / pad256 2.91;
Q=128: prod-scan 3.94 / oneshot 3.75 / pad256 2.95.
PRODUCTION now routes 32 < Q % 256 ≠ 0 through the padded kernel
(topk2.topk_two_phase mid-Q route; re-measured in production: 2.86 ms
Q=64, 3.09 ms Q=128, ids bit-exact vs the numpy oracle).

    python -m benchmarks.exp_midq [variant]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from fenix_tpu.ops import topk2

INNER = 16
N, D, K = 1_048_576, 128, 16


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
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rng = np.random.default_rng(0)
    corpus = jax.random.normal(jax.random.PRNGKey(3), (N, D), dtype=jnp.float32)
    aux_mul, aux_add = topk2.prepare_aux(corpus, None, "cosine")
    fence(corpus[0, 0])

    def run_variant(name, q, cap=None, pad_to=None):
        qs = jnp.asarray(rng.standard_normal((INNER, q, D)).astype(np.float32))
        orig = topk2.ONESHOT_MAX_Q
        if cap is not None:
            topk2.ONESHOT_MAX_Q = cap
        try:

            @jax.jit
            def run(qb, cc, mm, aa):
                def body(_, qq):
                    if pad_to is not None:
                        qq = jnp.concatenate([qq, jnp.zeros((pad_to - q, D), qq.dtype)])
                    dd, ii = topk2.topk_two_phase(cc, qq, mm, aa, k=K, metric="cosine")
                    return None, (dd[:q], ii[:q])

                _, out = lax.scan(body, None, qb)
                return out

            t = timeit(lambda: run(qs, corpus, aux_mul, aux_add)) / INNER
            print(
                json.dumps(
                    {"variant": f"{name}_q{q}", "ms": round(t * 1e3, 3),
                     "qps_k": round(q / t / 1e3, 1)}
                ),
                flush=True,
            )
        finally:
            topk2.ONESHOT_MAX_Q = orig

    for q in (64, 128):
        if which in ("all", "prod"):
            run_variant("prod_scan", q)
        if which in ("all", "oneshot"):
            run_variant("oneshot", q, cap=128)
        if which in ("all", "pad256"):
            run_variant("pad256_pallas", q, pad_to=256)


if __name__ == "__main__":
    main()
