"""int8 phase-1 fusion blocker: isolate WHICH epilogue piece stops XLA
fusing the consumer into the int8 dot.

exp_hbm_ceiling/exp_int8_fuse: bare ``dot + max(axis=1)`` = 4.4 B
rows/s (saturated); ``dot + FMA + reshape-bucket-max`` = 2.6-2.9 B.
Accumulation dtype made no difference.  Candidates: the per-row FMA,
the reshape+max structure, or the output layout.  All variants 8M x
128, Q=8, sustained x16, f32 accumulation (exact at d=128).

    python -m benchmarks.exp_int8_fuse2
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
BUCKET = 128


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


def dot(qq, vv):
    return lax.dot_general(qq, vv, (((1,), (1,)), ((), ())),
                           preferred_element_type=jnp.float32)


def main():
    dev = jax.devices()[0]
    print(f"device: {getattr(dev, 'device_kind', dev)}", flush=True)
    rng = np.random.default_rng(0)
    n, d = 8 * 1_048_576, 128
    nb = n // BUCKET

    corpus = jax.random.normal(jax.random.PRNGKey(3), (n, d), dtype=jnp.float32)
    aux_mul, aux_add = topk2.prepare_aux(corpus, None, "cosine")
    v8, sv = topk2.quantize_corpus_int8(corpus)
    mul_s = aux_mul * sv
    del corpus, aux_mul
    q = jnp.asarray(rng.standard_normal((8, d)).astype(np.float32))
    qp = topk2.prepare_queries(q, "cosine")
    q8, inv_sq = topk2.quantize_queries_int8(qp)
    qs8 = jnp.asarray(np.asarray(jnp.broadcast_to(q8, (INNER, *q8.shape))))
    fence(v8[0, 0])

    def bare_max(qq, vv, mm, aa, ii):
        return dot(qq, vv).max(axis=1)

    def fma_max(qq, vv, mm, aa, ii):
        s = dot(qq, vv) * mm[None, :] + aa[None, :] * ii[:, None]
        return s.max(axis=1)

    def bucket_nofma(qq, vv, mm, aa, ii):
        return dot(qq, vv).reshape(8, nb, BUCKET).max(axis=-1).max(axis=1)

    def bucket_fma(qq, vv, mm, aa, ii):  # production form
        s = dot(qq, vv) * mm[None, :] + aa[None, :] * ii[:, None]
        return s.reshape(8, nb, BUCKET).max(axis=-1).max(axis=1)

    def rw_fma(qq, vv, mm, aa, ii):
        s = dot(qq, vv) * mm[None, :] + aa[None, :] * ii[:, None]
        bm = lax.reduce_window(s, -jnp.inf, lax.max,
                               window_dimensions=(1, BUCKET),
                               window_strides=(1, BUCKET), padding="VALID")
        return bm.max(axis=1)

    def t_bucket_fma(qq, vv, mm, aa, ii):
        # transposed: [N, 8] dot output; bucket = sublane groups
        s = lax.dot_general(vv, qq, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        s = s * mm[:, None] + aa[:, None] * ii[None, :]
        return s.reshape(nb, BUCKET, 8).max(axis=1).max(axis=0)

    variants = {
        "bare_max": bare_max,
        "fma_max": fma_max,
        "bucket_nofma": bucket_nofma,
        "bucket_fma": bucket_fma,
        "rw_fma": rw_fma,
        "t_bucket_fma": t_bucket_fma,
    }
    for name, fn in variants.items():
        @jax.jit
        def run(qs, vv, mm, aa, ii, fn=fn):
            def body(_, qq):
                return None, fn(qq, vv, mm, aa, ii)

            _, out = lax.scan(body, None, qs)
            return out

        t = timeit(lambda: run(qs8, v8, mul_s, aux_add, inv_sq), iters=4) / INNER
        print(json.dumps({"variant": name, "ms": round(t * 1e3, 3),
                          "rows_per_s_B": round(n / t / 1e9, 2),
                          "int8_gb_per_s": round(n * d / t / 1e9, 1)}), flush=True)


if __name__ == "__main__":
    main()
