"""int8 phase-1 epilogue fusion: why the fused path loses 33%.

exp_hbm_ceiling found: bare int8 dot = 4.41 B rows/s (564 GB/s,
bandwidth-saturated), production fused path = 2.95 B (378 GB/s).
Hypothesis: the i32->f32 convert in the epilogue stops XLA fusing the
bucket-max into the dot, materializing the [Q, N] i32 tile (256 MB at
8M/Q=8 -> ~0.9 ms extra HBM traffic = the observed delta).  With
``preferred_element_type=f32`` the epilogue is the same f32 FMA +
reshape-max form as the fp32 path, which fuses free.  Accumulating
int8 products in f32 is EXACT for d <= 1024 (max |sum| = 127^2*d <
2^24).

Variants (1M and 8M, Q=8, sustained x16):
  prod      — current bucket_scores_scan_int8 (i32 dot + convert)
  f32acc    — dot preferred f32 + same epilogue
  bf16conv  — operands converted to bf16, f32-acc dot + epilogue

    python -m benchmarks.exp_int8_fuse
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


def epilogue(s, mul_s, aux_add, inv_sq, bucket):
    s = s.astype(jnp.float32) * mul_s[None, :] + aux_add[None, :] * inv_sq[:, None]
    return s.reshape(s.shape[0], -1, bucket).max(axis=-1)


def make_variants(bucket):
    def prod(qq, vv, mm, aa, ii):
        return topk2.bucket_scores_scan_int8(qq, vv, mm, aa, ii, bucket=bucket)

    def f32acc(qq, vv, mm, aa, ii):
        s = lax.dot_general(qq, vv, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        return epilogue(s, mm, aa, ii, bucket)

    def bf16conv(qq, vv, mm, aa, ii):
        s = lax.dot_general(qq.astype(jnp.bfloat16), vv.astype(jnp.bfloat16),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        return epilogue(s, mm, aa, ii, bucket)

    return {"prod": prod, "f32acc": f32acc, "bf16conv": bf16conv}


def main():
    dev = jax.devices()[0]
    print(f"device: {getattr(dev, 'device_kind', dev)}", flush=True)
    rng = np.random.default_rng(0)
    d = 128

    for n in (1_048_576, 8 * 1_048_576):
        corpus = jax.random.normal(jax.random.PRNGKey(3), (n, d), dtype=jnp.float32)
        aux_mul, aux_add = topk2.prepare_aux(corpus, None, "cosine")
        v8, sv = topk2.quantize_corpus_int8(corpus)
        mul_s = aux_mul * sv
        del corpus, aux_mul
        q = jnp.asarray(rng.standard_normal((8, d)).astype(np.float32))
        qp = topk2.prepare_queries(q, "cosine")
        q8, inv_sq = topk2.quantize_queries_int8(qp)
        qs8 = jnp.broadcast_to(q8, (INNER, *q8.shape))
        fence(v8[0, 0])
        bucket = topk2.bucket_for(8, n)

        ref = None
        for name, fn in make_variants(bucket).items():
            @jax.jit
            def run(qs, vv, mm, aa, ii, fn=fn):
                def body(_, qq):
                    # min+max over buckets: forces every bucket to be
                    # computed (a strided slice could be DCE'd into the
                    # dot, skipping columns)
                    bm = fn(qq, vv, mm, aa, ii)
                    return None, (bm.max(axis=1), bm.min(axis=1))

                _, out = lax.scan(body, None, qs)
                return out

            full = jax.jit(fn)
            t = timeit(lambda: run(qs8, v8, mul_s, aux_add, inv_sq), iters=4) / INNER
            out = np.asarray(full(q8, v8, mul_s, aux_add, inv_sq))
            if ref is None:
                ref = out
            match = bool(np.allclose(out, ref, rtol=1e-5, atol=1e-4))
            print(json.dumps({"variant": f"{name}_n{n // 1_048_576}M",
                              "ms": round(t * 1e3, 3),
                              "rows_per_s_B": round(n / t / 1e9, 2),
                              "int8_gb_per_s": round(n * d / t / 1e9, 1),
                              "match_prod": match}), flush=True)
        del v8


if __name__ == "__main__":
    main()
