"""Sustained HBM read ceiling + int8 phase-1 variant sweep.

Two open questions from docs/DESIGN.md:

1. What is the TRUE sustained HBM read rate on this stack?  The old
   "490 GB/s ceiling" was per-dispatch (dispatch-polluted); the fp32
   oneshot dot sustains 543 GB/s (66% of the 819 GB/s v5e spec).  Is
   543 the platform ceiling, or does the dot leave bandwidth on the
   table?  Measured with a pure read: ``lax.scan`` whose body reads N
   rows via ``lax.dynamic_slice`` at an iteration-dependent offset
   (cannot be hoisted/CSE'd) and max-reduces them (VPU-cheap).

2. The int8 scan sustains 2.2 B rows/s at d=128 — only ~280 GB/s of
   int8 bytes, half the fp32 path's bandwidth efficiency and far from
   the 4x-rows/s a bandwidth-bound int8 scan would give.  Where does
   it go?  Sweep: pure int8 read, int8x{int8,bf16-convert} dots, i32
   vs f32 accumulation, with and without the fused bucket-max epilogue.

    python -m benchmarks.exp_hbm_ceiling [--scale 1.0]
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from fenix_tpu.ops import topk2


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


INNER = 16


@functools.partial(jax.jit, static_argnames=("n_read",))
def pure_read(big, offsets, n_read):
    """Sustained read: each scan step reads n_read rows at a varying
    offset and max-reduces.  Offset depends on the scan input, so XLA
    must issue the full read every iteration."""

    def body(carry, off):
        sl = lax.dynamic_slice(big, (off, 0), (n_read, big.shape[1]))
        return carry + jnp.max(sl).astype(jnp.float32), None

    acc, _ = lax.scan(body, jnp.float32(0), offsets)
    return acc


def sustained(fn, *arrays, iters=4):
    """Time fn(*arrays, qb[i]) chained INNER times inside one jit."""

    @jax.jit
    def run(qs, *arrs):
        def body(_, q):
            return None, fn(q, *arrs)

        _, out = lax.scan(body, None, qs)
        return jax.tree.map(lambda x: x.reshape(-1)[:1], out)

    return run, iters


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=float, default=1.0)
    args = p.parse_args()

    dev = jax.devices()[0]
    print(f"device: {getattr(dev, 'device_kind', dev)}", flush=True)
    rng = np.random.default_rng(0)
    d = 128

    # --- 1. pure HBM read ceiling -------------------------------------------
    # fp32: read 1 GiB per scan step from a 2 GiB buffer
    n_read = int(2 * 1_048_576 * args.scale)
    big = jax.random.normal(jax.random.PRNGKey(1), (2 * n_read, d), dtype=jnp.float32)
    offs = jnp.asarray(rng.integers(0, n_read, INNER).astype(np.int32))
    fence(big[0, 0])
    t = timeit(lambda: pure_read(big, offs, n_read), iters=4) / INNER
    gb = n_read * d * 4 / t / 1e9
    print(json.dumps({"variant": "pure_read_f32_1GiB", "ms": round(t * 1e3, 3),
                      "gb_per_s": round(gb, 1)}), flush=True)
    del big

    # int8: read 1 GiB per step
    n8_read = n_read * 4
    big8 = jax.random.randint(jax.random.PRNGKey(2), (2 * n8_read, d), -127, 127,
                              dtype=jnp.int8)
    offs8 = jnp.asarray(rng.integers(0, n8_read, INNER).astype(np.int32))
    fence(big8[0, 0])
    t = timeit(lambda: pure_read(big8, offs8, n8_read), iters=4) / INNER
    print(json.dumps({"variant": "pure_read_int8_1GiB", "ms": round(t * 1e3, 3),
                      "gb_per_s": round(n8_read * d / t / 1e9, 1)}), flush=True)
    del big8

    # --- 2. int8 phase-1 variants, 8M x 128, Q=8 ----------------------------
    n = int(8 * 1_048_576 * args.scale)
    corpus = jax.random.normal(jax.random.PRNGKey(3), (n, d), dtype=jnp.float32)
    aux_mul, aux_add = topk2.prepare_aux(corpus, None, "cosine")
    v8, sv = topk2.quantize_corpus_int8(corpus)
    mul_s = aux_mul * sv
    del corpus
    q = jnp.asarray(rng.standard_normal((8, d)).astype(np.float32))
    qp = topk2.prepare_queries(q, "cosine")
    q8, inv_sq = topk2.quantize_queries_int8(qp)
    qs8 = jnp.broadcast_to(q8, (INNER, *q8.shape))
    fence(v8[0, 0])

    bucket = topk2.bucket_for(8, n)

    def report(name, fn, *arrs):
        run, iters = sustained(fn, *arrs)
        try:
            t = timeit(lambda: run(qs8, *arrs), iters=iters) / INNER
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:160]}), flush=True)
            return
        print(json.dumps({"variant": name, "ms": round(t * 1e3, 3),
                          "rows_per_s_B": round(n / t / 1e9, 2),
                          "int8_gb_per_s": round(n * d / t / 1e9, 1)}), flush=True)

    # (a) production path: int8 dot -> i32 -> f32 fuse + bucket max
    report("int8_prod_fused",
           lambda qq, vv, mm, aa, ii: topk2.bucket_scores_scan_int8(
               qq, vv, mm, aa, ii, bucket=bucket),
           v8, mul_s, aux_add, inv_sq)

    # (b) bare int8 dot -> i32, reduce only (no epilogue cost)
    def bare_i32(qq, vv):
        s = lax.dot_general(qq, vv, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
        return jnp.max(s, axis=1)

    report("int8_dot_i32_bare", bare_i32, v8)

    # (c) int8 dot with f32 accumulation
    def bare_f32acc(qq, vv):
        s = lax.dot_general(qq, vv, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        return jnp.max(s, axis=1)

    report("int8_dot_f32acc_bare", bare_f32acc, v8)

    # (d) convert int8 -> bf16 inline, bf16 dot (tests MXU int8 ingest)
    def bf16_convert(qq, vv):
        s = lax.dot_general(qq.astype(jnp.bfloat16), vv.astype(jnp.bfloat16),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        return jnp.max(s, axis=1)

    report("int8_to_bf16_dot_bare", bf16_convert, v8)

    # (e) production path minus the [QT, N] i32 materialization:
    #     blocked scan form even though Q<=32 (oneshot normally wins)
    def blocked(qq, vv, mm, aa, ii):
        block = 1_048_576
        nb = n // block
        xs = (vv.reshape(nb, block, d), mm.reshape(nb, block), aa.reshape(nb, block))

        def body(_, x):
            vb, mb, ab = x
            s32 = lax.dot_general(qq, vb, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
            s = s32.astype(jnp.float32) * mb[None, :] + ab[None, :] * ii[:, None]
            return None, s.reshape(8, -1, bucket).max(axis=-1)

        _, st = lax.scan(body, None, xs)
        return jnp.transpose(st, (1, 0, 2)).reshape(8, -1)

    if n % 1_048_576 == 0:
        report("int8_blocked_fused", blocked, v8, mul_s, aux_add, inv_sq)

    # (f) fp32 oneshot anchor (the 543 GB/s path), same harness
    corpus = jax.random.normal(jax.random.PRNGKey(3), (n, d), dtype=jnp.float32)
    am, aa = topk2.prepare_aux(corpus, None, "cosine")
    fence(am[0])
    qsf = jnp.broadcast_to(qp, (INNER, *qp.shape))

    @jax.jit
    def f32_anchor(qs, vv, mm, ab):
        def body(_, qq):
            return None, topk2.bucket_scores_xla(qq, vv, mm, ab, bucket=bucket)[:, :1]

        _, out = lax.scan(body, None, qs)
        return out

    t = timeit(lambda: f32_anchor(qsf, corpus, am, aa), iters=4) / INNER
    print(json.dumps({"variant": "f32_oneshot_fused", "ms": round(t * 1e3, 3),
                      "rows_per_s_B": round(n / t / 1e9, 2),
                      "f32_gb_per_s": round(n * d * 4 / t / 1e9, 1)}), flush=True)


if __name__ == "__main__":
    main()
