"""Fused two-level selection for the small-Q int8 scan (8M×128, Q=8).

RESULT: **dead end — the two-level pipeline LOSES** (measured v5e):
base 3.42 ms (2.45 B rows/s) vs twolevel 4.29/4.47/7.26 ms at group
1024/2048/4096, recall@10 = 1.0 everywhere. The killer is the
recompute stage: gathering kp=32 groups' int8 rows and re-scoring them
(einsum "qd,qkgd->qkg") costs 1.13 ms standalone at group=1024 — the
per-query candidate sets are disjoint, so the "matmul" is 8
independent [32k, 128]×[128, 1] matvecs whose gather/layout overhead
eats the entire ~1.0 ms the in-context hierarchical selection was
supposed to save. docs/DESIGN.md's "+15 % est." is hereby refuted;
production stays on bucket-max + topk_buckets.

Original hypothesis: emit GROUP maxima from the scan epilogue (same
single reduce-consumer chain → still fuses into the dot; output 8-32×
smaller), select top-kp groups cheaply, then RECOMPUTE bucket maxima in
int8 on just the gathered groups and fp32-rescore the winning buckets.
Coverage: top-k rows lie in ≤k distinct groups and group-max ≥ any
member row's score, so the top-kp groups cover the true top-k — the
same argument as the bucket trick, one level up. The int8 BUCKET_PAD*2
margin guards quantization error at both levels.

    python -m benchmarks.exp_int8_twolevel
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

INNER = 16
NEG_INF = topk2.NEG_INF


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


def twolevel_int8(corpus, v8, sv, aux_mul, aux_add, queries, k, group, metric="cosine"):
    """[Q,k] ids via scan→group-max → int8 group recompute → fp32 rescore."""
    n, d = corpus.shape
    q = queries.shape[0]
    bucket = topk2.BUCKET
    g = n // group
    bpg = group // bucket
    n_buckets = n // bucket
    kp = min(k + topk2.BUCKET_PAD * 2, g)

    queries_p = topk2.prepare_queries(queries, metric)
    q8, inv_sq = topk2.quantize_queries_int8(queries_p)
    ams = aux_mul * sv

    # phase 1: fused dot + FMA + GROUP max (single reduce-consumer chain)
    s = lax.dot_general(
        q8, v8, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Q, N]
    s = s * ams[None, :] + aux_add[None, :] * inv_sq[:, None]
    gmax = s.reshape(q, g, group).max(axis=-1)  # [Q, g]

    # level 1: top-kp groups (cheap: g ∈ {8192, 4096, 2048})
    _, gidx = lax.top_k(gmax, kp)  # [Q, kp]
    gidx = jnp.sort(gidx, axis=-1)

    # level 2: int8 recompute of bucket maxima on gathered groups only
    v8g = v8.reshape(g, group, d)
    ams_g = ams.reshape(g, group)
    add_g = aux_add.reshape(g, group)
    cand_v = v8g[gidx]  # [Q, kp, group, D] int8
    s2 = jnp.einsum(
        "qd,qkgd->qkg", q8, cand_v, preferred_element_type=jnp.float32
    )
    s2 = s2 * ams_g[gidx] + add_g[gidx] * inv_sq[:, None, None]
    bm_c = s2.reshape(q, kp, bpg, bucket).max(axis=-1)  # [Q, kp, bpg]
    lane = jnp.arange(bpg, dtype=jnp.int32)[None, None, :]
    bucket_ids = (gidx[:, :, None] * bpg + lane).reshape(q, kp * bpg)
    _, pos = lax.top_k(bm_c.reshape(q, kp * bpg), kp)
    bidx = jnp.take_along_axis(bucket_ids, pos, axis=1)  # [Q, kp]
    bidx = jnp.sort(bidx, axis=-1)

    # phase 2: exact fp32 rescore (as production)
    rows = corpus.reshape(n_buckets, bucket, d)
    mul_b = aux_mul.reshape(n_buckets, bucket)
    add_b = aux_add.reshape(n_buckets, bucket)
    cand = rows[bidx]  # [Q, kp, bucket, D] f32
    s3 = jnp.einsum(
        "qd,qkbd->qkb",
        queries_p,
        cand,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    s3 = s3 * mul_b[bidx] + add_b[bidx]
    s3 = s3.reshape(q, kp * bucket)
    ids = (bidx[:, :, None] * bucket + jnp.arange(bucket, dtype=jnp.int32)).reshape(
        q, kp * bucket
    )
    top_s, pos = lax.top_k(s3, k)
    return top_s, jnp.take_along_axis(ids, pos, axis=1)


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

    # baseline: production int8 two-phase
    @jax.jit
    def base(qb, cc, mm, aa, vv, ss):
        def body(_, qq):
            return None, topk2.topk_two_phase(
                cc, qq, mm, aa, k=k, metric="cosine", corpus_scan_int8=(vv, ss)
            )

        _, out = lax.scan(body, None, qb)
        return out

    t = timeit(lambda: base(qs, corpus, aux_mul, aux_add, v8, sv)) / INNER
    _, ib = base(qs, corpus, aux_mul, aux_add, v8, sv)
    base_ids = np.asarray(ib[0])[:, :10]
    print(
        json.dumps(
            {"variant": "base_int8", "ms": round(t * 1e3, 3),
             "rows_per_s_B": round(n / t / 1e9, 2)}
        ),
        flush=True,
    )

    # fp32 exact for recall
    @jax.jit
    def exact(qb, cc, mm, aa):
        def body(_, qq):
            return None, topk2.topk_two_phase(cc, qq, mm, aa, k=k, metric="cosine")

        _, out = lax.scan(body, None, qb)
        return out

    _, ie = exact(qs, corpus, aux_mul, aux_add)
    exact_ids = np.asarray(ie[0])[:, :10]
    rb = np.mean([len(set(x) & set(y)) / 10 for x, y in zip(base_ids, exact_ids)])
    print(json.dumps({"variant": "base_recall_at_10", "recall": round(float(rb), 3)}),
          flush=True)

    for group in (1024, 2048, 4096):

        @functools.partial(jax.jit, static_argnames=("grp",))
        def run(qb, cc, mm, aa, vv, ss, grp):
            def body(_, qq):
                return None, twolevel_int8(cc, vv, ss, mm, aa, qq, k, grp)

            _, out = lax.scan(body, None, qb)
            return out

        t = timeit(lambda: run(qs, corpus, aux_mul, aux_add, v8, sv, group)) / INNER
        _, ii = run(qs, corpus, aux_mul, aux_add, v8, sv, group)
        a = np.asarray(ii[0])[:, :10]
        recall = np.mean([len(set(x) & set(y)) / 10 for x, y in zip(a, exact_ids)])
        print(
            json.dumps(
                {"variant": f"twolevel_g{group}", "ms": round(t * 1e3, 3),
                 "rows_per_s_B": round(n / t / 1e9, 2),
                 "recall_at_10": round(float(recall), 3)}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
