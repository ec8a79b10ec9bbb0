"""Residual anatomy of the fp32 sustained scan (bench headline).

BENCH_r01: 1M Q=8 sustained = 572.6 GB/s vs a same-run 671.7 GB/s read
ceiling (85.2%). Where do the missing ~15% go? Split the pipeline:

  ceiling      pure HBM read (dynamic_slice scan) — same process
  p1_highest   production phase 1 (oneshot dot, fp32 HIGHEST, aux FMA,
               bucket max) — is the epilogue fused or does a [Q, N]
               score tile materialize under HIGHEST?
  p1_default   same dot at DEFAULT (one bf16 pass) — HIGHEST tax
  p1_noaux     HIGHEST dot + bucket max, NO aux FMA — aux read cost
  p1_sel       phase 1 + hierarchical bucket selection — selection
               in context
  full         production topk_two_phase (adds gather + rescore)
  full_pipe    software-pipelined: step i runs phase 1 of batch i and
               phase 2 (selection+rescore) of batch i-1 as independent
               ops in one scan body — does XLA overlap any of it?

All variants run sustained (lax.scan over INNER query batches inside
one jit) and consume results into tiny carries, so nothing big is
fetched and the tunnel dispatch cost is amortized.

    PYTHONPATH=/root/repo:/root/.axon_site python -m benchmarks.exp_resid
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
    fence(jax.tree_util.tree_leaves(fn())[0])
    start = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    fence(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - start) / iters


# --- phase-1 variants (sustained over [I, Q, D] batches) -------------------


@functools.partial(jax.jit, static_argnames=("mode",))
def p1_sustained(corpus, qbatches, mul, add, mode):
    def body(acc, q):
        qp = topk2.prepare_queries(q, "cosine")
        if mode == "default":
            s = jax.lax.dot_general(
                qp, corpus, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s * mul[None, :] + add[None, :]
        elif mode == "noaux":
            s = jax.lax.dot_general(
                qp, corpus, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        else:  # highest == production bucket_scores_xla sans reshape call
            s = jax.lax.dot_general(
                qp, corpus, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            s = s * mul[None, :] + add[None, :]
        qt, n = s.shape
        bm = s.reshape(qt, n // topk2.BUCKET, topk2.BUCKET).max(axis=-1)
        return jnp.maximum(acc, jnp.max(bm)), None

    acc, _ = jax.lax.scan(body, jnp.float32(-np.inf), qbatches)
    return acc


@jax.jit
def p1_sel_sustained(corpus, qbatches, mul, add):
    kp = 16 + topk2.BUCKET_PAD

    def body(acc, q):
        qp = topk2.prepare_queries(q, "cosine")
        bm = topk2.bucket_scores_xla(qp, corpus, mul, add)
        bidx = topk2.topk_buckets(bm, kp)
        return acc + jnp.sum(bidx), None

    acc, _ = jax.lax.scan(body, jnp.int32(0), qbatches)
    return acc


@functools.partial(jax.jit, static_argnames=("k",))
def full_sustained(corpus, qbatches, mul, add, k):
    def body(acc, q):
        d_, i_ = topk2.topk_two_phase(corpus, q, mul, add, k=k, metric="cosine")
        return acc + jnp.sum(i_), None

    acc, _ = jax.lax.scan(body, jnp.int32(0), qbatches)
    return acc


# --- software-pipelined two-phase ------------------------------------------


def _phase2(corpus, qp, bm, mul, add, k, kp):
    """Selection + gather + exact rescore (mirrors topk_two_phase's tail
    for the small-Q unchunked case)."""
    n, d = corpus.shape
    bucket = topk2.BUCKET
    n_buckets = n // bucket
    bidx = jnp.sort(topk2.topk_buckets(bm, kp), axis=-1)
    rows = corpus.reshape(n_buckets, bucket, d)
    mul_b = mul.reshape(n_buckets, bucket)
    add_b = add.reshape(n_buckets, bucket)
    cand_v = rows[bidx]
    s = jnp.einsum(
        "qd,qkbd->qkb", qp, cand_v,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    s = s * mul_b[bidx] + add_b[bidx]
    q = qp.shape[0]
    s = s.reshape(q, kp * bucket)
    lane = jnp.arange(bucket, dtype=jnp.int32)[None, None, :]
    ids = (bidx[:, :, None] * bucket + lane).reshape(q, kp * bucket)
    top_s, pos = jax.lax.top_k(s, k)
    return top_s, jnp.take_along_axis(ids, pos, axis=1)


@functools.partial(jax.jit, static_argnames=("k",))
def full_pipe_sustained(corpus, qbatches, mul, add, k):
    kp = k + topk2.BUCKET_PAD

    qp0 = topk2.prepare_queries(qbatches[0], "cosine")
    bm0 = topk2.bucket_scores_xla(qp0, corpus, mul, add)

    def body(carry, q_next):
        acc, qp_prev, bm_prev = carry
        qp = topk2.prepare_queries(q_next, "cosine")
        bm = topk2.bucket_scores_xla(qp, corpus, mul, add)
        top_s, top_i = _phase2(corpus, qp_prev, bm_prev, mul, add, k, kp)
        return (acc + jnp.sum(top_i), qp, bm), None

    (acc, qpl, bml), _ = jax.lax.scan(body, (jnp.int32(0), qp0, bm0), qbatches[1:])
    top_s, top_i = _phase2(corpus, qpl, bml, mul, add, k, kp)
    return acc + jnp.sum(top_i)


# --- pure-read ceiling ------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n_read",))
def pure_read(big, offsets, n_read):
    def body(carry, off):
        sl = jax.lax.dynamic_slice(big, (off, 0), (n_read, big.shape[1]))
        return carry + jnp.max(sl), None

    acc, _ = jax.lax.scan(body, jnp.float32(0), offsets)
    return acc


def run_size(n, d, inner, iters, rng):
    corpus = jax.random.normal(jax.random.PRNGKey(3), (n, d), dtype=jnp.float32)
    mul, add = topk2.prepare_aux(corpus, None, "cosine")
    fence(add[0])
    qb = jnp.asarray(rng.standard_normal((inner, 8, d)).astype(np.float32))
    bytes_per_scan = n * d * 4

    # ceiling (same process, same corpus)
    half = n // 2
    offs = jnp.asarray(rng.integers(0, half, 16).astype(np.int32))
    t = timeit(lambda: pure_read(corpus, offs, half), iters=iters)
    ceiling = half * d * 4 * 16 / t
    print(json.dumps({"n": n, "variant": "ceiling",
                      "gb_per_s": round(ceiling / 1e9, 1)}), flush=True)

    results = {}
    for mode in ("highest", "default", "noaux"):
        t = timeit(lambda m=mode: p1_sustained(corpus, qb, mul, add, m), iters=iters)
        per = t / inner
        results[f"p1_{mode}"] = per
        print(json.dumps({"n": n, "variant": f"p1_{mode}",
                          "ms_per_scan": round(per * 1e3, 3),
                          "gb_per_s": round(bytes_per_scan / per / 1e9, 1),
                          "vs_ceiling": round(bytes_per_scan / per / ceiling, 4)}),
              flush=True)

    t = timeit(lambda: p1_sel_sustained(corpus, qb, mul, add), iters=iters)
    per = t / inner
    results["p1_sel"] = per
    print(json.dumps({"n": n, "variant": "p1_sel",
                      "ms_per_scan": round(per * 1e3, 3),
                      "gb_per_s": round(bytes_per_scan / per / 1e9, 1),
                      "vs_ceiling": round(bytes_per_scan / per / ceiling, 4)}),
          flush=True)

    for name, fn in (
        ("full", lambda: full_sustained(corpus, qb, mul, add, 16)),
        ("full_pipe", lambda: full_pipe_sustained(corpus, qb, mul, add, 16)),
    ):
        t = timeit(fn, iters=iters)
        per = t / inner
        results[name] = per
        print(json.dumps({"n": n, "variant": name,
                          "ms_per_scan": round(per * 1e3, 3),
                          "gb_per_s": round(bytes_per_scan / per / 1e9, 1),
                          "vs_ceiling": round(bytes_per_scan / per / ceiling, 4)}),
              flush=True)

    # correctness spot check: pipelined == production on the first batch
    d0, i0 = topk2.topk_two_phase(corpus, qb[0], mul, add, k=16, metric="cosine")
    print(json.dumps({"n": n, "deltas_ms": {
        "aux": round((results["p1_highest"] - results["p1_noaux"]) * 1e3, 3),
        "highest_tax": round((results["p1_highest"] - results["p1_default"]) * 1e3, 3),
        "selection": round((results["p1_sel"] - results["p1_highest"]) * 1e3, 3),
        "rescore": round((results["full"] - results["p1_sel"]) * 1e3, 3),
        "pipe_gain": round((results["full"] - results["full_pipe"]) * 1e3, 3),
    }}), flush=True)


def main():
    dev = jax.devices()[0]
    print(f"device: {getattr(dev, 'device_kind', dev)}", flush=True)
    rng = np.random.default_rng(0)
    run_size(1_048_576, 128, inner=64, iters=4, rng=rng)
    run_size(8 * 1_048_576, 128, inner=16, iters=3, rng=rng)


if __name__ == "__main__":
    main()
