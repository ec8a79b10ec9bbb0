"""Large-Q kernel + selection, round 2 — scalar-reduced timings.

exp_bigq_reduce's kernel numbers were fetch-polluted (128 MB bucket_max
readback through the tunnel). Here every timed fn returns a scalar or
[Q, kp] so the fence is constant and tiny.

Questions:
A. true bigq kernel time (loop vs reshape reduction)
B. cost of fp32-true matmul passes in-kernel (HIGH / HIGHEST) — the
   production f32 kernel runs DEFAULT (one bf16 pass): selection-margin
   precision, like the bf16 scan mode but implicit
C. two-level kernel (second output: per-row-block maxima) + the
   selection that starts from it — vs the production gmax-pass hierarchy
D. e2e prototype with (C) integrated, result-equality vs production

    python -m benchmarks.exp_bigq2
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


def timeit(fn, iters=8):
    out = fn()
    fence(out[0] if isinstance(out, tuple) else out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn()
    fence(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - start) / iters


BN, BQ = 2048, 1024
BUCKET = topk2.BUCKET_LARGE_Q  # 32
BPB = BN // BUCKET  # 64


def bigq_kernel(queries_p, corpus, aux_mul, aux_add, mode):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    qt, d = queries_p.shape
    n = corpus.shape[0]
    ni, nj = n // BN, qt // BQ
    twolevel = mode == "twolevel"

    prec = {"high": jax.lax.Precision.HIGH, "highest": jax.lax.Precision.HIGHEST}.get(
        mode, None
    )

    def kernel(q_ref, v_ref, mul_ref, add_ref, out_ref, *maybe_cell):
        s = jax.lax.dot_general(
            v_ref[:], q_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        s = s * mul_ref[:][:, None] + add_ref[:][:, None]
        if mode == "loop" or prec is not None:
            for j in range(BPB):
                out_ref[j, :] = jnp.max(s[j * BUCKET : (j + 1) * BUCKET], axis=0)
        else:
            bm = s.reshape(BPB, BUCKET, BQ).max(axis=1)
            out_ref[:, :] = bm
            if twolevel:
                maybe_cell[0][0, 0, :] = jnp.max(bm, axis=0)

    out_shape = jax.ShapeDtypeStruct((n // BUCKET, qt), jnp.float32)
    out_specs = pl.BlockSpec((BPB, BQ), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    if twolevel:
        out_shape = (out_shape, jax.ShapeDtypeStruct((ni, 1, qt), jnp.float32))
        out_specs = (
            out_specs,
            pl.BlockSpec((1, 1, BQ), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        )

    out = pl.pallas_call(
        kernel,
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec((BQ, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN,), lambda i, j: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN,), lambda i, j: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * qt * d,
            bytes_accessed=n * d * 4 + n * 8 + qt * d * 4 * ni + (n // BUCKET) * qt * 4,
            transcendentals=0,
        ),
    )(queries_p, corpus, aux_mul, aux_add)
    if twolevel:
        return out[0].T, out[1].reshape(ni, qt).T  # [QT, nb], [QT, ni]
    return out.T


def sel_twolevel(bucket_max, cell_max, kp):
    """Selection starting from kernel-emitted cell maxima."""
    q, nb = bucket_max.shape
    ni = cell_max.shape[1]
    kg = min(kp, ni)
    _, cidx = jax.lax.top_k(cell_max, kg)  # stable
    cidx = jnp.sort(cidx, axis=-1)
    grouped = bucket_max.reshape(q, ni, BPB)
    cand = jnp.take_along_axis(grouped, cidx[:, :, None], axis=1).reshape(q, kg * BPB)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, BPB), 2)
    cand_ids = (cidx[:, :, None] * BPB + lane).reshape(q, kg * BPB)
    _, pos = jax.lax.top_k(cand, kp)
    return jnp.take_along_axis(cand_ids, pos, axis=1)


def main():
    dev = jax.devices()[0]
    print(f"device: {getattr(dev, 'device_kind', dev)}", flush=True)

    n, d, k = 1_048_576, 128, 16
    kp = k + topk2.BUCKET_PAD
    rng = np.random.default_rng(0)
    corpus = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    aux_mul, aux_add = topk2.prepare_aux(corpus, None, "cosine")
    queries = jnp.asarray(rng.standard_normal((1024, d)).astype(np.float32))
    qp = topk2.prepare_queries(queries, "cosine")
    fence(qp[0, 0])

    # --- A/B: kernel-only, scalar-reduced ------------------------------------
    for mode in ("loop", "reshape", "high", "highest", "twolevel"):
        def scalar_fn(mode=mode):
            out = bigq_kernel(qp, corpus, aux_mul, aux_add, mode)
            if mode == "twolevel":
                return jnp.max(out[0]) + jnp.max(out[1])
            return jnp.max(out)

        jf = jax.jit(scalar_fn)
        try:
            t = timeit(lambda: jf(), iters=8)
        except Exception as e:
            print(json.dumps({"variant": f"k_{mode}", "error": str(e)[:180]}), flush=True)
            continue
        print(json.dumps({"variant": f"k_{mode}", "ms": round(t * 1e3, 3)}), flush=True)

    # --- C: selection variants (device-resident inputs, tiny outputs) --------
    two = jax.jit(functools.partial(bigq_kernel, mode="twolevel"))(
        qp, corpus, aux_mul, aux_add
    )
    bucket_max, cell_max = two
    fence(bucket_max[0, 0])

    jsel1 = jax.jit(functools.partial(topk2.topk_buckets, kp=kp))
    ref_sel = np.sort(np.asarray(jsel1(bucket_max)), axis=1)

    t = timeit(lambda: jsel1(bucket_max), iters=16)
    print(json.dumps({"variant": "sel_hier_prod", "ms": round(t * 1e3, 3)}), flush=True)

    jsel2 = jax.jit(functools.partial(sel_twolevel, kp=kp))
    got = np.sort(np.asarray(jsel2(bucket_max, cell_max)), axis=1)
    t = timeit(lambda: jsel2(bucket_max, cell_max), iters=16)
    print(json.dumps({"variant": "sel_twolevel", "ms": round(t * 1e3, 3),
                      "match": bool(np.array_equal(got, ref_sel))}), flush=True)

    # --- D: e2e prototype -----------------------------------------------------
    @functools.partial(jax.jit, static_argnames=("kk", "kp_"))
    def e2e_twolevel(qraw, corpus_, mul, add, kk, kp_):
        qp_ = topk2.prepare_queries(qraw, "cosine")
        bm, cm = bigq_kernel(qp_, corpus_, mul, add, "twolevel")
        bidx = jnp.sort(sel_twolevel(bm, cm, kp_), axis=-1)
        nb = corpus_.shape[0] // BUCKET
        rows = corpus_.reshape(nb, BUCKET, d)
        mul_b = mul.reshape(nb, BUCKET)
        add_b = add.reshape(nb, BUCKET)
        cand_v = rows[bidx]
        s = jnp.einsum("qd,qkbd->qkb", qp_, cand_v,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        s = s * mul_b[bidx] + add_b[bidx]
        q = qraw.shape[0]
        s = s.reshape(q, kp_ * BUCKET)
        lane = jnp.arange(BUCKET, dtype=jnp.int32)[None, None, :]
        ids = (bidx[:, :, None] * BUCKET + lane).reshape(q, kp_ * BUCKET)
        top_s, pos = jax.lax.top_k(s, kk)
        top_ids = jnp.take_along_axis(ids, pos, axis=1)
        dist = topk2.scores_to_distances(top_s, qraw, "cosine")
        return dist, top_ids

    t = timeit(lambda: e2e_twolevel(queries, corpus, aux_mul, aux_add, k, kp), iters=8)
    print(json.dumps({"variant": "e2e_twolevel", "ms": round(t * 1e3, 3),
                      "qps": round(1024 / t, 1)}), flush=True)

    t = timeit(lambda: topk2.topk_two_phase(corpus, queries, aux_mul, aux_add,
                                            k=k, metric="cosine"), iters=8)
    print(json.dumps({"variant": "e2e_prod", "ms": round(t * 1e3, 3),
                      "qps": round(1024 / t, 1)}), flush=True)

    d1, i1 = e2e_twolevel(queries, corpus, aux_mul, aux_add, k, kp)
    d2, i2 = topk2.topk_two_phase(corpus, queries, aux_mul, aux_add, k=k, metric="cosine")
    print(json.dumps({"check": "e2e_equal",
                      "ids_equal": bool(np.array_equal(np.asarray(i1), np.asarray(i2))),
                      "dist_close": bool(np.allclose(np.asarray(d1), np.asarray(d2),
                                                     atol=1e-5))}), flush=True)


if __name__ == "__main__":
    main()
