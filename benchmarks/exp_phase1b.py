"""Phase-1 scan micro-benchmark, round 2.

Fixes exp_phase1's flaw (large [QT, N/128] output fetched through the
tunnel distorted Q=1024 numbers): every variant reduces to ONE scalar on
device, so the fetch is 4 bytes for all shapes.

New questions:
- control: what is the raw HBM read rate for THIS array via a pure
  max-reduce (no dot)?
- does dropping lax.scan (oneshot dot) hold up at Q=1024 with
  query-chunking, or does the [N, QT] intermediate kill it?
- int8 corpus (+int8 queries, int32 MXU accumulate): does the 4x byte
  shrink translate to 4x rows/s at the same byte rate?
- bf16 oneshot for reference.

Run standalone on the real chip (ONE process):
    python -m benchmarks.exp_phase1b
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BUCKET = 128


@jax.jit
def read_ceiling(corpus):
    """Pure HBM read: elementwise max over the corpus, no MXU."""
    return jnp.max(corpus)


@jax.jit
def oneshot(queries_p, corpus, aux_mul, aux_add):
    n, d = corpus.shape
    qt = queries_p.shape[0]
    s = jax.lax.dot_general(
        corpus, queries_p, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * aux_mul[:, None] + aux_add[:, None]
    return jnp.max(s.reshape(n // BUCKET, BUCKET, qt).max(axis=1))


@jax.jit
def oneshot_int8(q8, corpus8, aux_mul, aux_add, inv_sq):
    """int8 x int8 -> int32 MXU dot; scales folded into the f32 FMA.

    aux_mul is pre-multiplied by the per-row corpus scale; inv_sq is the
    per-query 1/scale applied to aux_add (keeps per-query order exact in
    real arithmetic)."""
    n, d = corpus8.shape
    qt = q8.shape[0]
    s32 = jax.lax.dot_general(
        corpus8, q8, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [N, QT]
    s = s32.astype(jnp.float32) * aux_mul[:, None] + aux_add[:, None] * inv_sq[None, :]
    return jnp.max(s.reshape(n // BUCKET, BUCKET, qt).max(axis=1))


@jax.jit
def oneshot_bf16(qb, corpus_bf16, aux_mul, aux_add):
    n, d = corpus_bf16.shape
    qt = qb.shape[0]
    s = jax.lax.dot_general(
        corpus_bf16, qb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * aux_mul[:, None] + aux_add[:, None]
    return jnp.max(s.reshape(n // BUCKET, BUCKET, qt).max(axis=1))


@functools.partial(jax.jit, static_argnames=("block_rows",))
def scan_qv(queries_p, corpus, aux_mul, aux_add, block_rows: int):
    n, d = corpus.shape
    qt = queries_p.shape[0]
    nb = n // block_rows
    xs = (
        corpus.reshape(nb, block_rows, d),
        aux_mul.reshape(nb, block_rows),
        aux_add.reshape(nb, block_rows),
    )

    def body(carry, x):
        vb, mb, ab = x
        s = jax.lax.dot_general(
            queries_p, vb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * mb[None, :] + ab[None, :]
        m = jnp.max(s.reshape(qt, block_rows // BUCKET, BUCKET).max(axis=-1))
        return jnp.maximum(carry, m), None

    out, _ = jax.lax.scan(body, jnp.float32(-jnp.inf), xs)
    return out


@functools.partial(jax.jit, static_argnames=("block_rows",))
def scan_int8(q8, corpus8, aux_mul, aux_add, inv_sq, block_rows: int):
    n, d = corpus8.shape
    qt = q8.shape[0]
    nb = n // block_rows
    xs = (
        corpus8.reshape(nb, block_rows, d),
        aux_mul.reshape(nb, block_rows),
        aux_add.reshape(nb, block_rows),
    )

    def body(carry, x):
        vb, mb, ab = x
        s32 = jax.lax.dot_general(
            vb, q8, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [block, QT]
        s = s32.astype(jnp.float32) * mb[:, None] + ab[:, None] * inv_sq[None, :]
        m = jnp.max(s.reshape(block_rows // BUCKET, BUCKET, qt).max(axis=1))
        return jnp.maximum(carry, m), None

    out, _ = jax.lax.scan(body, jnp.float32(-jnp.inf), xs)
    return out


def timeit(fn, *args, iters=8):
    np.asarray(fn(*args))
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - start) / iters


def main():
    dev = jax.devices()[0]
    print(f"device: {getattr(dev, 'device_kind', dev)}", flush=True)
    key = jax.random.PRNGKey(0)

    n, d = 8 * 1024 * 1024, 128
    corpus = jax.random.normal(key, (n, d), dtype=jnp.float32)
    aux_mul = jnp.ones((n,), jnp.float32)
    aux_add = jnp.zeros((n,), jnp.float32)

    # int8 corpus: per-row symmetric scale
    sv = jnp.max(jnp.abs(corpus), axis=1) / 127.0
    corpus8 = jnp.clip(jnp.round(corpus / sv[:, None]), -127, 127).astype(jnp.int8)
    aux_mul8 = aux_mul * sv
    corpus_bf16 = corpus.astype(jnp.bfloat16)
    np.asarray(corpus8[0, 0])

    def report(name, t, rows, qt, bytes_per_row):
        gbs = rows * bytes_per_row / t / 1e9
        print(json.dumps({"variant": name, "qt": qt, "ms": round(t * 1e3, 2),
                          "rows_per_s_M": round(rows / t / 1e6, 1),
                          "GB_s": round(gbs, 1)}), flush=True)

    q8f = jax.random.normal(jax.random.PRNGKey(1), (8, d), dtype=jnp.float32)
    sq = jnp.max(jnp.abs(q8f), axis=1) / 127.0
    q8i = jnp.clip(jnp.round(q8f / sq[:, None]), -127, 127).astype(jnp.int8)
    inv_sq = 1.0 / sq

    t = timeit(read_ceiling, corpus)
    report("read_ceiling_fp32_4g", t, n, 0, d * 4)

    t = timeit(oneshot, q8f, corpus, aux_mul, aux_add)
    report("oneshot_fp32_q8", t, n, 8, d * 4)

    t = timeit(oneshot_bf16, q8f.astype(jnp.bfloat16), corpus_bf16, aux_mul, aux_add)
    report("oneshot_bf16_q8", t, n, 8, d * 2)

    t = timeit(oneshot_int8, q8i, corpus8, aux_mul8, aux_add, inv_sq)
    report("oneshot_int8_q8", t, n, 8, d)

    # Q=1024 on 1M rows, scalar outputs this time
    n1 = 1024 * 1024
    c1, m1, a1 = corpus[:n1], aux_mul[:n1], aux_add[:n1]
    q1024 = jax.random.normal(jax.random.PRNGKey(2), (1024, d), dtype=jnp.float32)
    sq2 = jnp.max(jnp.abs(q1024), axis=1) / 127.0
    q1024i = jnp.clip(jnp.round(q1024 / sq2[:, None]), -127, 127).astype(jnp.int8)
    inv_sq2 = 1.0 / sq2

    t = timeit(scan_qv, q1024, c1, m1, a1, 2048)
    report("scan_fp32_2k_q1024", t, n1, 1024, d * 4)

    t = timeit(oneshot, q1024, c1, m1, a1)
    report("oneshot_fp32_q1024", t, n1, 1024, d * 4)

    t = timeit(oneshot_bf16, q1024.astype(jnp.bfloat16), corpus_bf16[:n1], m1, a1)
    report("oneshot_bf16_q1024", t, n1, 1024, d * 2)

    t = timeit(scan_int8, q1024i, corpus8[:n1], aux_mul8[:n1], a1, inv_sq2, 8192)
    report("scan_int8_8k_q1024", t, n1, 1024, d)

    t = timeit(oneshot_int8, q1024i, corpus8[:n1], aux_mul8[:n1], a1, inv_sq2)
    report("oneshot_int8_q1024", t, n1, 1024, d)

    # int8 at 8M, Q=8, scan vs oneshot
    t = timeit(scan_int8, q8i, corpus8, aux_mul8, aux_add, inv_sq, 1048576)
    report("scan_int8_1m_q8", t, n, 8, d)


if __name__ == "__main__":
    main()
