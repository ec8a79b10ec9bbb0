"""Phase-1 scan micro-benchmark: matmul orientation + block sizing.

Hypotheses under test (docs/DESIGN.md "known next steps"):

H1 (orientation): ``dot(queries, block)`` makes the corpus the MXU's
   *stationary* operand — every 128x128 corpus tile pays a ~128-cycle
   weight load for only QT rows of streaming work, capping the scan at
   ~<500 GB/s regardless of HBM speed. Flipping to ``dot(block,
   queries)`` streams the corpus through a stationary query matrix.

H2 (block sizing): the per-step score tile is [QT, block] fp32. At
   QT=1024, block=262144 that is 1 GB — far beyond VMEM, so XLA spills
   it to HBM (8 GB of extra traffic at 1M rows). Shrinking block so
   QT*block*4 fits in ~8 MB should restore fusion.

Run standalone on the real chip (ONE process):
    python -m benchmarks.exp_phase1
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BUCKET = 128


def _blocks(n: int, want: int) -> int:
    cand = min(want, n)
    while cand > BUCKET and n % cand != 0:
        cand //= 2
    return cand


@functools.partial(jax.jit, static_argnames=("block_rows",))
def scan_qv(queries_p, corpus, aux_mul, aux_add, block_rows: int):
    """Current production orientation: [QT, block] tiles."""
    n, d = corpus.shape
    qt = queries_p.shape[0]
    br = _blocks(n, block_rows)
    nb = n // br
    xs = (corpus.reshape(nb, br, d), aux_mul.reshape(nb, br), aux_add.reshape(nb, br))

    def body(_, x):
        vb, mb, ab = x
        s = jax.lax.dot_general(
            queries_p, vb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * mb[None, :] + ab[None, :]
        return None, s.reshape(qt, br // BUCKET, BUCKET).max(axis=-1)

    _, stacked = jax.lax.scan(body, None, xs)
    return jnp.transpose(stacked, (1, 0, 2)).reshape(qt, n // BUCKET)


@functools.partial(jax.jit, static_argnames=("block_rows", "unroll"))
def scan_vq(queries_p, corpus, aux_mul, aux_add, block_rows: int, unroll: int = 1):
    """Flipped orientation: corpus streams as LHS, queries stationary."""
    n, d = corpus.shape
    qt = queries_p.shape[0]
    br = _blocks(n, block_rows)
    nb = n // br
    xs = (corpus.reshape(nb, br, d), aux_mul.reshape(nb, br), aux_add.reshape(nb, br))

    def body(_, x):
        vb, mb, ab = x
        s = jax.lax.dot_general(
            vb, queries_p, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [br, QT]
        s = s * mb[:, None] + ab[:, None]
        out = s.reshape(br // BUCKET, BUCKET, qt).max(axis=1)  # [br/128, QT]
        return None, out

    _, stacked = jax.lax.scan(body, None, xs, unroll=unroll)
    # [nb, br/128, QT] -> [QT, n/128]
    return jnp.transpose(stacked.reshape(n // BUCKET, qt), (1, 0))


@jax.jit
def oneshot_vq(queries_p, corpus, aux_mul, aux_add):
    """No scan: single dot over the whole corpus, flipped orientation."""
    n, d = corpus.shape
    qt = queries_p.shape[0]
    s = jax.lax.dot_general(
        corpus, queries_p, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * aux_mul[:, None] + aux_add[:, None]
    return jnp.transpose(s.reshape(n // BUCKET, BUCKET, qt).max(axis=1), (1, 0))


def timeit(fn, *args, iters=8):
    np.asarray(fn(*args))  # compile + warm
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - start) / iters


def main():
    dev = jax.devices()[0]
    print(f"device: {getattr(dev, 'device_kind', dev)}", flush=True)
    key = jax.random.PRNGKey(0)

    n, d = 8 * 1024 * 1024, 128  # 4 GB fp32 — dispatch amortized
    corpus = jax.random.normal(key, (n, d), dtype=jnp.float32)
    aux_mul = jnp.ones((n,), jnp.float32)
    aux_add = jnp.zeros((n,), jnp.float32)
    np.asarray(corpus[0, 0])  # materialize

    results = {}

    def report(name, t, rows, qt):
        gbs = rows * d * 4 / t / 1e9
        results[name] = round(gbs, 1)
        print(json.dumps({"variant": name, "qt": qt, "ms": round(t * 1e3, 2),
                          "rows_per_s": round(rows / t / 1e6, 1), "GB_s": round(gbs, 1)}),
              flush=True)

    q8 = jax.random.normal(jax.random.PRNGKey(1), (8, d), dtype=jnp.float32)

    t = timeit(scan_qv, q8, corpus, aux_mul, aux_add, 262144)
    report("qv_scan_262k_q8", t, n, 8)

    t = timeit(scan_vq, q8, corpus, aux_mul, aux_add, 262144)
    report("vq_scan_262k_q8", t, n, 8)

    t = timeit(scan_vq, q8, corpus, aux_mul, aux_add, 1048576)
    report("vq_scan_1m_q8", t, n, 8)

    t = timeit(oneshot_vq, q8, corpus, aux_mul, aux_add)
    report("vq_oneshot_q8", t, n, 8)

    # Q=1024 on 1M rows (bench config-1 batch shape)
    n1 = 1024 * 1024
    c1, m1, a1 = corpus[:n1], aux_mul[:n1], aux_add[:n1]
    q1024 = jax.random.normal(jax.random.PRNGKey(2), (1024, d), dtype=jnp.float32)

    t = timeit(scan_qv, q1024, c1, m1, a1, 262144)
    report("qv_scan_262k_q1024", t, n1, 1024)

    t = timeit(scan_vq, q1024, c1, m1, a1, 2048)
    report("vq_scan_2k_q1024", t, n1, 1024)

    t = timeit(scan_vq, q1024, c1, m1, a1, 16384)
    report("vq_scan_16k_q1024", t, n1, 1024)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
