"""Two-phase exact top-k search: streaming bucket maxima → rescore.

The hot loop of the engine (SURVEY.md §7 "fused top-k on TPU"). The
single-pass scan in fenix_tpu.ops.distance materializes a [Q, block]
score tile in HBM per step and runs ``lax.top_k`` against it — sort
cost and tile traffic dominate. This module splits the search:

**Phase 1 (Pallas, bandwidth-bound):** stream the corpus once through
VMEM; for every 128-row bucket emit only the bucket's max score —
a [N/128] summary per query (0.8% of corpus bytes). The kernel computes
``s = (q·v) · aux_mul + aux_add`` so one binary handles all metrics and
carries the predicate/probe mask (−inf in ``aux_add``); the matmul is
laid out transposed (rows on sublanes) so bucket maxima reduce along
sublanes with static slices — no lane shuffles, no relayouts.

**Phase 2 (XLA, tiny):** take the top ``k + pad`` buckets per query
(monotone-consistency pad — phase-1 scores are order-equivalent, not
bit-equal, to exact distances), gather those buckets' rows, rescore
exactly, and merge. Gather traffic is ``(k+pad)·128`` rows per query.

Exactness: a bucket containing a true top-k element has bucket-max ≥
that element's score, and at most k buckets hold values ≥ the k-th
best, so the top-k buckets cover the true top-k (ties resolve to the
earliest bucket under ``lax.top_k``'s stable order → smallest row id,
the engine's deterministic tie rule).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from fenix_tpu.ops.distance import NEG_INF, canonical_metric, normalize

BUCKET = 128  # rows per bucket = one sublane-tile group in the kernel
BUCKET_PAD = 8  # extra buckets gathered for fp-rounding safety


def pack_result(dist: jax.Array, ids: jax.Array) -> jax.Array:
    """[Q,k] f32 + [Q,k] i32 → [2,Q,k] **int32** (distances bitcast).

    One device→host fetch instead of two — each readback pays a full
    transport roundtrip. The carrier dtype must be integer: bitcasting
    small ints into float32 yields denormals, which TPU arithmetic
    flushes to zero (ids would silently corrupt); float bits ride
    through an int array unharmed."""
    return jnp.stack([jax.lax.bitcast_convert_type(dist, jnp.int32), ids])


def unpack_result(packed) -> tuple:
    import numpy as np

    packed = np.asarray(packed)
    return packed[0].view(np.float32), packed[1]


# -- metric preparation ----------------------------------------------------


def prepare_queries(queries: jax.Array, metric: str) -> jax.Array:
    """Query-side transform so phase-1 score is ``q'·v·aux_mul + aux_add``."""
    metric = canonical_metric(metric)
    if metric == "l2":
        return 2.0 * queries
    if metric == "cosine":
        return normalize(queries)
    return queries


def prepare_aux(
    corpus: jax.Array, mask: jax.Array | None, metric: str
) -> tuple[jax.Array, jax.Array]:
    """Per-row (aux_mul, aux_add) for the fused score.

    l2:     s = 2·q·v − ‖v‖²          (order = −dist² order)
    cosine: s = q̂·v / ‖v‖            (order = cos order)
    dot:    s = q·v
    Masked rows get aux_add = −inf. Computed once per (corpus, mask,
    metric) and cached by the engine next to the corpus blocks.
    """
    metric = canonical_metric(metric)
    sq = jnp.sum(jnp.square(corpus), axis=-1)  # [N]
    if metric == "l2":
        aux_mul = jnp.ones_like(sq)
        aux_add = -sq
    elif metric == "cosine":
        aux_mul = 1.0 / jnp.maximum(jnp.sqrt(sq), 1e-12)
        aux_add = jnp.zeros_like(sq)
    else:
        aux_mul = jnp.ones_like(sq)
        aux_add = jnp.zeros_like(sq)
    if mask is not None:
        aux_add = jnp.where(mask, aux_add, NEG_INF)
    return aux_mul, aux_add


def scores_to_distances(scores: jax.Array, queries: jax.Array, metric: str) -> jax.Array:
    """Exact distance from fused score (reference coder.py:38-50 values)."""
    metric = canonical_metric(metric)
    if metric == "l2":
        uu = jnp.sum(jnp.square(queries), axis=-1, keepdims=True)  # [Q, 1]
        return jnp.sqrt(jnp.maximum(uu - scores, 0.0))
    if metric == "cosine":
        return 0.5 - 0.5 * scores
    return -scores


# -- phase 1: bucket maxima ------------------------------------------------


def bucket_scores_xla(
    queries_p: jax.Array,  # [QT, D] prepared
    corpus: jax.Array,  # [N, D]
    aux_mul: jax.Array,  # [N]
    aux_add: jax.Array,  # [N]
) -> jax.Array:  # [QT, N // BUCKET]
    """Reference/CPU fallback for the Pallas kernel (same math)."""
    s = jax.lax.dot_general(
        queries_p,
        corpus,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * aux_mul[None, :] + aux_add[None, :]
    qt, n = s.shape
    return s.reshape(qt, n // BUCKET, BUCKET).max(axis=-1)


def _pallas_kernel(q_ref, v_ref, mul_ref, add_ref, out_ref):
    """One (query-tile, row-block) cell: transposed matmul + per-bucket
    sublane max over static 128-row slices."""
    s = jax.lax.dot_general(
        v_ref[:],
        q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, QT] — rows on sublanes
    s = s * mul_ref[:][:, None] + add_ref[:][:, None]

    b = s.shape[0]
    for j in range(b // BUCKET):
        chunk = s[j * BUCKET : (j + 1) * BUCKET]  # [128, QT], tile-aligned
        out_ref[0, j, :] = jnp.max(chunk, axis=0)


def bucket_scores_pallas(
    queries_p: jax.Array,  # [QT, D]
    corpus: jax.Array,  # [N, D]
    aux_mul: jax.Array,
    aux_add: jax.Array,
    block_rows: int = 1024,
) -> jax.Array:  # [QT, N // BUCKET]
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    qt, d = queries_p.shape
    n = corpus.shape[0]
    assert n % block_rows == 0 and block_rows % BUCKET == 0
    nb = n // block_rows
    buckets_per_block = block_rows // BUCKET

    out = pl.pallas_call(
        _pallas_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((qt, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, buckets_per_block, qt), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nb, buckets_per_block, qt), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * qt * d,
            bytes_accessed=n * d * 4 + n * 8 + qt * d * 4 + (n // BUCKET) * qt * 4,
            transcendentals=0,
        ),
    )(queries_p, corpus, aux_mul, aux_add)

    # (nb, bpb, QT) → (QT, nb·bpb): small array, XLA transpose
    return out.reshape(nb * buckets_per_block, qt).T


def bucket_scores_scan(
    queries_p: jax.Array,  # [QT, D]
    corpus: jax.Array,  # [N, D]
    aux_mul: jax.Array,
    aux_add: jax.Array,
    block_rows: int = 262144,
) -> jax.Array:  # [QT, N // BUCKET]
    """Phase 1 as a ``lax.scan`` over corpus blocks.

    Each step is matmul → scale/shift → per-bucket max — XLA fuses the
    reduction into the matmul consumer, so per-step traffic is the
    corpus block plus the tiny [QT, block/128] summary. No per-block
    ``top_k``, no cross-block carry: selection happens once at the end
    (topk_two_phase). Compiles as plain XLA — the safe default until
    the Pallas kernel wins.
    """
    n, d = corpus.shape
    qt = queries_p.shape[0]
    # largest power-of-two block ≤ block_rows that divides N_pad
    cand = min(block_rows, n)
    while cand > BUCKET and n % cand != 0:
        cand //= 2
    block_rows = cand
    if n % block_rows != 0 or n == block_rows:
        return bucket_scores_xla(queries_p, corpus, aux_mul, aux_add)
    nb = n // block_rows

    xs = (
        corpus.reshape(nb, block_rows, d),
        aux_mul.reshape(nb, block_rows),
        aux_add.reshape(nb, block_rows),
    )

    # bf16 corpus → bf16 score tiles: halves the materialized s-tile
    # traffic and doubles MXU rate; selection-only precision (the final
    # top_k over bucket maxima happens in f32 upstream).
    acc_dtype = jnp.bfloat16 if corpus.dtype == jnp.bfloat16 else jnp.float32

    def body(_, x):
        vb, mb, ab = x
        s = jax.lax.dot_general(
            queries_p,
            vb,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc_dtype,
        )
        s = s * mb[None, :].astype(acc_dtype) + ab[None, :].astype(acc_dtype)
        out = s.reshape(qt, block_rows // BUCKET, BUCKET).max(axis=-1)
        return None, out

    _, stacked = jax.lax.scan(body, None, xs)  # [nb, QT, block//BUCKET]
    out = jnp.transpose(stacked, (1, 0, 2)).reshape(qt, n // BUCKET)
    return out.astype(jnp.float32)


def bucket_scores_scan_probed(
    queries_p: jax.Array,  # [QT, D]
    corpus: jax.Array,  # [N, D]
    aux_mul: jax.Array,
    aux_add: jax.Array,
    coded: jax.Array,  # [N] int32 cell ids
    cells: jax.Array,  # [QT, P] per-query probe cells
    block_rows: int = 262144,
) -> jax.Array:  # [QT, N // BUCKET]
    """Phase 1 with per-query IVF probe masks applied inside the scan
    (reference index.py:113-126 semantics, per query)."""
    n, d = corpus.shape
    qt = queries_p.shape[0]
    cand = min(block_rows, n)
    while cand > BUCKET and n % cand != 0:
        cand //= 2
    block_rows = cand
    nb = max(n // block_rows, 1)

    xs = (
        corpus.reshape(nb, block_rows, d),
        aux_mul.reshape(nb, block_rows),
        aux_add.reshape(nb, block_rows),
        coded.reshape(nb, block_rows),
    )

    def body(_, x):
        vb, mb, ab, cb = x
        s = jax.lax.dot_general(
            queries_p,
            vb,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * mb[None, :] + ab[None, :]
        probe_ok = (cb[None, :, None] == cells[:, None, :]).any(axis=-1)  # [QT, B]
        s = jnp.where(probe_ok, s, NEG_INF)
        out = s.reshape(qt, block_rows // BUCKET, BUCKET).max(axis=-1)
        return None, out

    _, stacked = jax.lax.scan(body, None, xs)
    return jnp.transpose(stacked, (1, 0, 2)).reshape(qt, n // BUCKET)


@functools.partial(jax.jit, static_argnames=("k", "metric", "block_rows"))
def topk_two_phase_probed(
    corpus: jax.Array,  # [N_pad, D]
    queries: jax.Array,  # [Q, D]
    aux_mul: jax.Array,
    aux_add: jax.Array,
    coded: jax.Array,  # [N_pad] int32 (−1 on padding)
    cells: jax.Array,  # [Q, P] int32 probe cells per query
    k: int,
    metric: str,
    block_rows: int = 262144,
) -> tuple[jax.Array, jax.Array]:
    """Probed (IVF) exact-within-probes top-k, two-phase."""
    metric = canonical_metric(metric)
    n, d = corpus.shape
    q = queries.shape[0]
    n_buckets = n // BUCKET

    queries_p = prepare_queries(queries, metric)
    bucket_max = bucket_scores_scan_probed(
        queries_p, corpus, aux_mul, aux_add, coded, cells, block_rows
    )

    kp = min(k + BUCKET_PAD, n_buckets)
    _, bidx = jax.lax.top_k(bucket_max, kp)
    bidx = jnp.sort(bidx, axis=-1)

    rows = corpus.reshape(n_buckets, BUCKET, d)
    mul_b = aux_mul.reshape(n_buckets, BUCKET)
    add_b = aux_add.reshape(n_buckets, BUCKET)
    coded_b = coded.reshape(n_buckets, BUCKET)
    kk = min(k, kp * BUCKET)
    lane_iota = jnp.arange(BUCKET, dtype=jnp.int32)[None, None, :]

    def rescore_chunk(args):
        qp_c, bidx_c, cells_c = args
        cand_v = rows[bidx_c]
        s = jnp.einsum("qd,qkbd->qkb", qp_c, cand_v, preferred_element_type=jnp.float32)
        s = s * mul_b[bidx_c] + add_b[bidx_c]
        probe_ok = (coded_b[bidx_c][:, :, :, None] == cells_c[:, None, None, :]).any(-1)
        s = jnp.where(probe_ok, s, NEG_INF)
        c = qp_c.shape[0]
        s = s.reshape(c, kp * BUCKET)
        ids = (bidx_c[:, :, None] * BUCKET + lane_iota).reshape(c, kp * BUCKET)
        top_s, pos = jax.lax.top_k(s, kk)
        return top_s, jnp.take_along_axis(ids, pos, axis=1)

    chunk = min(q, 64)
    pad_rows = (-q) % chunk
    if pad_rows:
        queries_p2 = jnp.concatenate([queries_p, jnp.zeros((pad_rows, d), queries_p.dtype)])
        bidx2 = jnp.concatenate([bidx, jnp.zeros((pad_rows, kp), bidx.dtype)])
        cells2 = jnp.concatenate(
            [cells, jnp.full((pad_rows, cells.shape[1]), -1, cells.dtype)]
        )
    else:
        queries_p2, bidx2, cells2 = queries_p, bidx, cells

    nc = queries_p2.shape[0] // chunk
    top_s, top_ids = jax.lax.map(
        rescore_chunk,
        (
            queries_p2.reshape(nc, chunk, d),
            bidx2.reshape(nc, chunk, kp),
            cells2.reshape(nc, chunk, cells.shape[1]),
        ),
    )
    top_s = top_s.reshape(nc * chunk, kk)[:q]
    top_ids = top_ids.reshape(nc * chunk, kk)[:q]

    if kk < k:
        pad = k - kk
        top_s = jnp.concatenate([top_s, jnp.full((q, pad), NEG_INF)], axis=1)
        top_ids = jnp.concatenate([top_ids, jnp.full((q, pad), -1, jnp.int32)], axis=1)

    dist = scores_to_distances(top_s, queries, metric)
    dist = jnp.where(top_s == NEG_INF, jnp.inf, dist)
    top_ids = jnp.where(top_s == NEG_INF, -1, top_ids)
    return dist, top_ids


def _use_pallas() -> bool:
    return False  # Pallas phase 1 pending a compile-safe reduction


# -- phase 2: gather + exact rescore --------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "metric", "block_rows"))
def topk_two_phase(
    corpus: jax.Array,  # [N_pad, D]
    queries: jax.Array,  # [Q, D]
    aux_mul: jax.Array,  # [N_pad]
    aux_add: jax.Array,  # [N_pad]  (−inf on masked/padding rows)
    k: int,
    metric: str,
    block_rows: int = 262144,
    corpus_scan: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k: (distances [Q, k], row ids [Q, k]; +inf / −1 padding).

    ``corpus_scan`` optionally substitutes a lower-precision (bf16)
    copy for phase 1 — half the HBM scan traffic. Phase 2 always
    rescores candidates against the fp32 ``corpus``, so returned
    distances stay exact fp32; only bucket *selection* becomes
    approximate (recall ≈ 1 with the BUCKET_PAD margin; opt-in via the
    executor's ``precision`` knob)."""
    metric = canonical_metric(metric)
    n, d = corpus.shape
    q = queries.shape[0]
    n_buckets = n // BUCKET

    queries_p = prepare_queries(queries, metric)

    scan_c = corpus if corpus_scan is None else corpus_scan
    scan_q = queries_p if corpus_scan is None else queries_p.astype(corpus_scan.dtype)

    if _use_pallas():
        bucket_max = bucket_scores_pallas(scan_q, scan_c, aux_mul, aux_add, block_rows)
    else:
        bucket_max = bucket_scores_scan(scan_q, scan_c, aux_mul, aux_add)

    kp = min(k + BUCKET_PAD, n_buckets)
    _, bidx = jax.lax.top_k(bucket_max, kp)  # [Q, kp], stable ties
    # gather in ascending bucket order so final ties resolve to smallest id
    bidx = jnp.sort(bidx, axis=-1)

    rows = corpus.reshape(n_buckets, BUCKET, d)
    mul_b = aux_mul.reshape(n_buckets, BUCKET)
    add_b = aux_add.reshape(n_buckets, BUCKET)
    kk = min(k, kp * BUCKET)
    lane_iota = jnp.arange(BUCKET, dtype=jnp.int32)[None, None, :]

    def rescore_chunk(args):
        """Gather + exact rescore for one query chunk (bounds VMEM/HBM
        footprint of the [chunk, kp, 128, D] candidate gather)."""
        qp_c, bidx_c = args  # [C, D], [C, kp]
        cand_v = rows[bidx_c]  # [C, kp, BUCKET, D]
        s = jnp.einsum("qd,qkbd->qkb", qp_c, cand_v, preferred_element_type=jnp.float32)
        s = s * mul_b[bidx_c] + add_b[bidx_c]
        c = qp_c.shape[0]
        s = s.reshape(c, kp * BUCKET)
        ids = (bidx_c[:, :, None] * BUCKET + lane_iota).reshape(c, kp * BUCKET)
        top_s, pos = jax.lax.top_k(s, kk)
        return top_s, jnp.take_along_axis(ids, pos, axis=1)

    chunk = min(q, 64)
    if q % chunk != 0:
        pad_rows = (-q) % chunk
        queries_p2 = jnp.concatenate([queries_p, jnp.zeros((pad_rows, d), queries_p.dtype)])
        bidx2 = jnp.concatenate([bidx, jnp.zeros((pad_rows, kp), bidx.dtype)])
    else:
        pad_rows = 0
        queries_p2, bidx2 = queries_p, bidx

    nc = queries_p2.shape[0] // chunk
    top_s, top_ids = jax.lax.map(
        rescore_chunk,
        (queries_p2.reshape(nc, chunk, d), bidx2.reshape(nc, chunk, kp)),
    )
    top_s = top_s.reshape(nc * chunk, kk)[:q]
    top_ids = top_ids.reshape(nc * chunk, kk)[:q]

    if kk < k:  # pad to k
        pad = k - kk
        top_s = jnp.concatenate([top_s, jnp.full((q, pad), NEG_INF)], axis=1)
        top_ids = jnp.concatenate([top_ids, jnp.full((q, pad), -1, jnp.int32)], axis=1)

    dist = scores_to_distances(top_s, queries, metric)
    dist = jnp.where(top_s == NEG_INF, jnp.inf, dist)
    top_ids = jnp.where(top_s == NEG_INF, -1, top_ids)
    return dist, top_ids
