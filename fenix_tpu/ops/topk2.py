"""Two-phase exact top-k search: bucket maxima → select → rescore.

The hot loop of the engine (SURVEY.md §7 "fused top-k on TPU"). The
single-pass scan in fenix_tpu.ops.distance materializes a [Q, block]
score tile in HBM per step and runs ``lax.top_k`` against it — sort
cost and tile traffic dominate. This module splits the search:

**Phase 1 (bandwidth-bound):** one pass over the corpus emits, per
``bucket`` rows (128, or 32 for large query batches), the max of the
fused score ``s = (q·v) · aux_mul + aux_add`` — one formula for all
metrics, with predicate/probe masks as −inf in ``aux_add``. Three
measured lowerings (docs/DESIGN.md): an unblocked dot at small Q
(~96 % of the HBM read ceiling), the fused Pallas kernel at large Q
(VMEM score tiles, no [N, Q] intermediate), and a VMEM-fusable
``lax.scan`` as the shape-generic fallback. Scan dtype options: fp32
(exact), bf16 copy, int8 per-row-quantized copy (selection-only
precision; opt-in).

**Phase 2 (small):** top ``k + pad`` buckets per query via
hierarchical selection (TPU top-k is sort-like), gather those buckets'
rows, rescore exactly in fp32 (Precision.HIGHEST), merge.

Phase-1 matmul precision: the small-Q oneshot runs Precision.HIGH
(three-pass bf16 — measured identical selected ids to HIGHEST on
random data, at lower cost; see bucket_scores_xla). The large-Q
Pallas kernel runs the TPU DEFAULT one-bf16-pass dot — fp32-true
passes measured +7.3 ms of 5.3 ms at Q=1024/1M
(benchmarks/exp_int8_slice.py). So in BOTH regimes phase-1 *selection*
is bf16-graded even in fp32 mode, protected by the BUCKET_PAD
candidate margin like the explicit bf16/int8 scan modes (returned
distances are always fp32-true from the phase-2 rescore; recall@16
measured 1.0 on chip vs a fp32-true oneshot ranking, and
tests/test_topk_adversarial.py pins the margin on near-tied corpora
against a float64 oracle).

Exactness: a bucket containing a true top-k element has bucket-max ≥
that element's score, and at most k buckets hold values ≥ the k-th
best, so the top-k buckets cover the true top-k (ties resolve to the
earliest bucket under ``lax.top_k``'s stable order → smallest row id,
the engine's deterministic tie rule; the IVF-clustered kernel enforces
the id rule explicitly via topk_values_min_id).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from fenix_tpu.ops.distance import NEG_INF, canonical_metric, normalize

BUCKET = 128  # rows per bucket = one sublane-tile group in the kernel
# Finer rescore granularity for big query batches: phase-2 gather
# traffic is kp·bucket·D per query, and at Q=1024 the 32-row bucket
# measured 16.0 vs 19.4 ms (benchmarks/exp_bucket.py); at Q≤64 the
# coarse bucket's cheaper phase-1 reduction wins (3.3 vs 4.6 ms).
BUCKET_LARGE_Q = 32
_BUCKET_SWITCH_Q = 64  # above this query count use BUCKET_LARGE_Q
BUCKET_PAD = 8  # extra buckets gathered for fp-rounding safety

# Phase-1 strategy (measured on v5e, benchmarks/exp_phase1{,b}.py):
# a single unblocked dot streams the corpus at ~96% of the achievable
# HBM read rate, while a lax.scan over blocks stalls between steps
# (~2.6x slower at Q=8). The dot materializes a [N, Q] f32/i32 tile in
# HBM, so it only wins while that intermediate is modest; above the cap
# we fall back to a scan whose per-step [Q, block] tile fits VMEM (XLA
# then fuses the bucket-max into the matmul — zero intermediate
# traffic, MXU-bound).
ONESHOT_INTERMEDIATE_CAP = 4 << 30  # bytes of [N, Q] tile tolerated
ONESHOT_MAX_Q = 32  # above this the [N, Q] tile outweighs the corpus read
FUSABLE_TILE_BYTES = 8 << 20  # per-step [Q, block] tile target (≤ half VMEM)
_RESCORE_GATHER_CAP = 2 << 30  # phase-2 [Q, kp, 128, D] gather staging cap


def _fusable_block(n: int, qt: int, requested: int | None = None) -> int:
    """Largest power-of-two row block with a VMEM-fusable [qt, block]
    f32 tile that divides ``n`` (corpora are padded to 16384-row
    multiples upstream, so powers of two up to 16384 always divide)."""
    want = requested or max(FUSABLE_TILE_BYTES // (4 * qt), BUCKET)
    cand = min(want, n)
    while cand > BUCKET and n % cand != 0:
        cand //= 2
    return cand


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

    from fenix_tpu.utils import profiling

    with profiling.annotate("fenix.fetch"):  # device→host readback
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


@jax.jit
def quantize_corpus_int8(corpus: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 quantization: ``v ≈ sv · v8``.

    Returns (v8 [N, D] int8, sv [N] f32). Quarter the scan traffic of
    fp32; phase 2 always rescores in fp32 so returned distances are
    exact — only bucket *selection* sees quantization error (recall ≈ 1
    with the BUCKET_PAD margin; opt-in via the executor's
    ``precision="int8"`` knob, same contract as bf16).

    jit at the def site: called eagerly on a multi-GB corpus the
    unfused divide/round/clip chain materializes ~3 corpus-sized fp32
    intermediates and OOMs a chip the corpus itself fits comfortably
    (hit at 2M×768 on 16 GB); fused, the only new allocations are the
    int8 copy and the [N] scale. Inside other jits it inlines."""
    sv = jnp.max(jnp.abs(corpus), axis=-1) / 127.0
    sv = jnp.maximum(sv, 1e-30)  # zero rows quantize to zeros
    v8 = jnp.clip(jnp.round(corpus / sv[:, None]), -127, 127).astype(jnp.int8)
    return v8, sv


def quantize_rows_int8_np(block) -> tuple:
    """Host (numpy) mirror of :func:`quantize_corpus_int8`: same max/127
    scale, same 1e-30 zero-row floor, same round+clip. THE single
    host-side quantizer — session.int8_solo and the residency streaming
    path both call it, so there is exactly one host implementation to
    keep in sync with the device one above (round-4 review finding:
    three hand copies of these constants). Host and device scales can
    differ by 1 ulp (XLA folds /127 into a reciprocal multiply) — the
    serving contract is unaffected because final distances are always
    fp32-rescored against the SAME scales that produced the codes."""
    import numpy as np

    block = np.asarray(block, np.float32)
    sv = np.maximum(
        np.abs(block).max(axis=1, initial=0.0) / 127.0, 1e-30
    ).astype(np.float32)
    v8 = np.clip(np.round(block / sv[:, None]), -127, 127).astype(np.int8)
    return v8, sv


def quantize_queries_int8(queries_p: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-query symmetric int8 quantization of *prepared* queries.

    Returns (q8 [Q, D] int8, inv_sq [Q] f32). The per-query scale is a
    positive constant within each query's score row, so dividing
    ``aux_add`` by it (instead of multiplying the dot) preserves the
    per-query score ORDER exactly in real arithmetic."""
    sq = jnp.max(jnp.abs(queries_p), axis=-1) / 127.0
    sq = jnp.maximum(sq, 1e-30)
    q8 = jnp.clip(jnp.round(queries_p / sq[:, None]), -127, 127).astype(jnp.int8)
    return q8, 1.0 / sq


def bucket_scores_scan_int8(
    q8: jax.Array,  # [QT, D] int8
    corpus8: jax.Array,  # [N, D] int8
    aux_mul_s: jax.Array,  # [N] f32 — aux_mul · sv (corpus scale folded in)
    aux_add: jax.Array,  # [N] f32
    inv_sq: jax.Array,  # [QT] f32 — per-query 1/scale
    bucket: int = BUCKET,
) -> jax.Array:  # [QT, N // bucket]
    """int8 phase 1: s8[q,i] = (q8·v8)·sv_i·aux_mul_i + aux_add_i/sq_q.

    The dot runs int8×int8 on the MXU; scales fold into the f32 FMA
    epilogue. Per query this is the exact score divided by sq_q — a
    positive constant — so bucket ranking matches fp32 up to int8
    rounding of the dot.

    Accumulation dtype: f32 when d ≤ 1024 (127²·d < 2²⁴ ⇒ every
    partial sum is an exactly-representable integer — bitwise equal to
    i32), i32 above. The f32 form matters for speed, not just purity:
    with an i32 dot output XLA will not fuse the convert+FMA+bucket-max
    epilogue into the matmul and materializes the [QT, N] i32 tile in
    HBM (+2·4·N·QT bytes ≈ 33 % at QT=8/d=128 — measured 2.95 vs
    4.4 B rows/s, benchmarks/exp_int8_fuse.py); the f32 form is the
    same epilogue shape as the fp32 path, which fuses free."""
    n, d = corpus8.shape
    qt = q8.shape[0]
    acc_t = jnp.float32 if d <= 1024 else jnp.int32

    def fuse(s32, mb, ab):
        s = s32.astype(jnp.float32) * mb[None, :] + ab[None, :] * inv_sq[:, None]
        return s.reshape(qt, -1, bucket).max(axis=-1)

    # At large Q the oneshot's [N, QT] int32 intermediate materializes
    # in HBM (the bucket-max no longer fuses into the dot once it has a
    # real consumer) and costs more than the corpus read; the
    # VMEM-fusable scan avoids it entirely (21 vs 42 ms end-to-end at
    # Q=1024/1M, benchmarks/exp_twophase.py run 2 vs 3).
    if qt <= ONESHOT_MAX_Q and n * qt * 4 <= ONESHOT_INTERMEDIATE_CAP:
        s32 = jax.lax.dot_general(
            q8,
            corpus8,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc_t,
        )  # [QT, N]
        return fuse(s32, aux_mul_s, aux_add)

    if _bigq_eligible(n, qt, d, 1, int8_mode=True):
        return bucket_scores_pallas_bigq(
            q8, corpus8, aux_mul_s, aux_add, inv_sq=inv_sq, bucket=bucket
        )

    block_rows = _fusable_block(n, qt)
    if n % block_rows != 0 or n == block_rows:
        # awkward n (tiny shards): fall back to one unblocked dot —
        # same fallback as the fp32 twin
        s32 = jax.lax.dot_general(
            q8,
            corpus8,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc_t,
        )
        return fuse(s32, aux_mul_s, aux_add)
    nb = max(n // block_rows, 1)
    xs = (
        corpus8.reshape(nb, block_rows, d),
        aux_mul_s.reshape(nb, block_rows),
        aux_add.reshape(nb, block_rows),
    )

    def body(_, x):
        vb, mb, ab = x
        s32 = jax.lax.dot_general(
            q8,
            vb,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc_t,
        )  # [QT, block]
        return None, fuse(s32, mb, ab)

    _, stacked = jax.lax.scan(body, None, xs)
    return jnp.transpose(stacked, (1, 0, 2)).reshape(qt, n // bucket)


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
    bucket: int = BUCKET,
) -> jax.Array:  # [QT, N // bucket]
    """Unblocked phase 1: one dot over the whole corpus.

    The production fast path for small query batches: XLA's dot
    streams HBM at ~96% of the measured read ceiling, where a blocked
    ``lax.scan`` stalls between steps (benchmarks/exp_phase1b.py). The
    [QT, N] score tile it materializes costs QT/64 of the corpus bytes
    in extra traffic — bucket_scores_scan switches to the blocked form
    past ONESHOT_INTERMEDIATE_CAP."""
    # bf16 corpus → bf16 accumulate + bf16 score tile: halves the
    # materialized [QT, N] intermediate and doubles MXU rate
    # (selection-only precision; rescore is fp32 upstream). fp32 corpus
    # → HIGH (bf16_3x): at Q=8 the MXU runs at 8/128-lane utilization,
    # so HIGHEST's extra passes stop hiding under the HBM read and the
    # whole two-phase pipeline loses ~12% at 8M (benchmarks/exp_resid2:
    # full 7.28 → 6.44 ms, 590 → 667 GB/s). Phase-1 scores were never
    # the exact form anyway — BUCKET_PAD covers the phase-1-score vs
    # phase-2-distance rounding gap — and bf16_3x selection picked
    # identical ids to HIGHEST on 10k random top-16 queries (ids_equal);
    # the blocked fallback below runs DEFAULT (one bf16 pass), so HIGH
    # here is the *stricter* of the two fp32 lowerings.
    acc = jnp.bfloat16 if corpus.dtype == jnp.bfloat16 else jnp.float32
    s = jax.lax.dot_general(
        queries_p,
        corpus,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=acc,
        precision=(
            jax.lax.Precision.HIGH if acc == jnp.float32 else jax.lax.Precision.DEFAULT
        ),
    )
    s = s * aux_mul[None, :].astype(acc) + aux_add[None, :].astype(acc)
    qt, n = s.shape
    return s.reshape(qt, n // bucket, bucket).max(axis=-1).astype(jnp.float32)


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


# -- large-Q fused kernel ----------------------------------------------------
#
# For big query batches neither XLA form is free: the unblocked dot
# materializes an [N, QT] tile in HBM (at Q=1024/1M rows that is 4 GB —
# the measured 5 ms floor of exp_phase1b is exactly that tile's traffic)
# and the VMEM-fusable scan stalls between steps. A Pallas kernel
# computes the [BN, BQ] score tile in VMEM and writes only the [BN/128,
# BQ] bucket maxima — 1/128th of the oneshot's intermediate traffic —
# leaving the MXU as the only floor.

# Grid cell: per-cell overhead dominates this kernel (fp32 and bf16
# time identically), so bigger tiles win — (2048, 1024) measured
# 8.79 ms vs (1024, 256)'s 12.3 ms at Q=1024/1M
# (benchmarks/exp_bigq_tiles.py, exp sweep 2); (4096, 1024) exceeds
# VMEM and collapses to 16.6 ms, which the _bigq_eligible gate rejects.
_BIGQ_BN = 2048  # corpus rows per grid cell (BN/bucket ≥ 8: output tile sublanes)
_BIGQ_BQ = 1024  # preferred queries per grid cell


_BIGQ_VMEM_BUDGET = 12 << 20  # of the 16 MB VMEM

# Smallest query tile the kernel offers; batches above ONESHOT_MAX_Q
# that don't divide it are padded up to it (topk_two_phase mid-Q route).
_BIGQ_MIN_Q = 256


def _bigq_vmem(bn: int, bq: int, d: int, itemsize: int, int8_mode: bool) -> int:
    # int8 converts i32→f32 per bucket slice inside the reduction loop,
    # so both modes hold exactly ONE [bn, bq] 4-byte score tile.
    del int8_mode
    return (
        2 * bn * d * itemsize  # corpus block, double-buffered
        + 2 * bq * d * itemsize  # query block
        + bn * bq * 4  # score tile
        + 3 * bn * 4  # aux blocks
    )


def _bigq_tiles(qt: int, d: int, itemsize: int, int8_mode: bool) -> tuple[int, int] | None:
    """Largest (row-block, query-tile) pair that divides the batch AND
    fits VMEM, or None. Larger tiles cut per-cell overhead — the
    kernel's measured floor — so prefer wide, then degrade: high-dim
    corpora step the row block down before losing the kernel."""
    for bn in (_BIGQ_BN, 1024):
        for bq in (_BIGQ_BQ, 512, 256):
            if qt % bq == 0 and _bigq_vmem(bn, bq, d, itemsize, int8_mode) <= _BIGQ_VMEM_BUDGET:
                return bn, bq
    return None


def _make_bigq_kernel(bn: int, bucket: int, int8_mode: bool):
    """Kernel factory: [BN, BQ] scores in VMEM, per-``bucket``-row
    maxima out. Rows ride sublanes; queries ride lanes (wide lane
    tiles, no layout waste — the round-1 kernel's QT=8 lane dim wasted
    15/16 of every vector op)."""

    def kernel_f32(q_ref, v_ref, mul_ref, add_ref, out_ref):
        s = jax.lax.dot_general(
            v_ref[:],
            q_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BN, BQ]
        s = s * mul_ref[:][:, None] + add_ref[:][:, None]
        for j in range(bn // bucket):
            out_ref[j, :] = jnp.max(s[j * bucket : (j + 1) * bucket], axis=0)

    def kernel_int8(q_ref, v_ref, mul_ref, add_ref, inv_sq_ref, out_ref):
        s32 = jax.lax.dot_general(
            v_ref[:],
            q_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [BN, BQ] — the only full score tile in VMEM
        # inv_sq rides whole as a [nj, BQ] block (tiny; 1-D or 1-row
        # blocks trip Mosaic/XLA tiling checks) — pick this tile's row.
        from jax.experimental import pallas as pl

        inv_sq_row = inv_sq_ref[pl.program_id(1), :]
        # Convert/scale per bucket slice so the f32 tile never
        # materializes alongside the i32 dot — halves the kernel's VMEM
        # score footprint, which is what lets int8 keep the wide
        # (2048, 1024) tiles instead of falling to (2048, 512) and
        # paying 2× the per-grid-cell overhead (the kernel's floor).
        for j in range(bn // bucket):
            sl = slice(j * bucket, (j + 1) * bucket)
            s = (
                s32[sl].astype(jnp.float32) * mul_ref[sl][:, None]
                + add_ref[sl][:, None] * inv_sq_row[None, :]
            )
            out_ref[j, :] = jnp.max(s, axis=0)

    return kernel_int8 if int8_mode else kernel_f32


def bucket_scores_pallas_bigq(
    queries_p: jax.Array,  # [QT, D] f32/bf16 — or int8 with scales below
    corpus: jax.Array,  # [N, D] same dtype family
    aux_mul: jax.Array,  # [N] f32
    aux_add: jax.Array,  # [N] f32
    inv_sq: jax.Array | None = None,  # [QT] f32 — int8 path only
    interpret: bool = False,
    bucket: int = BUCKET,
    transpose: bool = True,
) -> jax.Array:  # [QT, N // bucket] (or the kernel-natural [N // bucket, QT]
    # when ``transpose=False`` — feed that layout to topk_buckets_nbq)
    """Fused matmul + bucket-max for query batches that tile per
    ``_bigq_tiles`` (any Q divisible by 256 with a VMEM-fitting tile —
    wider tiles preferred, per-cell overhead is the measured floor).

    Grid is (N blocks, Q tiles) with Q innermost, so each corpus block
    is DMA'd once and revisited for every query tile; output traffic is
    corpus_bytes·(128/bucket)/128 per query tile. QT and N must be
    multiples of the tile sizes (the executor's canonical shapes
    guarantee this). Beats the fusable scan by ~2.3 ms at Q=1024/1M
    fp32 (benchmarks/exp_pallas_bigq.py; Mosaic compile ~3 s here)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    qt, d = queries_p.shape
    n = corpus.shape[0]
    int8_mode = inv_sq is not None
    tiles = _bigq_tiles(qt, d, corpus.dtype.itemsize, int8_mode)
    assert tiles is not None, (qt, d)
    bn, bq = tiles
    assert qt % bq == 0 and n % bn == 0, (qt, n)
    ni, nj = n // bn, qt // bq
    bpb = bn // bucket

    kernel = _make_bigq_kernel(bn, bucket, int8_mode)
    in_specs = [
        pl.BlockSpec((bq, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bn,), lambda i, j: (i,), memory_space=pltpu.VMEM),
        pl.BlockSpec((bn,), lambda i, j: (i,), memory_space=pltpu.VMEM),
    ]
    args = [queries_p, corpus, aux_mul, aux_add]
    if int8_mode:
        in_specs.append(
            pl.BlockSpec((nj, bq), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(inv_sq.reshape(nj, bq))

    itemsize = corpus.dtype.itemsize
    out = pl.pallas_call(
        kernel,
        grid=(ni, nj),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bpb, bq), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n // bucket, qt), jnp.float32),
        cost_estimate=pl.CostEstimate(
            # corpus blocks load once (v's index map ignores j); query
            # tiles reload per row block (tiny).
            flops=2 * n * qt * d,
            bytes_accessed=n * d * itemsize + n * 8 + qt * d * itemsize * ni
            + (n // bucket) * qt * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out.T if transpose else out  # [QT, N/bucket] | [N/bucket, QT]


def _bigq_eligible(n: int, qt: int, d: int, itemsize: int, int8_mode: bool = False) -> bool:
    """Use the fused Pallas phase 1 when shapes tile, the per-cell VMEM
    footprint fits (double-buffered corpus/query blocks + the score
    tile(s) within ~12 MB of the 16 MB VMEM), and we are on a real TPU
    backend (Mosaic has no CPU lowering; tests run the kernel in
    interpret mode explicitly)."""
    tiles = _bigq_tiles(qt, d, itemsize, int8_mode)
    if tiles is None or qt % tiles[1] != 0 or n % tiles[0] != 0:
        return False
    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return False


def bucket_scores_scan(
    queries_p: jax.Array,  # [QT, D]
    corpus: jax.Array,  # [N, D]
    aux_mul: jax.Array,
    aux_add: jax.Array,
    bucket: int = BUCKET,
) -> jax.Array:  # [QT, N // bucket]
    """Phase 1: one unblocked dot when the [N, QT] intermediate is
    affordable (streams the corpus at ~the HBM read ceiling — measured
    470 GB/s vs 184 GB/s for the blocked scan, which stalls between
    steps; benchmarks/exp_phase1b.py), else a ``lax.scan`` over
    VMEM-fusable blocks (XLA fuses matmul → scale/shift → bucket-max
    per step — zero intermediate traffic, MXU-bound).

    No per-block ``top_k``, no cross-block carry: selection happens
    once at the end (topk_two_phase).
    """
    n, d = corpus.shape
    qt = queries_p.shape[0]

    # bf16 corpus → bf16 score tiles: halves the materialized s-tile
    # traffic and doubles MXU rate; selection-only precision (the final
    # top_k over bucket maxima happens in f32 upstream).
    acc_dtype = jnp.bfloat16 if corpus.dtype == jnp.bfloat16 else jnp.float32
    acc_bytes = 2 if acc_dtype == jnp.bfloat16 else 4

    if qt <= ONESHOT_MAX_Q and n * qt * acc_bytes <= ONESHOT_INTERMEDIATE_CAP:
        return bucket_scores_xla(queries_p, corpus, aux_mul, aux_add, bucket)

    if _bigq_eligible(n, qt, d, corpus.dtype.itemsize):
        return bucket_scores_pallas_bigq(
            queries_p, corpus, aux_mul, aux_add, bucket=bucket
        )

    block_rows = _fusable_block(n, qt)
    if n % block_rows != 0 or n == block_rows:
        return bucket_scores_xla(queries_p, corpus, aux_mul, aux_add, bucket)
    nb = n // block_rows

    xs = (
        corpus.reshape(nb, block_rows, d),
        aux_mul.reshape(nb, block_rows),
        aux_add.reshape(nb, block_rows),
    )

    def body(_, x):
        vb, mb, ab = x
        s = jax.lax.dot_general(
            queries_p,
            vb,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc_dtype,
        )
        s = s * mb[None, :].astype(acc_dtype) + ab[None, :].astype(acc_dtype)
        out = s.reshape(qt, block_rows // bucket, bucket).max(axis=-1)
        return None, out

    _, stacked = jax.lax.scan(body, None, xs)  # [nb, QT, block//bucket]
    out = jnp.transpose(stacked, (1, 0, 2)).reshape(qt, n // bucket)
    return out.astype(jnp.float32)


def bucket_scores_scan_probed(
    queries_p: jax.Array,  # [QT, D] — prepared fp32 / bf16 / q8 (int8)
    corpus: jax.Array,  # [N, D] — fp32 / bf16 scan copy / v8 (int8)
    aux_mul: jax.Array,  # [N] (int8: aux_mul · sv, corpus scale folded)
    aux_add: jax.Array,
    coded: jax.Array,  # [N] int32 cell ids
    cells: jax.Array,  # [QT, P] per-query probe cells
    block_rows: int | None = None,
    bucket: int = BUCKET,
    inv_sq: jax.Array | None = None,  # [QT] — int8 per-query 1/scale
) -> jax.Array:  # [QT, N // bucket]
    """Phase 1 with per-query IVF probe masks applied inside the scan
    (reference index.py:113-126 semantics, per query). Blocks are
    VMEM-fusable like bucket_scores_scan; the per-query probe mask
    rules out the unblocked-dot fast path (the [QT, block, P] compare
    must stay a fused VMEM tile).

    Scan-precision variants mirror the unprobed twins: a bf16 ``corpus``
    halves traffic with a bf16 accumulate; an int8 ``corpus`` (pass
    ``inv_sq`` and fold sv into ``aux_mul``) quarters it with the same
    score form as bucket_scores_scan_int8."""
    n, d = corpus.shape
    qt = queries_p.shape[0]
    int8_mode = corpus.dtype == jnp.int8
    if int8_mode:
        acc = jnp.float32 if d <= 1024 else jnp.int32
    elif corpus.dtype == jnp.bfloat16:
        acc = jnp.bfloat16
    else:
        acc = jnp.float32
    block_rows = _fusable_block(n, qt, block_rows)
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
            preferred_element_type=acc,
        )
        if int8_mode:
            s = s.astype(jnp.float32) * mb[None, :] + ab[None, :] * inv_sq[:, None]
        else:
            s = s * mb[None, :].astype(acc) + ab[None, :].astype(acc)
        probe_ok = (cb[None, :, None] == cells[:, None, :]).any(axis=-1)  # [QT, B]
        s = jnp.where(probe_ok, s, jnp.asarray(NEG_INF, s.dtype))
        out = s.reshape(qt, block_rows // bucket, bucket).max(axis=-1)
        return None, out

    _, stacked = jax.lax.scan(body, None, xs)
    return jnp.transpose(stacked, (1, 0, 2)).reshape(qt, n // bucket).astype(jnp.float32)


# Group width for hierarchical bucket selection (one lane tile).
_SEL_GROUP = 128


def topk_buckets(bucket_max: jax.Array, kp: int) -> jax.Array:
    """Exact top-``kp`` bucket indices per query, hierarchical.

    ``lax.top_k`` over the full [Q, N/128] bucket-max row is the single
    most expensive op at large Q (measured 25.6 ms of a 39 ms query at
    Q=1024, N=1M — benchmarks/exp_phase2.py): TPU top-k is sort-based.
    Instead: group-max over 128-bucket groups → top-kp *groups* (at most
    kp groups can hold a value ≥ the kp-th best, same coverage argument
    as the bucket trick itself) → gather those groups' bucket maxima →
    top-kp over kp·128 candidates. Stable order is preserved: groups
    are gathered in ascending index order, so ``lax.top_k``'s
    earliest-on-tie rule keeps resolving ties to the smallest bucket id.

    Returns bucket indices [Q, kp] (scores are not needed upstream).
    """
    q, nb = bucket_max.shape
    if kp > _SEL_GROUP or nb < 8 * _SEL_GROUP or nb <= 2 * kp * _SEL_GROUP:
        _, bidx = jax.lax.top_k(bucket_max, kp)
        return bidx

    pad = (-nb) % _SEL_GROUP
    if pad:
        bucket_max = jnp.concatenate(
            [bucket_max, jnp.full((q, pad), NEG_INF, bucket_max.dtype)], axis=1
        )
    g = bucket_max.shape[1] // _SEL_GROUP
    grouped = bucket_max.reshape(q, g, _SEL_GROUP)
    gmax = grouped.max(axis=-1)  # [Q, g]

    kg = min(kp, g)
    _, gidx = jax.lax.top_k(gmax, kg)  # [Q, kg], stable
    gidx = jnp.sort(gidx, axis=-1)  # ascending → candidate order = id order

    cand = jnp.take_along_axis(grouped, gidx[:, :, None], axis=1)  # [Q, kg, 128]
    cand = cand.reshape(q, kg * _SEL_GROUP)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _SEL_GROUP), 2)
    cand_ids = (gidx[:, :, None] * _SEL_GROUP + lane).reshape(q, kg * _SEL_GROUP)

    _, pos = jax.lax.top_k(cand, kp)
    bidx = jnp.take_along_axis(cand_ids, pos, axis=1)
    # padding groups carry −inf and are only picked when fewer than kp
    # real buckets exist; clamp their synthetic ids into range
    return jnp.minimum(bidx, nb - 1)


def topk_buckets_nbq(bucket_max_nbq: jax.Array, kp: int) -> jax.Array:
    """topk_buckets on the kernel's NATURAL [nb, Q] layout.

    The Pallas phase-1 kernel emits bucket maxima as [nb, Q]; selecting
    straight off that layout skips the 128 MB [nb, Q] → [Q, nb]
    transpose the [Q, nb] API forces XLA to materialize/fuse — measured
    3.67 vs 4.39 ms at Q=1024, N=1M (benchmarks/exp_decomp.py),
    identical selected sets. Same coverage + stable-tie argument as
    topk_buckets (groups gathered ascending; ties → smallest bucket)."""
    nb, q = bucket_max_nbq.shape
    if kp > _SEL_GROUP or nb < 8 * _SEL_GROUP or nb <= 2 * kp * _SEL_GROUP:
        _, bidx = jax.lax.top_k(bucket_max_nbq.T, kp)
        return bidx

    pad = (-nb) % _SEL_GROUP
    if pad:
        bucket_max_nbq = jnp.concatenate(
            [bucket_max_nbq, jnp.full((pad, q), NEG_INF, bucket_max_nbq.dtype)]
        )
    g = bucket_max_nbq.shape[0] // _SEL_GROUP
    grouped = bucket_max_nbq.reshape(g, _SEL_GROUP, q)
    gmax = grouped.max(axis=1)  # [g, Q]

    kg = min(kp, g)
    _, gidx = jax.lax.top_k(gmax.T, kg)  # [Q, kg], stable
    gidx = jnp.sort(gidx, axis=-1)  # ascending → candidate order = id order

    cand = jnp.take_along_axis(
        grouped.transpose(2, 0, 1), gidx[:, :, None], axis=1
    )  # [Q, kg, 128] — XLA lowers this to a gather; the full transpose
    # never materializes (only kg·128 columns per query are read)
    cand = cand.reshape(q, kg * _SEL_GROUP)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _SEL_GROUP), 2)
    cand_ids = (gidx[:, :, None] * _SEL_GROUP + lane).reshape(q, kg * _SEL_GROUP)

    _, pos = jax.lax.top_k(cand, kp)
    bidx = jnp.take_along_axis(cand_ids, pos, axis=1)
    return jnp.minimum(bidx, nb - 1)


def topk_values_ids(s: jax.Array, ids: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Exact top-k (values, ids) along the last axis, hierarchical.

    Same group-max preselect as topk_buckets but carrying explicit ids —
    for wide candidate rows (IVF rescore can see 32k+ candidates per
    query, where a flat sort-like ``lax.top_k`` dominates the query)."""
    c, w = s.shape
    if w <= 4 * _SEL_GROUP or k > _SEL_GROUP:
        top_s, pos = jax.lax.top_k(s, min(k, w))
        return top_s, jnp.take_along_axis(ids, pos, axis=1)

    pad = (-w) % _SEL_GROUP
    if pad:
        s = jnp.concatenate([s, jnp.full((c, pad), NEG_INF, s.dtype)], axis=1)
        ids = jnp.concatenate([ids, jnp.full((c, pad), -1, ids.dtype)], axis=1)
    g = s.shape[1] // _SEL_GROUP
    grouped = s.reshape(c, g, _SEL_GROUP)
    grouped_ids = ids.reshape(c, g, _SEL_GROUP)
    gmax = grouped.max(axis=-1)

    kg = min(k, g)
    _, gidx = jax.lax.top_k(gmax, kg)
    gidx = jnp.sort(gidx, axis=-1)  # ascending → stable ties by position

    cand = jnp.take_along_axis(grouped, gidx[:, :, None], axis=1).reshape(c, kg * _SEL_GROUP)
    cand_ids = jnp.take_along_axis(grouped_ids, gidx[:, :, None], axis=1).reshape(
        c, kg * _SEL_GROUP
    )
    top_s, pos = jax.lax.top_k(cand, min(k, kg * _SEL_GROUP))
    return top_s, jnp.take_along_axis(cand_ids, pos, axis=1)


def topk_values_min_id(s: jax.Array, ids: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Exact top-k by (score desc, id asc) — the engine's full tie
    contract, independent of candidate order.

    ``lax.top_k`` breaks ties by POSITION; in the clustered IVF layout
    position order is (cell, row), so cross-cell score ties would
    resolve to the smaller cell instead of the smaller row id. Iterated
    max+min-id (k small) enforces the id rule exactly: each step takes
    the max score, then the smallest id among rows tying at it."""
    big = jnp.int32(2**31 - 1)

    def body(carry, _):
        s_cur = carry
        m = jnp.max(s_cur, axis=1)  # [C]
        tie = s_cur == m[:, None]
        sel = jnp.min(jnp.where(tie & (ids >= 0), ids, big), axis=1)
        hit = tie & (ids == sel[:, None])
        return jnp.where(hit, NEG_INF, s_cur), (m, sel)

    _, (vals, sids) = jax.lax.scan(body, s, None, length=k)
    return vals.T, jnp.where(sids == big, -1, sids).T  # [C, k]


def bucket_for(q: int, n: int) -> int:
    """Rescore-bucket granularity for a (query count, corpus) pair —
    shared by the kernels and host-side IVF bucket-list builders."""
    bucket = BUCKET if q <= _BUCKET_SWITCH_Q else BUCKET_LARGE_Q
    while n % bucket != 0:
        bucket //= 2
    return bucket


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def topk_ivf_clustered(
    corpus_s: jax.Array,  # [N_pad, D] rows SORTED by cell id
    queries: jax.Array,  # [Q, D]
    aux_mul_s: jax.Array,  # [N_pad] (sorted order)
    aux_add_s: jax.Array,  # [N_pad] (sorted order; −inf on masked/pad)
    coded_s: jax.Array,  # [N_pad] int32 cell ids, sorted (−1 pad)
    orig_ids_s: jax.Array,  # [N_pad] int32 original row id per position (−1 pad)
    cells: jax.Array,  # [Q, P] int32 probe cells per query
    bucket_lists: jax.Array,  # [Q, B] int32 bucket indices (−1 pad)
    k: int,
    metric: str,
) -> tuple[jax.Array, jax.Array]:
    """Probed top-k over an IVF-CLUSTERED layout: no corpus scan at all.

    With rows sorted by cell id, a query's probed cells occupy ≤P
    contiguous row ranges; ``bucket_lists`` names the buckets covering
    them (host-computed from the cell offset table). The kernel gathers
    ONLY those buckets and rescores exactly — cost ∝ probed rows, not
    corpus rows. The masked-scan path (topk_two_phase_probed) costs a
    full corpus pass regardless of selectivity (measured 52 ms vs 3 ms
    brute force at 1M rows, P=64/4096 cells — the clustered gather is
    the actual IVF speedup). Boundary buckets contain neighbor cells'
    rows; the per-row probe-membership compare masks them (reference
    index.py:113-126 semantics). Returned ids are ORIGINAL row ids,
    ordered by (distance asc, id asc) — ties resolve by smallest id via
    topk_values_min_id, matching the masked-scan path exactly."""
    metric = canonical_metric(metric)
    n, d = corpus_s.shape
    q = queries.shape[0]
    bucket = bucket_for(q, n)
    n_buckets = n // bucket

    queries_p = prepare_queries(queries, metric)
    kp = bucket_lists.shape[1]
    bucket_ok = bucket_lists >= 0
    bidx = jnp.where(bucket_ok, bucket_lists, 0)

    rows = corpus_s.reshape(n_buckets, bucket, d)
    mul_b = aux_mul_s.reshape(n_buckets, bucket)
    add_b = aux_add_s.reshape(n_buckets, bucket)
    coded_b = coded_s.reshape(n_buckets, bucket)
    oid_b = orig_ids_s.reshape(n_buckets, bucket)
    kk = min(k, kp * bucket)

    def rescore_chunk(args):
        qp_c, bidx_c, ok_c, cells_c = args
        cand_v = rows[bidx_c]  # [C, kp, bucket, D]
        s = jnp.einsum(
            "qd,qkbd->qkb",
            qp_c,
            cand_v,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        s = s * mul_b[bidx_c] + add_b[bidx_c]
        probe_ok = (coded_b[bidx_c][:, :, :, None] == cells_c[:, None, None, :]).any(-1)
        s = jnp.where(probe_ok & ok_c[:, :, None], s, NEG_INF)
        c = qp_c.shape[0]
        s = s.reshape(c, kp * bucket)
        ids = oid_b[bidx_c].reshape(c, kp * bucket)
        return topk_values_min_id(s, ids, kk)

    per_query = kp * bucket * d * 4
    chunk = min(q, max(8, _RESCORE_GATHER_CAP // per_query))
    pad_rows = (-q) % chunk
    if pad_rows:
        queries_p2 = jnp.concatenate([queries_p, jnp.zeros((pad_rows, d), queries_p.dtype)])
        bidx2 = jnp.concatenate([bidx, jnp.zeros((pad_rows, kp), bidx.dtype)])
        ok2 = jnp.concatenate([bucket_ok, jnp.zeros((pad_rows, kp), bool)])
        cells2 = jnp.concatenate(
            [cells, jnp.full((pad_rows, cells.shape[1]), -1, cells.dtype)]
        )
    else:
        queries_p2, bidx2, ok2, cells2 = queries_p, bidx, bucket_ok, cells

    nc = queries_p2.shape[0] // chunk
    top_s, top_ids = jax.lax.map(
        rescore_chunk,
        (
            queries_p2.reshape(nc, chunk, d),
            bidx2.reshape(nc, chunk, kp),
            ok2.reshape(nc, chunk, kp),
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
    block_rows: int | None = None,
    corpus_scan: jax.Array | None = None,
    corpus_scan_int8: tuple[jax.Array, jax.Array] | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Probed (IVF) exact-within-probes top-k, two-phase.

    Same scan-precision contract as :func:`topk_two_phase`: an optional
    bf16 ``corpus_scan`` or int8 ``corpus_scan_int8=(v8, sv)`` feeds
    phase 1 (half/quarter HBM scan traffic); phase 2 always rescores
    against the fp32 ``corpus``, so distances stay exact — only bucket
    selection sees quantization (int8 doubles the candidate margin)."""
    metric = canonical_metric(metric)
    n, d = corpus.shape
    q = queries.shape[0]
    bucket = BUCKET if q <= _BUCKET_SWITCH_Q else BUCKET_LARGE_Q
    while n % bucket != 0:  # tiny shards (sharded search) may not tile
        bucket //= 2
    n_buckets = n // bucket

    queries_p = prepare_queries(queries, metric)
    if corpus_scan_int8 is not None:
        v8, sv = corpus_scan_int8
        q8, inv_sq = quantize_queries_int8(queries_p)
        bucket_max = bucket_scores_scan_probed(
            q8, v8, aux_mul * sv, aux_add, coded, cells, block_rows, bucket,
            inv_sq=inv_sq,
        )
    elif corpus_scan is not None:
        bucket_max = bucket_scores_scan_probed(
            queries_p.astype(corpus_scan.dtype), corpus_scan, aux_mul, aux_add,
            coded, cells, block_rows, bucket,
        )
    else:
        bucket_max = bucket_scores_scan_probed(
            queries_p, corpus, aux_mul, aux_add, coded, cells, block_rows, bucket
        )

    pad = BUCKET_PAD * 2 if corpus_scan_int8 is not None else BUCKET_PAD
    kp = min(k + pad, n_buckets)
    bidx = topk_buckets(bucket_max, kp)
    bidx = jnp.sort(bidx, axis=-1)

    rows = corpus.reshape(n_buckets, bucket, d)
    mul_b = aux_mul.reshape(n_buckets, bucket)
    add_b = aux_add.reshape(n_buckets, bucket)
    coded_b = coded.reshape(n_buckets, bucket)
    kk = min(k, kp * bucket)
    lane_iota = jnp.arange(bucket, dtype=jnp.int32)[None, None, :]

    def rescore_chunk(args):
        qp_c, bidx_c, cells_c = args
        cand_v = rows[bidx_c]
        s = jnp.einsum(
            "qd,qkbd->qkb",
            qp_c,
            cand_v,
            preferred_element_type=jnp.float32,
            # fp32-true rescore: TPU DEFAULT matmul precision rounds f32
            # inputs to bf16; flops here are negligible vs the gather
            precision=jax.lax.Precision.HIGHEST,
        )
        s = s * mul_b[bidx_c] + add_b[bidx_c]
        probe_ok = (coded_b[bidx_c][:, :, :, None] == cells_c[:, None, None, :]).any(-1)
        s = jnp.where(probe_ok, s, NEG_INF)
        c = qp_c.shape[0]
        s = s.reshape(c, kp * bucket)
        ids = (bidx_c[:, :, None] * bucket + lane_iota).reshape(c, kp * bucket)
        top_s, pos = jax.lax.top_k(s, kk)
        return top_s, jnp.take_along_axis(ids, pos, axis=1)

    per_query = kp * bucket * d * 4
    chunk = min(q, max(64, _RESCORE_GATHER_CAP // per_query))
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


# -- phase 2: gather + exact rescore --------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def topk_two_phase(
    corpus: jax.Array,  # [N_pad, D]
    queries: jax.Array,  # [Q, D]
    aux_mul: jax.Array,  # [N_pad]
    aux_add: jax.Array,  # [N_pad]  (−inf on masked/padding rows)
    k: int,
    metric: str,
    corpus_scan: jax.Array | None = None,
    corpus_scan_int8: tuple[jax.Array, jax.Array] | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k: (distances [Q, k], row ids [Q, k]; +inf / −1 padding).

    ``corpus_scan`` optionally substitutes a lower-precision (bf16)
    copy for phase 1 — half the HBM scan traffic. ``corpus_scan_int8``
    is a ``(v8, sv)`` pair from :func:`quantize_corpus_int8` — quarter
    traffic, int8 MXU dot. Phase 2 always rescores candidates against
    the fp32 ``corpus``, so returned distances stay exact fp32; only
    bucket *selection* becomes approximate (recall ≈ 1 with the
    BUCKET_PAD margin; opt-in via the executor's ``precision`` knob)."""
    metric = canonical_metric(metric)
    n, d = corpus.shape
    q = queries.shape[0]

    # Mid-size batches (32 < Q, Q not a multiple of the 256-wide minimum
    # Pallas query tile) would fall through to the blocked fusable scan —
    # the slowest phase-1 lowering. Padding the batch up to the tile and
    # taking the fused kernel wins outright: 2.91 vs 4.06 ms at Q=64,
    # 2.95 vs 3.94 at Q=128 (1M×128, benchmarks/exp_midq.py). Padding
    # queries are all-zero rows; every step is row-independent per
    # query, so real queries' results are unchanged and the pad rows
    # are sliced off.
    if q > ONESHOT_MAX_Q and q % _BIGQ_MIN_Q != 0:
        scan_itemsize = (
            1
            if corpus_scan_int8 is not None
            else (corpus_scan if corpus_scan is not None else corpus).dtype.itemsize
        )
        q_up = -(-q // _BIGQ_MIN_Q) * _BIGQ_MIN_Q
        if _bigq_eligible(n, q_up, d, scan_itemsize, corpus_scan_int8 is not None):
            queries_up = jnp.concatenate(
                [queries, jnp.zeros((q_up - q, d), queries.dtype)]
            )
            dist, ids = topk_two_phase(
                corpus,
                queries_up,
                aux_mul,
                aux_add,
                k=k,
                metric=metric,
                corpus_scan=corpus_scan,
                corpus_scan_int8=corpus_scan_int8,
            )
            return dist[:q], ids[:q]

    bucket = BUCKET if q <= _BUCKET_SWITCH_Q else BUCKET_LARGE_Q
    while n % bucket != 0:  # tiny shards (sharded search) may not tile
        bucket //= 2
    n_buckets = n // bucket

    queries_p = prepare_queries(queries, metric)

    # int8 selection error exceeds bf16's — widen the candidate margin
    pad = BUCKET_PAD * 2 if corpus_scan_int8 is not None else BUCKET_PAD
    kp = min(k + pad, n_buckets)

    if corpus_scan_int8 is not None:
        v8, sv = corpus_scan_int8
        q8, inv_sq = quantize_queries_int8(queries_p)
        ams = aux_mul * sv
        if q > ONESHOT_MAX_Q and _bigq_eligible(n, q, d, 1, int8_mode=True):
            # kernel-natural [nb, Q] maxima + transpose-free selection
            bm_nbq = bucket_scores_pallas_bigq(
                q8, v8, ams, aux_add, inv_sq=inv_sq, bucket=bucket, transpose=False
            )
            bidx = topk_buckets_nbq(bm_nbq, kp)
        else:
            bucket_max = bucket_scores_scan_int8(q8, v8, ams, aux_add, inv_sq, bucket)
            bidx = topk_buckets(bucket_max, kp)
    else:
        scan_c = corpus if corpus_scan is None else corpus_scan
        scan_q = queries_p if corpus_scan is None else queries_p.astype(corpus_scan.dtype)
        acc_bytes = 2 if scan_c.dtype == jnp.bfloat16 else 4
        oneshot = q <= ONESHOT_MAX_Q and n * q * acc_bytes <= ONESHOT_INTERMEDIATE_CAP
        if not oneshot and _bigq_eligible(n, q, d, scan_c.dtype.itemsize):
            bm_nbq = bucket_scores_pallas_bigq(
                scan_q, scan_c, aux_mul, aux_add, bucket=bucket, transpose=False
            )
            bidx = topk_buckets_nbq(bm_nbq, kp)
        else:
            bucket_max = bucket_scores_scan(scan_q, scan_c, aux_mul, aux_add, bucket)
            bidx = topk_buckets(bucket_max, kp)

    # gather in ascending bucket order so final ties resolve to smallest id
    bidx = jnp.sort(bidx, axis=-1)  # stable ties above → smallest bucket id

    rows = corpus.reshape(n_buckets, bucket, d)
    mul_b = aux_mul.reshape(n_buckets, bucket)
    add_b = aux_add.reshape(n_buckets, bucket)
    kk = min(k, kp * bucket)
    lane_iota = jnp.arange(bucket, dtype=jnp.int32)[None, None, :]

    def rescore_chunk(args):
        """Gather + exact rescore for one query chunk (bounds VMEM/HBM
        footprint of the [chunk, kp, bucket, D] candidate gather)."""
        qp_c, bidx_c = args  # [C, D], [C, kp]
        cand_v = rows[bidx_c]  # [C, kp, bucket, D]
        s = jnp.einsum(
            "qd,qkbd->qkb",
            qp_c,
            cand_v,
            preferred_element_type=jnp.float32,
            # fp32-true rescore: TPU DEFAULT matmul precision rounds f32
            # inputs to bf16; flops here are negligible vs the gather
            precision=jax.lax.Precision.HIGHEST,
        )
        s = s * mul_b[bidx_c] + add_b[bidx_c]
        c = qp_c.shape[0]
        s = s.reshape(c, kp * bucket)
        ids = (bidx_c[:, :, None] * bucket + lane_iota).reshape(c, kp * bucket)
        top_s, pos = jax.lax.top_k(s, kk)
        return top_s, jnp.take_along_axis(ids, pos, axis=1)

    # Chunk only when the [Q, kp, bucket, D] gather would exceed the HBM
    # staging budget — lax.map serializes its steps, and 16 small
    # chunked top_k calls cost ~25 ms at Q=1024 where the unchunked
    # rescore runs in ~10 ms (benchmarks/exp_phase2.py p2_full_nomap).
    per_query = kp * bucket * d * 4
    chunk = min(q, max(64, _RESCORE_GATHER_CAP // per_query))
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


@functools.partial(jax.jit, static_argnames=("k", "w", "metric"))
def topk_window_int8(
    v8: jax.Array,  # [N_pad, D] int8 scan copy
    sv: jax.Array,  # [N_pad] f32 per-row quantization scale
    queries: jax.Array,  # [Q, D] fp32
    aux_mul: jax.Array,  # [N_pad] f32
    aux_add: jax.Array,  # [N_pad] f32 (−inf on masked/padding rows)
    k: int,
    w: int,
    metric: str,
) -> jax.Array:  # [Q, W] int32 global row ids
    """Phase A of the int8-resident (host-rescore) pipeline: int8 phase-1
    bucket scan → hierarchical selection of ``kp`` candidate buckets →
    NARROWING rescore (fp32 prepared query × dequantized int8 rows, with
    the EXACT per-row aux from the fp32 host corpus) → top-``W`` global
    row ids per query.

    This is the engine form of the composition measured at spec in
    benchmarks/config2_fullscale.py (VERDICT r3 #1): the fp32 corpus
    never touches the device — the host gathers the returned window rows
    and rescores exactly (engine/residency.py). The narrowing dot's only
    error is the row-side quantization residual (query side is fp32),
    so the true top-k needs a multi-σ excursion to fall outside a
    W ≫ k window; recall is asserted against a float64 oracle in the
    full-scale benchmark and pinned exact in CPU tests where W ≥ N.

    Returned width is ``min(w, kp·bucket, n)`` — callers read the
    result shape. May include masked/padding rows when fewer than W
    candidates score above −inf; the host rescore re-applies validity.
    """
    metric = canonical_metric(metric)
    n, d = v8.shape
    q = queries.shape[0]

    queries_p = prepare_queries(queries, metric)
    q8, inv_sq = quantize_queries_int8(queries_p)
    ams = aux_mul * sv

    bucket = bucket_for(q, n)
    n_buckets = n // bucket
    # enough buckets to fill the window, plus the int8 selection margin
    kp = min(max(k, -(-w // bucket)) + 2 * BUCKET_PAD, n_buckets)
    ww = min(w, kp * bucket)

    if q > ONESHOT_MAX_Q and _bigq_eligible(n, q, d, 1, int8_mode=True):
        bm_nbq = bucket_scores_pallas_bigq(
            q8, v8, ams, aux_add, inv_sq=inv_sq, bucket=bucket, transpose=False
        )
        bidx = topk_buckets_nbq(bm_nbq, kp)
    else:
        bucket_max = bucket_scores_scan_int8(q8, v8, ams, aux_add, inv_sq, bucket)
        bidx = topk_buckets(bucket_max, kp)
    bidx = jnp.sort(bidx, axis=-1)  # ascending bucket order (stable ids)

    rows8 = v8.reshape(n_buckets, bucket, d)
    mul_b = ams.reshape(n_buckets, bucket)
    add_b = aux_add.reshape(n_buckets, bucket)
    lane_iota = jnp.arange(bucket, dtype=jnp.int32)[None, None, :]

    def window_chunk(args):
        qp_c, bidx_c = args  # [C, D], [C, kp]
        cand8 = rows8[bidx_c]  # [C, kp, bucket, D] int8
        # narrowing score: fp32 query × dequantized row + exact aux —
        # the row scale folds into mul_b, the exact −‖v‖² rides add_b
        s = jnp.einsum(
            "qd,qkbd->qkb",
            qp_c,
            cand8.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        s = s * mul_b[bidx_c] + add_b[bidx_c]
        c = qp_c.shape[0]
        s = s.reshape(c, kp * bucket)
        ids = (bidx_c[:, :, None] * bucket + lane_iota).reshape(c, kp * bucket)
        _, pos = jax.lax.top_k(s, ww)
        return jnp.take_along_axis(ids, pos, axis=1)

    per_query = kp * bucket * d * 4
    chunk = min(q, max(8, _RESCORE_GATHER_CAP // per_query))
    pad_rows = (-q) % chunk
    if pad_rows:
        queries_p2 = jnp.concatenate(
            [queries_p, jnp.zeros((pad_rows, d), queries_p.dtype)]
        )
        bidx2 = jnp.concatenate([bidx, jnp.zeros((pad_rows, kp), bidx.dtype)])
    else:
        queries_p2, bidx2 = queries_p, bidx

    nc = queries_p2.shape[0] // chunk
    win = jax.lax.map(
        window_chunk,
        (queries_p2.reshape(nc, chunk, d), bidx2.reshape(nc, chunk, kp)),
    )
    return win.reshape(nc * chunk, ww)[:q]
