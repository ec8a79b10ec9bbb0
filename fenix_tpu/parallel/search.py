"""Mesh-sharded kNN search with distributed top-k merge.

North-star path (BASELINE.json config 4): corpus rows sharded over the
mesh; each device runs the local two-phase top-k scan
(fenix_tpu.ops.topk2 — same kernel strategy as the single-chip
executor: oneshot/Pallas phase 1, hierarchical selection, exact
rescore) over its shard, then only ``k`` candidate (score, global-id)
pairs per query cross the interconnect — an ``all_gather`` of ``S·k``
candidates followed by an on-device merge. Raw vectors never move
(SURVEY.md §5 long-context entry: "all-to-all only candidate ids +
distances, never raw vectors").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from fenix_tpu.ops import distance as distance_ops
from fenix_tpu.ops import topk2
from fenix_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, row_sharding


def _build(
    mesh: Mesh,
    k: int,
    metric: str,
    probed: bool,
    with_aux: bool = False,
    precision: str = "fp32",
):
    assert precision in ("fp32", "bf16", "int8"), precision
    axes = (DATA_AXIS, MODEL_AXIS)
    n_shards = mesh.devices.size

    in_specs = (P(axes, None), P(), P(axes))
    if with_aux:
        in_specs = in_specs + (P(axes), P(axes))
    if precision == "bf16":
        in_specs = in_specs + (P(axes, None),)
    elif precision == "int8":
        in_specs = in_specs + (P(axes, None), P(axes))
    if probed:
        in_specs = in_specs + (P(axes), P())

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P()),
        # The scan carry starts replicated and becomes device-varying in
        # the first iteration; skip the varying-manual-axes check.
        check_vma=False,
    )
    def local_search(corpus_local, queries, mask_local, *rest):
        rows_local = corpus_local.shape[0]

        if with_aux:
            aux_mul, aux_add = rest[0], rest[1]
            rest = rest[2:]
        scan_kw = {}
        if precision == "bf16":
            scan_kw["corpus_scan"] = rest[0]
            rest = rest[1:]
        elif precision == "int8":
            scan_kw["corpus_scan_int8"] = (rest[0], rest[1])
            rest = rest[2:]
        coded_local, cells = rest if probed else (None, None)

        local_k = min(k, rows_local)
        if not with_aux:
            # Per-shard metric aux computed inline: one extra read of
            # the local shard per call. Serving paths precompute it
            # once (shard_aux) and pass with_aux=True.
            aux_mul, aux_add = topk2.prepare_aux(corpus_local, mask_local, metric)
        if probed:
            dist, ids = topk2.topk_two_phase_probed(
                corpus_local, queries, aux_mul, aux_add, coded_local, cells,
                k=local_k, metric=metric, **scan_kw,
            )
        else:
            dist, ids = topk2.topk_two_phase(
                corpus_local, queries, aux_mul, aux_add, k=local_k, metric=metric,
                **scan_kw,
            )
        return merge_local_topk(dist, ids, k, rows_local)

    return jax.jit(local_search)


def shard_index() -> "jax.Array":
    """Linear shard index inside a ``(data, model)`` shard_map body."""
    return jax.lax.axis_index(DATA_AXIS) * jax.lax.axis_size(
        MODEL_AXIS
    ) + jax.lax.axis_index(MODEL_AXIS)


def merge_local_topk(dist, ids, k: int, rows_local: int):
    """Inside a ``(data, model)`` shard_map body: exchange each shard's
    local top-k candidates and return the REPLICATED global top-``k``
    ``(dist [Q,k] ascending, global ids [Q,k])``. Local ids translate
    to global via the shard's contiguous row offset."""
    gids = jnp.where(ids >= 0, ids + shard_index() * rows_local, -1)
    return merge_candidates(dist, gids, k)


def merge_candidates(dist, gids, k: int):
    """Candidate merge for ids that are ALREADY global (e.g. the
    clustered-IVF kernel emits original row ids). Only k (score, id)
    pairs per (shard, query) cross the interconnect; shard-major concat
    keeps ties resolving to the smallest global id — shards own
    ascending contiguous id ranges and each shard's candidates are
    (dist, id)-ordered, so the first occurrence of a tied score carries
    the smallest id."""
    axes = (DATA_AXIS, MODEL_AXIS)
    n_shards = jax.lax.axis_size(DATA_AXIS) * jax.lax.axis_size(MODEL_AXIS)
    local_k = dist.shape[1]

    scores = jnp.where(jnp.isinf(dist), distance_ops.NEG_INF, -dist)
    gids = jnp.where(scores == distance_ops.NEG_INF, -1, gids)

    # [S, Q, local_k] candidate exchange — k·S values per query, not rows.
    all_scores = jax.lax.all_gather(scores, axes)
    all_gids = jax.lax.all_gather(gids, axes)

    q = dist.shape[0]
    width = n_shards * local_k
    all_scores = jnp.transpose(all_scores, (1, 0, 2)).reshape(q, width)
    all_gids = jnp.transpose(all_gids, (1, 0, 2)).reshape(q, width)

    kk = min(k, width)  # k can exceed the merged candidate pool
    top_scores, pos = jax.lax.top_k(all_scores, kk)
    top_gids = jnp.take_along_axis(all_gids, pos, axis=1)
    if kk < k:
        pad = k - kk
        top_scores = jnp.concatenate(
            [top_scores, jnp.full((q, pad), distance_ops.NEG_INF)], axis=1
        )
        top_gids = jnp.concatenate([top_gids, jnp.full((q, pad), -1, jnp.int32)], axis=1)

    out_dist = jnp.where(top_scores == distance_ops.NEG_INF, jnp.inf, -top_scores)
    out_ids = jnp.where(top_scores == distance_ops.NEG_INF, -1, top_gids)
    return out_dist, out_ids


def gather_rowsharded(column_local, gids, valid):
    """Inside a shard_map body: gather ``column_local[gid]`` for
    REPLICATED global row ids from a row-sharded 1-D column. Each shard
    contributes the values it owns (contiguous range; zeros elsewhere),
    a ``psum`` assembles the replicated result — one collective over
    the candidate set, never the column. Invalid slots return 0.

    Integer/bool columns only: the psum assembly uses 0 as the
    missing-slot identity, and float columns with legitimate zeros
    would silently mask ownership bugs (VERDICT r1 weak #7)."""
    assert jnp.issubdtype(column_local.dtype, jnp.integer) or jnp.issubdtype(
        column_local.dtype, jnp.bool_
    ), f"gather_rowsharded requires an integer column, got {column_local.dtype}"
    axes = (DATA_AXIS, MODEL_AXIS)
    rows_local = column_local.shape[0]
    local_pos = gids - shard_index() * rows_local
    owned = valid & (local_pos >= 0) & (local_pos < rows_local)
    safe = jnp.clip(local_pos, 0, rows_local - 1)
    contrib = jnp.where(owned, jnp.take(column_local, safe), 0)
    return jax.lax.psum(contrib, axes)


def build_sharded_search(
    mesh: Mesh,
    k: int,
    metric: str,
    block: int | None = None,  # unused; kept for call-site compatibility
    with_aux: bool = False,
    precision: str = "fp32",
):
    """Compile a sharded exact top-k search step.

    Returns ``fn(corpus, queries, mask) -> (distances [Q,k], ids [Q,k])``
    where ``corpus`` is ``[N_pad, D]`` sharded over rows, ``queries``
    replicated, ``mask`` row-sharded. With ``with_aux=True`` the
    signature becomes ``fn(corpus, queries, mask, aux_mul, aux_add)``
    with row-sharded aux from :func:`shard_aux` — skipping the per-call
    ‖v‖² corpus pass (serving-path default). The two-phase kernel sizes
    its own blocking; ``block`` only matters to ``shard_corpus`` padding.

    ``precision`` mirrors the single-chip executor's scan modes: "bf16"
    appends a row-sharded bf16 scan copy (:func:`shard_scan_bf16`) to
    the signature, "int8" a ``(v8, sv)`` pair (:func:`shard_scan_int8`)
    — half/quarter per-shard HBM scan traffic; each shard still
    rescores its candidates against the fp32 corpus, so returned
    distances are exact and only local bucket selection sees
    quantization (same contract as single-chip).
    """
    return _build(mesh, k, metric, probed=False, with_aux=with_aux, precision=precision)


def build_serving_search(
    mesh: Mesh, k: int, metric: str, probed: bool = False, precision: str = "fp32"
):
    """Sharded search step as the query engine dispatches it: precomputed
    row-sharded metric aux (``with_aux=True`` — per-request filters
    overlay on ``aux_add`` outside), result packed to one ``[2, Q, k]``
    int32 array (a single device→host fetch, matching the single-chip
    executor's transport discipline).

    Signature: ``fn(corpus, queries, aux_mul, aux_add,
    [scan copies…], [coded, cells]) -> packed``. The kernel's mask input
    only feeds the inline-aux path, dead under ``with_aux=True`` — it is
    synthesized here so callers don't thread a dead argument.
    """
    raw = _build(mesh, k, metric, probed=probed, with_aux=True, precision=precision)

    @jax.jit
    def packed_search(corpus, queries, *rest):
        valid = jnp.ones((corpus.shape[0],), jnp.bool_)
        return topk2.pack_result(*raw(corpus, queries, valid, *rest))

    return packed_search


def build_serving_window_int8(mesh: Mesh, k: int, w: int, metric: str):
    """Sharded phase A of the int8-resident (host-rescore) residency
    mode (engine/residency.py, VERDICT r4 next #2): each shard scans its
    row slice of the int8 scan copy with :func:`topk2.topk_window_int8`
    and emits its local top-``w`` candidate window as GLOBAL row ids —
    the host concatenates the per-shard windows and finishes with the
    shared exact fp32 rescore. Only ``S·W`` ids per query batch cross
    the device→host link; the fp32 corpus never lands on any device
    (each chip holds 1/S of the int8 copy, so the int8-resident ceiling
    scales with the mesh — BASELINE config 4 at real HBM sizes).

    ``fn(v8, sv, queries, aux_mul, aux_add) -> [S, Q, W'] int32`` with
    v8 ``[N_pad, D]`` row-sharded, sv/aux row-sharded, queries
    replicated. ``W' = min(w, selection width, rows_local)`` — callers
    read the result shape (same contract as the single-chip kernel).
    Padding/masked rows may appear when a shard has fewer than W' live
    candidates; the host rescore re-applies validity."""
    axes = (DATA_AXIS, MODEL_AXIS)
    in_specs = (P(axes, None), P(axes), P(), P(axes), P(axes))

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=in_specs,
        out_specs=P(axes, None, None), check_vma=False,
    )
    def window_search(v8_l, sv_l, queries, mul_l, add_l):
        rows_local = v8_l.shape[0]
        ids = topk2.topk_window_int8(
            v8_l, sv_l, queries, mul_l, add_l,
            k=min(k, rows_local), w=min(w, rows_local), metric=metric,
        )
        gids = jnp.where(ids >= 0, ids + shard_index() * rows_local, -1)
        return gids[None]

    return window_search


def build_serving_ivf_clustered(mesh: Mesh, k: int, metric: str):
    """Sharded IVF over PER-SHARD clustered layouts: each shard's rows
    are locally sorted by cell id, so a query's probed cells occupy
    contiguous local ranges; every shard gathers only its own probed
    buckets (cost ∝ locally-probed rows, never a local corpus pass) and
    the kernels' ORIGINAL-GLOBAL-id candidates merge directly.

    ``fn(corpus_s, queries, aux_mul_s, aux_add_s, coded_s, orig_ids_s,
    cells, bucket_lists) -> packed [2, Q, k]`` — corpus/aux/coded/orig
    row-sharded in per-shard sorted order; ``cells`` replicated [Q, P];
    ``bucket_lists`` [S, Q, B] with shard s's bucket indices (local
    bucket space) in row s.
    """
    axes = (DATA_AXIS, MODEL_AXIS)
    in_specs = (
        P(axes, None), P(), P(axes), P(axes), P(axes), P(axes),
        P(), P(axes, None, None),
    )

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=P(), check_vma=False
    )
    def ivf_search(
        corpus_l, queries, aux_mul_l, aux_add_l, coded_l, orig_l, cells, bl_l
    ):
        rows_local = corpus_l.shape[0]
        dist, gids = topk2.topk_ivf_clustered(
            corpus_l, queries, aux_mul_l, aux_add_l, coded_l, orig_l,
            cells, bl_l[0], k=min(k, rows_local), metric=metric,
        )
        return topk2.pack_result(*merge_candidates(dist, gids, k))

    return ivf_search


def build_ring_search(
    mesh: Mesh, k: int, metric: str, precision: str = "fp32", probed: bool = False
):
    """Ring top-k: query blocks rotate around the shard ring while every
    shard scans only its LOCAL rows — the exchange overlapped with
    compute (BASELINE config 5; SURVEY §5 "ring top-k").

    Each step ppermutes the [Q/S, D] query block to the next shard
    BEFORE the local two-phase scan of the current block — the permute
    has no data dependence on that matmul, so the compiler's async
    collectives hide the heavy transfer behind compute; only the small
    [Q/S, k] candidate carry serializes on the merge. After S steps a
    block is back home carrying the global top-k.

    vs ``build_serving_search`` (replicate queries, all_gather S·k
    candidates once): the ring moves Q·D bytes total instead of
    holding all Q queries on every shard, and merges progressively —
    the large-Q regime where the replicated all_gather merge gets
    chunky.

    The ring runs over the FLATTENED (data, model) shard index —
    ``ppermute`` accepts the axis tuple — so model_parallel > 1 simply
    extends the ring (VERDICT r2 #4). ``precision`` threads the
    bf16/int8 scan copies through the local scan exactly like the
    all_gather route (phase-2 rescore stays fp32-exact); ``probed``
    runs the masked probed scan, with each block's probe cells
    rotating alongside its queries; filters ride ``aux_add`` like
    every other route.

    ``fn(corpus [N_pad, D] row-sharded, queries [Q_pad, D] ROW-SHARDED,
    aux_mul, aux_add row-sharded[, scan copies][, coded row-sharded,
    cells [Q_pad, P] query-row-sharded]) -> packed [2, Q_pad, k]
    row-sharded on the query axis`` (block i's rows hold block i's
    results).

    Tie contract: the per-step merge uses topk_values_min_id, so ties
    resolve by smallest global row id regardless of ring arrival order
    — identical results to the all_gather merge.
    """
    assert precision in ("fp32", "bf16", "int8"), precision
    n_shards = int(mesh.devices.size)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    axes = (DATA_AXIS, MODEL_AXIS)

    in_specs = [P(axes, None), P(axes, None), P(axes), P(axes)]
    if precision == "bf16":
        in_specs.append(P(axes, None))
    elif precision == "int8":
        in_specs += [P(axes, None), P(axes)]
    if probed:
        in_specs += [P(axes), P(axes, None)]

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=P(None, axes, None),
        check_vma=False,
    )
    def ring(corpus_l, q_l, aux_mul_l, aux_add_l, *rest):
        scan_kw = {}
        if precision == "bf16":
            scan_kw["corpus_scan"] = rest[0]
            rest = rest[1:]
        elif precision == "int8":
            scan_kw["corpus_scan_int8"] = (rest[0], rest[1])
            rest = rest[2:]
        coded_l, cells_l = rest if probed else (None, None)

        rows_local = corpus_l.shape[0]
        local_k = min(k, rows_local)
        qb = q_l.shape[0]
        my_offset = shard_index() * rows_local

        init_scores = jnp.full((qb, k), distance_ops.NEG_INF, jnp.float32)
        init_ids = jnp.full((qb, k), -1, jnp.int32)

        def body(carry, _):
            if probed:
                q, cells, scores, ids = carry
            else:
                q, scores, ids = carry
            # issue the heavy exchange FIRST: independent of the local
            # scan below, so it rides under the matmul
            q_next = jax.lax.ppermute(q, axes, perm)
            if probed:
                cells_next = jax.lax.ppermute(cells, axes, perm)
                d, li = topk2.topk_two_phase_probed(
                    corpus_l, q, aux_mul_l, aux_add_l, coded_l, cells,
                    k=local_k, metric=metric, **scan_kw,
                )
            else:
                d, li = topk2.topk_two_phase(
                    corpus_l, q, aux_mul_l, aux_add_l,
                    k=local_k, metric=metric, **scan_kw,
                )
            s_new = jnp.where(jnp.isinf(d), distance_ops.NEG_INF, -d)
            gids = jnp.where(li >= 0, li + my_offset, -1)

            cat_s = jnp.concatenate([scores, s_new], axis=1)
            cat_i = jnp.concatenate([ids, gids], axis=1)
            m_s, m_i = topk2.topk_values_min_id(cat_s, cat_i, k)

            # the small [Qb, k] carry serializes on the merge; the
            # [Qb, D] block above is already in flight
            s_next = jax.lax.ppermute(m_s, axes, perm)
            i_next = jax.lax.ppermute(m_i, axes, perm)
            if probed:
                return (q_next, cells_next, s_next, i_next), None
            return (q_next, s_next, i_next), None

        init = (
            (q_l, cells_l, init_scores, init_ids)
            if probed
            else (q_l, init_scores, init_ids)
        )
        carry, _ = jax.lax.scan(body, init, None, length=n_shards)
        scores, ids = carry[-2], carry[-1]
        out_d = jnp.where(scores == distance_ops.NEG_INF, jnp.inf, -scores)
        out_i = jnp.where(scores == distance_ops.NEG_INF, -1, ids)
        return topk2.pack_result(out_d, out_i)

    return ring


def build_dim_sharded_search(mesh: Mesh, k: int, metric: str):
    """Exact top-k with the D contraction SHARDED OVER MODEL_AXIS
    (SURVEY §5 long-context entry, "optionally the dimension axis";
    VERDICT r2 missing #4).

    Placement: corpus ``[N_pad, D]`` rows over DATA × columns over
    MODEL; prepared queries ``[Q, D]`` columns over MODEL; metric aux
    rows over DATA (aux is a full-D per-row reduction — computed
    before placement). Each shard contributes a partial dot over its
    D-slice; one ``psum`` over MODEL assembles the exact fp32 score,
    then per-data-shard top-k candidates merge over DATA only (MODEL
    shards hold identical candidates — gathering over both axes would
    duplicate rows into the merged pool).

    When it wins: capacity, not speed — a corpus whose row shard at
    full D exceeds one device's HBM can split columns instead. The
    psum moves a [Q, N/S_data] partial per step vs the row-sharded
    path's S·k candidates, so for HBM-resident corpora row sharding is
    strictly cheaper (measured: benchmarks/exp_dimshard.py). The score
    tile is materialized [Q, N/S_data] — small-Q wide-D territory.

    ``fn(corpus P(data, model), queries_p P(None, model), aux_mul
    P(data), aux_add P(data), q_sq [Q] replicated) -> packed [2, Q, k]
    replicated``. ``queries_p`` = topk2.prepare_queries (full-D
    normalize happens before column sharding); ``q_sq`` = per-query
    squared norms of the RAW queries (l2 distance conversion needs the
    full-D reduction).
    """
    axes = (DATA_AXIS, MODEL_AXIS)

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS, MODEL_AXIS),
            P(None, MODEL_AXIS),
            P(DATA_AXIS),
            P(DATA_AXIS),
            P(),
        ),
        out_specs=P(),
        check_vma=False,
    )
    def dim_search(corpus_l, qp_l, aux_mul_l, aux_add_l, q_sq):
        rows_local = corpus_l.shape[0]
        q = qp_l.shape[0]
        kk = min(k, rows_local)

        partial = jax.lax.dot_general(
            qp_l,
            corpus_l,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [Q, rows_local] — partial contraction over this D-slice
        s_dot = jax.lax.psum(partial, MODEL_AXIS)  # exact full-D dot
        s = s_dot * aux_mul_l[None, :] + aux_add_l[None, :]

        ids_local = jnp.broadcast_to(
            jnp.arange(rows_local, dtype=jnp.int32)[None, :], (q, rows_local)
        )
        top_s, top_i = topk2.topk_values_min_id(s, ids_local, kk)
        offset = jax.lax.axis_index(DATA_AXIS) * rows_local
        gids = jnp.where(top_s == distance_ops.NEG_INF, -1, top_i + offset)

        # merge over DATA only; shard-major ascending concat keeps the
        # (score desc, id asc) tie contract
        all_s = jax.lax.all_gather(top_s, DATA_AXIS)  # [S_d, Q, kk]
        all_i = jax.lax.all_gather(gids, DATA_AXIS)
        width = all_s.shape[0] * kk
        all_s = jnp.transpose(all_s, (1, 0, 2)).reshape(q, width)
        all_i = jnp.transpose(all_i, (1, 0, 2)).reshape(q, width)
        m_s, m_i = topk2.topk_values_min_id(all_s, all_i, min(k, width))
        if m_s.shape[1] < k:
            pad = k - m_s.shape[1]
            m_s = jnp.concatenate(
                [m_s, jnp.full((q, pad), distance_ops.NEG_INF)], axis=1
            )
            m_i = jnp.concatenate([m_i, jnp.full((q, pad), -1, jnp.int32)], axis=1)

        if metric == "l2":
            dist = jnp.sqrt(jnp.maximum(q_sq[:, None] - m_s, 0.0))
        elif metric == "cosine":
            dist = 0.5 - 0.5 * m_s
        else:
            dist = -m_s
        dist = jnp.where(m_s == distance_ops.NEG_INF, jnp.inf, dist)
        ids = jnp.where(m_s == distance_ops.NEG_INF, -1, m_i)
        return topk2.pack_result(dist, ids)

    return dim_search


def shard_corpus_dim(mesh: Mesh, corpus, mask=None, block: int = 256):
    """Place ``[N, D]`` rows-over-DATA × columns-over-MODEL, plus the
    row-sharded (full-D) metric aux inputs. Returns ``(corpus_dev,
    mask_dev)`` with rows padded per DATA shard (D must divide the
    MODEL axis)."""
    import numpy as np

    from jax.sharding import NamedSharding

    s_data = mesh.shape[DATA_AXIS]
    n, d = corpus.shape
    assert d % mesh.shape[MODEL_AXIS] == 0, (d, dict(mesh.shape))
    per = -(-n // s_data)
    per = -(-per // block) * block
    n_pad = per * s_data

    full = np.zeros((n_pad, d), dtype=corpus.dtype)
    full[:n] = corpus
    m = np.zeros(n_pad, dtype=bool)
    m[:n] = True if mask is None else mask

    corpus_dev = jax.device_put(
        full, NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))
    )
    mask_dev = jax.device_put(m, NamedSharding(mesh, P(DATA_AXIS)))
    return corpus_dev, mask_dev


@functools.lru_cache(maxsize=None)
def _permute_fn(mesh: Mesh, ndim: int):
    # memoized per (mesh, rank) so repeated layout builds key the jit
    # cache by SHAPE instead of recompiling a fresh closure every call
    # (remote compiles cost minutes in this environment)
    spec = P((DATA_AXIS, MODEL_AXIS), *([None] * (ndim - 1)))

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec, P((DATA_AXIS, MODEL_AXIS))),
        out_specs=spec,
    )
    def permute(x_l, p_l):
        return jnp.take(x_l, p_l, axis=0)

    return permute


def permute_rows_sharded(mesh: Mesh, x, perm_local):
    """Shard-local row permutation: ``out[s·L + i] = x[s·L + perm[s·L + i]]``
    where ``perm_local`` holds LOCAL indices. Keeps the gather on
    device — building a clustered layout never copies the corpus
    through the host."""
    return _permute_fn(mesh, x.ndim)(x, perm_local)


@functools.partial(jax.jit, static_argnames=("metric",))
def _prepare_aux_jit(corpus_dev, mask_dev, metric: str):
    return topk2.prepare_aux(corpus_dev, mask_dev, metric)


def shard_aux(corpus_dev, mask_dev, metric: str):
    """Precompute row-sharded (aux_mul, aux_add) for the sharded search
    (one corpus pass, amortized across all subsequent queries). Plain
    jit: prepare_aux is row-wise, so sharding propagates."""
    return _prepare_aux_jit(corpus_dev, mask_dev, metric)


def shard_scan_int8(corpus_dev):
    """Row-sharded int8 scan copy ``(v8 [N,D] int8, sv [N] f32)`` —
    per-row quantization, so the corpus row sharding propagates
    (quantize_corpus_int8 is jitted at its def site)."""
    return topk2.quantize_corpus_int8(corpus_dev)


@jax.jit
def _bf16_copy_jit(corpus_dev):
    return corpus_dev.astype(jnp.bfloat16)


def shard_scan_bf16(corpus_dev):
    """Row-sharded bf16 scan copy (element-wise cast; sharding propagates)."""
    return _bf16_copy_jit(corpus_dev)


def build_sharded_search_probed(
    mesh: Mesh,
    k: int,
    metric: str,
    block: int | None = None,  # unused; kept for call-site compatibility
):
    """Sharded IVF search: row-sharded cell ids travel with the corpus;
    each shard scans only rows whose cell is in the query's probe set.

    ``fn(corpus, queries, mask, coded, cells) → (dist [Q,k], ids [Q,k])``
    with ``coded`` row-sharded int32 and ``cells`` replicated [Q, P].
    """
    return _build(mesh, k, metric, probed=True)


def shard_corpus(
    mesh: Mesh, corpus, mask=None, block: int = 8192
) -> tuple[jax.Array, jax.Array]:
    """Place a host ``[N, D]`` matrix row-sharded on the mesh, padding
    so every shard is a whole number of scan blocks."""
    import numpy as np

    n_shards = mesh.devices.size
    n, d = corpus.shape
    per = -(-n // n_shards)
    per = -(-per // block) * block
    n_pad = per * n_shards

    full = np.zeros((n_pad, d), dtype=corpus.dtype)
    full[:n] = corpus
    m = np.zeros(n_pad, dtype=bool)
    m[:n] = True if mask is None else mask

    corpus_dev = jax.device_put(full, row_sharding(mesh, 2))
    mask_dev = jax.device_put(m, row_sharding(mesh, 1))
    return corpus_dev, mask_dev
