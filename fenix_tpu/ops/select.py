"""Streamed no-top-k reads: distance column over all selected rows.

Reference semantics (/root/reference/src/fenix/io/index/index.py:161-168
with ``maxval=None``): filter → append ``__DISTANCE__`` → return every
surviving row. The reference materializes the full filtered table on
the host; round 1 of this framework fetched the full ``[Q, N]`` distance
matrix and looped queries in Python (VERDICT r1 weak #2). Here the
selection happens ON DEVICE:

- one counts pass over the whole corpus (``lax.scan`` over row chunks,
  or a plain reshape-sum when only a filter applies) returns
  per-(chunk, query) selected counts — a tiny fetch;
- per chunk WITH matches, a compaction kernel gathers the selected row
  ids and their exact distances at a static width (the chunk's max
  count, canonicalized to a power of two so the jit cache stays
  bounded).

Host transfer is O(selected rows), never O(Q·N); probe membership is
evaluated in-kernel via ``searchsorted`` over each query's sorted probe
cells (no ``[Q, C, P]`` broadcast, no host ``np.isin`` loops).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from fenix_tpu.ops import distance as distance_ops
from fenix_tpu.ops import relational


def chunk_for(n_pad: int, q_pad: int, block: int) -> int:
    """Row-chunk width: the cache's block size, halved while the
    [Q, chunk] distance tile would exceed ~64 MB. Always divides
    ``n_pad`` (device columns pad to whole blocks; blocks are powers
    of two)."""
    chunk = min(block, n_pad)
    while chunk > 512 and chunk * q_pad > (1 << 24):
        chunk //= 2
    while n_pad % chunk:
        chunk //= 2
    return max(chunk, 1)


def _probe_member(codes: jax.Array, cells_sorted: jax.Array) -> jax.Array:
    """``[C]`` int32 cell ids × ``[Q, P]`` per-query SORTED probe cells
    → ``[Q, C]`` membership. searchsorted keeps the cost at
    O(Q·C·log P) without materializing ``[Q, C, P]``."""
    p = cells_sorted.shape[1]

    def one(cq):
        idx = jnp.searchsorted(cq, codes)
        return cq[jnp.minimum(idx, p - 1)] == codes

    return jax.vmap(one)(cells_sorted)


@functools.partial(jax.jit, static_argnames=("chunk",))
def count_selected_mask(fmask: jax.Array, rows, *, chunk: int) -> jax.Array:
    """Per-chunk selected counts for a filter-only selection
    (query-independent): ``[n_chunks]`` int32."""
    n_pad = fmask.shape[0]
    valid = jnp.arange(n_pad, dtype=jnp.int32) < rows
    m = jnp.logical_and(fmask, valid)
    return m.reshape(n_pad // chunk, chunk).sum(axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("chunk",))
def count_selected_probed(
    fmask, coded: jax.Array, cells_sorted: jax.Array, rows, *, chunk: int
) -> jax.Array:
    """Per-(chunk, query) selected counts with probe pruning:
    ``[n_chunks, Q]`` int32. ``fmask`` may be None (no filter)."""
    n_pad = coded.shape[0]
    n_chunks = n_pad // chunk
    coded_chunks = coded.reshape(n_chunks, chunk)
    base = jnp.arange(n_pad, dtype=jnp.int32) < rows
    if fmask is not None:
        base = jnp.logical_and(base, fmask)
    base_chunks = base.reshape(n_chunks, chunk)

    def body(_, x):
        cd, b = x
        mem = jnp.logical_and(_probe_member(cd, cells_sorted), b[None, :])
        return None, mem.sum(axis=1).astype(jnp.int32)

    _, counts = jax.lax.scan(body, None, (coded_chunks, base_chunks))
    return counts


@functools.partial(jax.jit, static_argnames=("metric", "chunk", "width"))
def compact_chunk(
    corpus: jax.Array,  # [N_pad, D]
    queries: jax.Array,  # [Q, D]
    fmask,  # [N_pad] bool or None
    coded,  # [N_pad] int32 or None
    cells_sorted,  # [Q, P] int32 (sorted) or None
    start,  # int32 scalar: chunk's first row (traced — one compile)
    rows,  # int32 scalar: real row count
    *,
    metric: str,
    chunk: int,
    width: int,
):
    """Selected (global row ids, exact distances) for one row chunk:
    ``(ids [Q, width] int32 ascending per query with −1 padding,
    dists [Q, width] f32 with +inf padding)``. Distance values use the
    fp32-true matmul — identical to ``distance.all_distances``."""
    dim = corpus.shape[1]
    vblock = jax.lax.dynamic_slice(corpus, (start, 0), (chunk, dim))
    gidx = start + jnp.arange(chunk, dtype=jnp.int32)
    base = gidx < rows
    if fmask is not None:
        base = jnp.logical_and(base, jax.lax.dynamic_slice(fmask, (start,), (chunk,)))
    if coded is not None:
        cd = jax.lax.dynamic_slice(coded, (start,), (chunk,))
        mask = jnp.logical_and(_probe_member(cd, cells_sorted), base[None, :])
    else:
        mask = jnp.broadcast_to(base[None, :], (queries.shape[0], chunk))

    dist = distance_ops.pairwise_distance(
        queries, vblock, metric, precision=jax.lax.Precision.HIGHEST
    )

    # batched stable-sort compaction (relational.compact_indices): True
    # rows pack to the front in table order, padding slots carry `chunk`
    idx, _ = relational.compact_indices(mask, width=width)
    got = idx < chunk
    safe = jnp.minimum(idx, chunk - 1)
    d = jnp.take_along_axis(dist, safe, axis=1)
    ids = jnp.where(got, start + idx.astype(jnp.int32), -1)
    d = jnp.where(got, d, jnp.inf)
    return ids, d
