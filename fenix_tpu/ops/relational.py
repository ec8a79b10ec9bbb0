"""Relational operators as device kernels: sort, filter-compaction,
join, group-by aggregate.

The reference delegates all of this to Arrow C++ / DuckDB on the host
(SURVEY.md §2.3: filter/take/isin, `select_k_unstable`, hash joins in
the DuckDB baseline). Here they are JAX/XLA computations over padded
dense columns so they compose with the distance kernels on device.

TPU-first shape discipline: every operator takes/returns **static**
shapes; variable-size results come back as (padded arrays, valid
count). Sort-based implementations are used where a CPU engine would
hash — on TPU a bitonic/radix sort over lanes beats pointer-chasing
hash tables, and XLA lowers ``sort`` to the native sort unit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


# -- sort -----------------------------------------------------------------


@jax.jit
def sort_kv(keys: jax.Array, values: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Stable ascending sort of (keys, values) pairs."""
    return jax.lax.sort((keys, values), dimension=0, is_stable=True, num_keys=1)


@jax.jit
def argsort_stable(keys: jax.Array) -> jax.Array:
    iota = jnp.arange(keys.shape[0], dtype=jnp.int32)
    _, perm = jax.lax.sort((keys, iota), dimension=0, is_stable=True, num_keys=1)
    return perm


# A radix-sort merge contender (LSD counting sort from one-hot prefix
# sums) was implemented and measured against all_gather + lax.top_k at
# pod-scale S·k (benchmarks/exp_merge.py, which keeps the contender
# implementation): top_k won every cell by 10-120× — TPU top_k lowers
# to the native sort unit, while the radix one-hot cumsum is 8 passes
# of dense [n, 16] work plus scatters. See docs/DESIGN.md "Multi-chip
# execution"; the shipping merge (parallel/search.merge_candidates) is
# the measured winner.


# -- filter → compaction --------------------------------------------------


@functools.partial(jax.jit, static_argnames=("width",))
def compact_indices(
    mask: jax.Array, width: int | None = None
) -> tuple[jax.Array, jax.Array]:
    """Batched filter→compaction: for ``[..., N]`` masks, the indices of
    True rows stably packed to the front (padded with N), sliced to
    ``width`` columns; plus per-row counts.

    The Arrow-C++ ``filter`` equivalent as a device kernel (SURVEY §2.3
    "vectorized filter (mask+compaction)"); one batched stable sort —
    XLA lowers it to the native sort unit, no per-row control flow.
    Feeds the streamed no-top-k read (fenix_tpu.ops.select).
    """
    n = mask.shape[-1]
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), mask.shape)
    # sort by (!mask) keeps True rows first, stably (original order)
    keys = jnp.where(mask, 0, 1).astype(jnp.int32)
    _, packed = jax.lax.sort((keys, iota), dimension=-1, is_stable=True, num_keys=1)
    count = mask.sum(axis=-1, dtype=jnp.int32)
    w = n if width is None else width
    packed = packed[..., :w]
    pos = jnp.arange(w, dtype=jnp.int32)
    packed = jnp.where(pos < count[..., None], packed, n)
    return packed, count


@jax.jit
def compact(mask: jax.Array) -> tuple[jax.Array, jax.Array]:
    """1-D convenience form of :func:`compact_indices`: gather
    ``indices[:count]``."""
    packed, count = compact_indices(mask)
    return packed, count


# -- join -----------------------------------------------------------------


@jax.jit
def sort_with_index(keys: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(sorted keys, original positions) — the build side of a lookup
    join, cacheable per table (stable: duplicate keys keep row order)."""
    iota = jnp.arange(keys.shape[0], dtype=jnp.int32)
    return jax.lax.sort((keys, iota), dimension=0, is_stable=True, num_keys=1)


@jax.jit
def join_lookup_sorted(
    left_keys: jax.Array, sorted_keys: jax.Array, sorted_index: jax.Array
) -> jax.Array:
    """Probe side of the lookup join against a pre-sorted build side."""
    n = sorted_keys.shape[0]
    pos = jnp.searchsorted(sorted_keys, left_keys, side="left")
    pos = jnp.clip(pos, 0, n - 1)
    hit = sorted_keys[pos] == left_keys
    return jnp.where(hit, sorted_index[pos], -1)


@jax.jit
def join_lookup(left_keys: jax.Array, right_keys: jax.Array) -> jax.Array:
    """Primary-key (enrichment) join: for each left key, the index of a
    matching row in ``right_keys`` or −1.

    ``right_keys`` need not be sorted or unique; with duplicates the
    first occurrence (smallest index) wins — deterministic. This is the
    join shape the engine uses to attach attribute tables to kNN
    results (BASELINE.json config 3).
    """
    n = right_keys.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    sk, si = jax.lax.sort((right_keys, iota), dimension=0, is_stable=True, num_keys=1)
    pos = jnp.searchsorted(sk, left_keys, side="left")
    pos = jnp.clip(pos, 0, n - 1)
    hit = sk[pos] == left_keys
    return jnp.where(hit, si[pos], -1)


@functools.partial(jax.jit, static_argnames=("max_matches",))
def join_inner_sorted(
    left_keys: jax.Array,
    sorted_keys: jax.Array,
    sorted_index: jax.Array,
    max_matches: int,
    n_valid: "jax.Array | None" = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """General inner join against a PRE-SORTED build side — the
    cacheable form the engine serves (``DeviceCache.sorted_key`` builds
    the sorted index once per attribute-table revision).

    Returns (left_idx [max_matches], right_idx [max_matches], count);
    pairs beyond ``count`` are (−1, −1). Pairs are emitted in left-row
    order, duplicates in right-row order — fully deterministic.
    Searchsorted + bounded expansion (the TPU-shaped analog of a hash
    join probe; static ``max_matches`` replaces dynamic output).

    ``n_valid``: length of the VALID PREFIX of the sorted build side,
    when it carries an int-max padding tail (sorted_key pads device
    blocks that way; stable sort keeps real INT32_MAX keys ahead of
    the sentinels). Without the clamp a legal INT32_MAX probe key
    counts every padding slot as a match, inflating ``count`` past
    ``max_matches``.
    """
    n_right = sorted_keys.shape[0]
    lo = jnp.searchsorted(sorted_keys, left_keys, side="left")
    hi = jnp.searchsorted(sorted_keys, left_keys, side="right")
    if n_valid is not None:
        lo = jnp.minimum(lo, n_valid)
        hi = jnp.minimum(hi, n_valid)
    counts = (hi - lo).astype(jnp.int32)  # matches per left row

    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)[:-1]]
    )
    total = counts.sum(dtype=jnp.int32)

    out_iota = jnp.arange(max_matches, dtype=jnp.int32)
    # For each output slot, which left row does it belong to?
    owner = jnp.searchsorted(starts + counts, out_iota, side="right").astype(jnp.int32)
    owner = jnp.clip(owner, 0, left_keys.shape[0] - 1)
    offset = out_iota - starts[owner]
    ridx = sorted_index[jnp.clip(lo[owner] + offset, 0, n_right - 1)]

    valid = out_iota < total
    return (
        jnp.where(valid, owner, -1),
        jnp.where(valid, ridx, -1),
        total,
    )


@functools.partial(jax.jit, static_argnames=("max_matches",))
def join_inner(
    left_keys: jax.Array, right_keys: jax.Array, max_matches: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """General inner join on single keys (unsorted build side):
    sort + :func:`join_inner_sorted`."""
    n_right = right_keys.shape[0]
    iota_r = jnp.arange(n_right, dtype=jnp.int32)
    sk, si = jax.lax.sort((right_keys, iota_r), dimension=0, is_stable=True, num_keys=1)
    return join_inner_sorted(left_keys, sk, si, max_matches)


# -- group-by aggregate ---------------------------------------------------

_AGG_INIT = {
    "sum": 0.0,
    "count": 0.0,
    "min": jnp.inf,
    "max": -jnp.inf,
    "mean": 0.0,
}


def _group_prep(keys, values, mask):
    """Shared sort + group-id machinery: returns (sorted keys, sorted
    values, ascending group index, new-group flags, dropped-group
    count). Row validity is carried OUT-OF-BAND as the primary sort
    key — masked rows sort after every valid row regardless of key
    value, collapse to one trailing group, and the count of that group
    (0 or 1) comes back for the caller to subtract. An in-band max-int
    sentinel key (the previous scheme) silently merged masked rows
    with a REAL group keyed exactly INT32_MAX (VERDICT r3 #4)."""
    if mask is None:
        sk, sv = jax.lax.sort(
            (keys, values), dimension=0, is_stable=True, num_keys=1
        )
        new_group = jnp.concatenate(
            [jnp.ones((1,), jnp.int32), (sk[1:] != sk[:-1]).astype(jnp.int32)]
        )
        gid = jnp.cumsum(new_group) - 1  # [N] group index, ascending
        return sk, sv, gid, new_group, jnp.int32(0)

    inval = jnp.where(mask, 0, 1).astype(jnp.int32)
    # masked rows' keys are never read again — collapse them to one
    # constant so they form exactly ONE trailing group
    keys = jnp.where(mask, keys, 0)
    inval_s, sk, sv = jax.lax.sort(
        (inval, keys, values), dimension=0, is_stable=True, num_keys=2
    )
    new_group = jnp.concatenate(
        [
            jnp.ones((1,), jnp.int32),
            ((sk[1:] != sk[:-1]) | (inval_s[1:] != inval_s[:-1])).astype(jnp.int32),
        ]
    )
    gid = jnp.cumsum(new_group) - 1
    return sk, sv, gid, new_group, inval_s[-1]  # 1 iff any masked row


def _group_keys_count(sk, gid, new_group, max_groups: int, dropped):
    """(group_keys [g], n_groups, valid-slot mask) for prepped groups.
    ``dropped`` is _group_prep's masked-group count (0 or 1), subtracted
    from the distinct-group total. Slots ≥ n_groups carry the max-int
    PADDING marker — consumers must slice by the returned count (a real
    group keyed INT32_MAX is a valid slot below it)."""
    group_keys = jax.ops.segment_max(
        jnp.where(new_group == 1, sk, jnp.iinfo(sk.dtype).min),
        gid,
        num_segments=max_groups,
    )
    n_groups = gid[-1] + 1 - dropped
    slot = jnp.arange(max_groups, dtype=jnp.int32)
    valid = slot < n_groups
    group_keys = jnp.where(valid, group_keys, jnp.iinfo(sk.dtype).max)
    return group_keys, n_groups, valid


@functools.partial(jax.jit, static_argnames=("max_groups", "agg"))
def group_aggregate(
    keys: jax.Array,
    values: jax.Array,
    max_groups: int,
    agg: str = "sum",
    mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Group ``values`` by ``keys`` (hash-aggregate equivalent).

    Returns (group_keys [max_groups], aggregates [max_groups], count):
    groups sorted ascending by key; slots ≥ count carry key = max-int
    sentinel. Sort + segment reduction — deterministic. Accumulates in
    float32 — use :func:`group_aggregate_int` for integer value
    columns (f32 rounds integer sums past 2^24).
    """
    sk, sv, gid, new_group, dropped = _group_prep(keys, values, mask)

    if agg == "count":
        contrib = jnp.ones_like(sv, dtype=jnp.float32)
        out = jax.ops.segment_sum(contrib, gid, num_segments=max_groups)
    elif agg == "sum":
        out = jax.ops.segment_sum(sv.astype(jnp.float32), gid, num_segments=max_groups)
    elif agg == "mean":
        s = jax.ops.segment_sum(sv.astype(jnp.float32), gid, num_segments=max_groups)
        c = jax.ops.segment_sum(
            jnp.ones_like(sv, dtype=jnp.float32), gid, num_segments=max_groups
        )
        out = s / jnp.maximum(c, 1.0)
    elif agg == "min":
        out = jax.ops.segment_min(sv.astype(jnp.float32), gid, num_segments=max_groups)
    elif agg == "max":
        out = jax.ops.segment_max(sv.astype(jnp.float32), gid, num_segments=max_groups)
    else:
        raise ValueError(f"unknown agg {agg!r}")

    group_keys, n_groups, valid = _group_keys_count(
        sk, gid, new_group, max_groups, dropped
    )
    out = jnp.where(valid, out, 0)
    return group_keys, out, n_groups


@functools.partial(jax.jit, static_argnames=("max_groups",))
def group_sum_count(
    keys: jax.Array,
    values: jax.Array,
    max_groups: int,
    mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """(group_keys, sums, counts, n) in ONE sort pass — the
    cross-shard-combinable partial for a distributed mean (sum and
    count ship separately; the division happens after the merge).
    Two :func:`group_aggregate` calls would redo the device sort."""
    sk, sv, gid, new_group, dropped = _group_prep(keys, values, mask)
    s = jax.ops.segment_sum(sv.astype(jnp.float32), gid, num_segments=max_groups)
    c = jax.ops.segment_sum(
        jnp.ones_like(sv, dtype=jnp.float32), gid, num_segments=max_groups
    )
    group_keys, n_groups, valid = _group_keys_count(
        sk, gid, new_group, max_groups, dropped
    )
    return group_keys, jnp.where(valid, s, 0), jnp.where(valid, c, 0), n_groups


# Exact integer aggregation: TPU vector lanes are 32-bit (no native
# int64/float64), so exact int64 sums come from LIMB DECOMPOSITION —
# the uint32 reinterpretation of each value splits into b-bit limbs,
# every limb segment-sums exactly in int32, and the host recombines in
# int64: sum = Σ Sⱼ·2^(bj) − 2^32·n_negative. (VERDICT r1 #6 / r2
# weak #3: f32 accumulation silently rounds int sums past 2^24.)
#
# The limb width is STATIC IN THE ROW COUNT (shapes are static under
# jit): limb sums are < n·(2^b−1), so b = min(6, 31 − ceil_log2(n))
# keeps every per-group sum exact in int32 at ANY row count below 2^30
# — 100M rows in one group runs with 4-bit limbs instead of raising
# (VERDICT r3 weak #5 retired the old 2^25 bound). More limbs cost
# more segment-sum passes only on inputs that actually carry that many
# rows; the common ≤2^25 case keeps the original 6×6-bit plan.
_LIMB_BITS = 6  # widest limb (row counts ≤ INT_AGG_ROW_BOUND)
_LIMBS = 6  # lanes for the widest plan: 36 bits ≥ uint32's 32
INT_AGG_LANES = _LIMBS + 2  # widest-plan lanes: limb sums + neg count + count
INT_AGG_ROW_BOUND = 1 << (31 - _LIMB_BITS)  # rows where limbs start narrowing


def _limb_plan(n_rows: int) -> tuple[int, int]:
    """(bits, limbs) for an exact int32 limb decomposition at
    ``n_rows`` rows. The bits→limbs map is bijective (1→32, 2→16,
    3→11, 4→8, 5→7, 6→6), so :func:`unpack_int_aggregate` can infer
    the width back from the lane count alone."""
    bits = min(_LIMB_BITS, 31 - max(1, (int(n_rows) - 1).bit_length()))
    if bits < 1:
        raise ValueError(
            f"group_aggregate_int bounded at 2^30 rows per call "
            f"(got {n_rows}): even 1-bit limb sums would overflow int32 — "
            "chunk the rows and merge the int64 partials on the host"
        )
    return bits, -(-32 // bits)


@functools.partial(jax.jit, static_argnames=("max_groups", "agg"))
def group_aggregate_int(
    keys: jax.Array,
    values: jax.Array,
    max_groups: int,
    agg: str = "sum",
    mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """EXACT integer group aggregate (see limb note above).

    Returns (group_keys [g], lanes [g, L] int32, count): L = limbs+2
    for sum/mean (limb sums, negative count, count — limb count set by
    the static row count via :func:`_limb_plan`), 1 for count/min/max.
    :func:`unpack_int_aggregate` turns lanes into int64 aggregates
    (float64 for mean) on the host.
    """
    values = values.astype(jnp.int32)
    sk, sv, gid, new_group, dropped = _group_prep(keys, values, mask)

    if agg in ("sum", "mean"):
        bits, limbs = _limb_plan(values.shape[0])
        u = sv.astype(jnp.uint32)
        lanes = [
            jax.ops.segment_sum(
                ((u >> (bits * j)) & ((1 << bits) - 1)).astype(jnp.int32),
                gid,
                num_segments=max_groups,
            )
            for j in range(limbs)
        ]
        lanes.append(
            jax.ops.segment_sum((sv < 0).astype(jnp.int32), gid, num_segments=max_groups)
        )
        lanes.append(
            jax.ops.segment_sum(
                jnp.ones_like(sv, dtype=jnp.int32), gid, num_segments=max_groups
            )
        )
        out = jnp.stack(lanes, axis=1)  # [g, limbs + 2]
    elif agg == "count":
        out = jax.ops.segment_sum(
            jnp.ones_like(sv, dtype=jnp.int32), gid, num_segments=max_groups
        )[:, None]
    elif agg == "min":
        out = jax.ops.segment_min(sv, gid, num_segments=max_groups)[:, None]
    elif agg == "max":
        out = jax.ops.segment_max(sv, gid, num_segments=max_groups)[:, None]
    else:
        raise ValueError(f"unknown agg {agg!r}")

    group_keys, n_groups, valid = _group_keys_count(
        sk, gid, new_group, max_groups, dropped
    )
    out = jnp.where(valid[:, None], out, 0)
    return group_keys, out, n_groups


def int_agg_lanes(agg: str, n_rows: int | None = None) -> int:
    """Lane count :func:`group_aggregate_int` emits for ``agg`` over
    ``n_rows`` rows (widest plan when n_rows is omitted). Consumers
    that only hold the packed array can instead infer the lane count
    from its length — the device/host contract is self-describing."""
    if agg not in ("sum", "mean"):
        return 1
    return (_LIMBS if n_rows is None else _limb_plan(n_rows)[1]) + 2


def unpack_int_aggregate(lanes, agg: str):
    """Host-side int64 recombination of :func:`group_aggregate_int`
    lanes ([g, L] int32/int64 as numpy). int64 for sum/count/min/max;
    float64 (exact sum / count) for mean. The limb width is inferred
    from L (bits→limbs is bijective), so partials from any row count —
    including cross-shard merged SUMS of partials, which stay
    lane-linear — unpack with the matching plan."""
    import numpy as np

    if agg in ("count", "min", "max"):
        return lanes[:, 0].astype(np.int64)
    limbs = lanes.shape[1] - 2
    bits = -(-32 // limbs)
    s = sum(lanes[:, j].astype(np.int64) << (bits * j) for j in range(limbs))
    s = s - (lanes[:, limbs].astype(np.int64) << 32)
    if agg == "mean":
        cnt = np.maximum(lanes[:, limbs + 1].astype(np.int64), 1)
        return s.astype(np.float64) / cnt
    return s


# -- hash partition (for distributed shuffle) ------------------------------


@functools.partial(jax.jit, static_argnames=("num_partitions",))
def hash_partition(keys: jax.Array, num_partitions: int) -> jax.Array:
    """Partition id per row via an avalanching integer hash
    (fnv/murmur-style finalizer) — the shuffle key for multi-host
    table distribution (BASELINE.json: hash-partitioned tables)."""
    x = keys.astype(jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x85EBCA6B)
    x = (x ^ (x >> 13)) * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return (x % jnp.uint32(num_partitions)).astype(jnp.int32)
