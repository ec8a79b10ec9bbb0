"""Bucket-selection strategy shootout at [1024, 8192], kp=24.

lax.top_k on TPU is sort-like: ~25.6 ms flat at this shape, and the
hierarchical two-level variant still pays ~width-proportional cost in
its second top_k. For kp << width an iterated argmax (kp x (max +
one-hot mask)) is O(kp*N) VPU work with no sort at all.

    python -m benchmarks.exp_topk
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from fenix_tpu.ops import topk2

NEG_INF = float("-inf")


@functools.partial(jax.jit, static_argnames=("kp",))
def sel_flat(bm, kp):
    _, bidx = jax.lax.top_k(bm, kp)
    return jnp.sum(bidx)


@functools.partial(jax.jit, static_argnames=("kp",))
def sel_hier(bm, kp):
    return jnp.sum(topk2.topk_buckets(bm, kp))


@functools.partial(jax.jit, static_argnames=("kp",))
def sel_iter(bm, kp):
    q, nb = bm.shape
    rows = jnp.arange(q)

    def body(carry, _):
        cur = carry
        idx = jnp.argmax(cur, axis=-1)
        cur = cur.at[rows, idx].set(NEG_INF)
        return cur, idx

    _, idxs = jax.lax.scan(body, bm, None, length=kp)
    return jnp.sum(idxs.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("kp",))
def sel_iter_masked(bm, kp):
    """argmax + one-hot where-mask (no scatter — scatter can lower badly)."""
    q, nb = bm.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (q, nb), 1)

    def body(carry, _):
        cur = carry
        idx = jnp.argmax(cur, axis=-1)
        cur = jnp.where(cols == idx[:, None], NEG_INF, cur)
        return cur, idx

    _, idxs = jax.lax.scan(body, bm, None, length=kp)
    return jnp.sum(idxs.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("kp",))
def sel_hier_iter(bm, kp):
    """group-max -> iterated argmax over groups -> gather -> iterated argmax."""
    q, nb = bm.shape
    G = 128
    g = nb // G
    grouped = bm.reshape(q, g, G)
    gmax = grouped.max(axis=-1)
    rows = jnp.arange(q)

    def body(carry, _):
        cur = carry
        idx = jnp.argmax(cur, axis=-1)
        cur = cur.at[rows, idx].set(NEG_INF)
        return cur, idx

    _, gidx = jax.lax.scan(body, gmax, None, length=kp)  # [kp, Q]
    gidx = jnp.sort(gidx.T, axis=-1)  # [Q, kp]
    cand = jnp.take_along_axis(grouped, gidx[:, :, None], axis=1).reshape(q, kp * G)
    ids = (gidx[:, :, None] * G + jax.lax.broadcasted_iota(jnp.int32, (1, 1, G), 2)).reshape(q, kp * G)

    def body2(carry, _):
        cur = carry
        idx = jnp.argmax(cur, axis=-1)
        cur = cur.at[rows, idx].set(NEG_INF)
        return cur, idx

    _, pos = jax.lax.scan(body2, cand, None, length=kp)
    return jnp.sum(jnp.take_along_axis(ids, pos.T, axis=1))


def timeit(fn, *args, iters=10):
    np.asarray(fn(*args))
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - start) / iters


def main():
    q, nb, kp = 1024, 8192, 24
    bm = jax.random.normal(jax.random.PRNGKey(0), (q, nb), dtype=jnp.float32)
    np.asarray(bm[0, 0])

    for name, fn in (
        ("flat_topk", sel_flat),
        ("hier_topk", sel_hier),
        ("iter_argmax", sel_iter),
        ("iter_argmax_mask", sel_iter_masked),
        ("hier_iter", sel_hier_iter),
    ):
        t = timeit(fn, bm, kp)
        print(json.dumps({"variant": name, "ms": round(t * 1e3, 2)}), flush=True)

    # correctness cross-check on device
    want = np.sort(np.asarray(jax.lax.top_k(bm, kp)[1]), axis=-1)
    got = np.sort(np.asarray(topk2.topk_buckets(bm, kp)), axis=-1)
    print(json.dumps({"hier_matches_flat": bool((want == got).all())}), flush=True)


if __name__ == "__main__":
    main()
