"""Distributed top-k MERGE strategy decision (VERDICT r2 #6).

After the candidate all_gather, every device holds [Q, S·k] (score,
global-id) pairs and must reduce them to the top k. Two contenders:

- ``lax.top_k`` over the gathered row (what merge_candidates ships):
  XLA lowers to the native sort unit.
- an LSD radix counting sort from one-hot prefix sums (implemented
  below — it lived in ops/relational until this measurement retired
  it), vmapped per query, descending order via the monotone uint32
  bitcast of the score (then slice k).

Measured at pod-scale S ∈ {8, 64, 256}, k ∈ {100, 1024}, Q=8. The
BASELINE north-star wording ("distributed radix-sort/selection tree")
demanded a measured decision, not an orphan operator.
"""

from __future__ import annotations

import numpy as np

from benchmarks import common


def main() -> None:
    args = common.parser("top-k merge: radix sort vs lax.top_k").parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("bits_per_pass",))
    def radix_sort_kv(keys, values, bits_per_pass: int = 4):
        """LSD radix sort of non-negative int32 keys with carried
        values: each pass is a stable counting sort of one digit from
        one-hot prefix sums — dense VPU work, no data-dependent
        control flow."""
        radix = 1 << bits_per_pass
        num_passes = (32 + bits_per_pass - 1) // bits_per_pass

        def one_pass(carry, shift):
            k, v = carry
            digit = (k >> shift) & (radix - 1)
            onehot = (
                digit[:, None] == jnp.arange(radix, dtype=digit.dtype)[None, :]
            ).astype(jnp.int32)
            within = jnp.cumsum(onehot, axis=0) - onehot
            counts = jnp.sum(onehot, axis=0)
            base = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]]
            )
            pos = base[digit] + jnp.take_along_axis(within, digit[:, None], axis=1)[:, 0]
            k = jnp.zeros_like(k).at[pos].set(k)
            v = jnp.zeros_like(v).at[pos].set(v)
            return (k, v), None

        shifts = jnp.arange(num_passes, dtype=jnp.int32) * bits_per_pass
        (k_out, v_out), _ = jax.lax.scan(one_pass, (keys, values), shifts)
        return k_out, v_out

    rng = np.random.default_rng(0)
    q = 8
    results = []

    @functools.partial(jax.jit, static_argnames=("k",))
    def topk_merge(scores, gids, k):
        s, pos = jax.lax.top_k(scores, k)
        return s, jnp.take_along_axis(gids, pos, axis=1)

    @functools.partial(jax.jit, static_argnames=("k",))
    def radix_merge(scores, gids, k):
        # descending float order == ascending order of the flipped
        # monotone uint32 bitcast (sign-aware)
        u = jax.lax.bitcast_convert_type(scores, jnp.uint32)
        mono = jnp.where(
            scores >= 0, u | jnp.uint32(0x80000000), ~u
        )  # ascending uint == ascending float
        key = (~mono).astype(jnp.int32) & jnp.int32(0x7FFFFFFF)  # non-neg, desc float
        sk, sv = jax.vmap(radix_sort_kv)(key, gids)
        return sk[:, :k], sv[:, :k]

    for s_shards in (8, 64, 256):
        for k in (100, 1024):
            width = s_shards * k
            scores = jnp.asarray(
                rng.standard_normal((q, width)).astype(np.float32)
            )
            gids = jnp.asarray(
                rng.integers(0, 1 << 30, (q, width)).astype(np.int32)
            )
            t_topk = common.timeit(lambda: topk_merge(scores, gids, k), args.iters)
            t_radix = common.timeit(lambda: radix_merge(scores, gids, k), args.iters)
            results.append(
                {
                    "S": s_shards,
                    "k": k,
                    "width": width,
                    "t_topk_ms": round(t_topk * 1e3, 3),
                    "t_radix_ms": round(t_radix * 1e3, 3),
                    "radix_over_topk": round(t_radix / t_topk, 2),
                }
            )

    worst = max(r["radix_over_topk"] for r in results)
    best = min(r["radix_over_topk"] for r in results)
    common.emit(
        "merge_radix_vs_topk",
        best,
        "x (radix/topk best case; >1 = top_k wins everywhere)",
        grid=results,
        worst_case=worst,
        backend=__import__("jax").default_backend(),
    )


if __name__ == "__main__":
    main()
