"""Attempted sustained scan beyond the 8M bench scale — MEASURED
NEGATIVE on this environment's tunnel device (2026-08-21): every leg
from 10M dual-residency (5+2.5 GB) through 16M fp32-only (8 GB)
RESOURCE_EXHAUSTs, including with chunked donated-buffer generation
(one 16M jax.random.normal transiently needs 2× = 16 GB, but even
6 GB single-array legs fail). Together with the largest SUCCESSFUL
residencies (config2_fullscale's 7.7 GB int8 corpus; bench's ~7.5 GB
of 8M fp32+int8+bf16 copies), the usable HBM exposed through this
remote tunnel is ~8-9 GB, not the v5e's nominal 16 GB — the binding
limit for single-chip scale here is the stack, not the kernels. Larger
corpora are the mesh's job (parallel/search row sharding); kept
runnable so a direct-attached chip can redo the sweep.

    PYTHONPATH=/root/repo:/root/.axon_site python -m benchmarks.exp_16m
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import detect_hbm_bw
    from fenix_tpu.ops import topk2

    d, k = 128, 16
    n = 16 * 1_048_576
    rng = np.random.default_rng(0)
    roofline = detect_hbm_bw(jax.devices()[0])

    @functools.partial(jax.jit, static_argnames=("k_",))
    def sustained(corpus_, qb, mul, add, k_, scan_int8=None):
        def body(_, q):
            return None, topk2.topk_two_phase(
                corpus_, q, mul, add, k=k_, metric="cosine",
                corpus_scan_int8=scan_int8,
            )

        _, out = jax.lax.scan(body, None, qb, unroll=4)
        return out

    def fence(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0])

    def timeit(fn, iters, inner):
        fence(fn())
        start = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn()
        fence(out)
        return (time.perf_counter() - start) / (iters * inner)

    inner = 8
    qb = jnp.asarray(rng.standard_normal((inner, 8, d)).astype(np.float32))
    extra = {}

    @functools.partial(jax.jit, donate_argnums=0)
    def _fill(buf, key, start):
        chunk = jax.random.normal(key, (2 * 1_048_576, buf.shape[1]), buf.dtype)
        return jax.lax.dynamic_update_slice(buf, chunk, (start, 0))

    def make_corpus(n_: int, seed: int):
        """Chunked on-device generation: one jax.random.normal at 16M×128
        transiently needs 2× (uint32 bits + f32 output = 16 GB) and
        RESOURCE_EXHAUSTs the chip; donated 2M-row updates cap the
        transient at corpus + 2 GB."""
        buf = jnp.zeros((n_, d), jnp.float32)
        key = jax.random.PRNGKey(seed)
        for s in range(0, n_, 2 * 1_048_576):
            key, sub = jax.random.split(key)
            buf = _fill(buf, sub, jnp.int32(s))
        return buf

    def fp32_leg(m: int) -> bool:
        n_ = m * 1_048_576
        try:
            corpus = make_corpus(n_, 7)
            mul, add = topk2.prepare_aux(corpus, None, "cosine")
            t = timeit(lambda: sustained(corpus, qb, mul, add, k), 4, inner)
        except Exception as e:  # noqa: BLE001 — RESOURCE_EXHAUSTED etc.
            extra[f"fp32_{m}M"] = f"failed: {type(e).__name__}"
            return False
        extra.update(
            {
                f"rows_per_s_fp32_{m}M": round(n_ / t, 1),
                f"vs_spec_fp32_{m}M": round(n_ * d * 4 / t / roofline, 4),
                f"t_fp32_{m}M_ms": round(t * 1e3, 3),
            }
        )
        return True

    def dual_leg(m: int) -> bool:
        n_ = m * 1_048_576
        try:
            corpus = make_corpus(n_, 9)
            mul, add = topk2.prepare_aux(corpus, None, "cosine")
            v8, sv = topk2.quantize_corpus_int8(corpus)
            t8 = timeit(
                lambda: sustained(corpus, qb, mul, add, k, scan_int8=(v8, sv)),
                4, inner,
            )
            ids_f = np.asarray(sustained(corpus, qb[:2], mul, add, k)[1])
            ids_q = np.asarray(
                sustained(corpus, qb[:2], mul, add, k, scan_int8=(v8, sv))[1]
            )
        except Exception as e:  # noqa: BLE001
            extra[f"dual_{m}M"] = f"failed: {type(e).__name__}"
            return False
        extra.update(
            {
                f"rows_per_s_int8_{m}M": round(n_ / t8, 1),
                f"gbps_int8_{m}M": round(n_ * d / t8 / 1e9, 1),
                f"int8_id_agreement_{m}M": float((ids_f == ids_q).mean()),
                f"t_int8_{m}M_ms": round(t8 * 1e3, 3),
            }
        )
        return True

    # separate legs largest-first; each frees its arrays on scope exit
    for m in (16, 14, 12):
        if fp32_leg(m):
            break
    for m in (12, 10):
        if dual_leg(m):
            break
    print(json.dumps({"metric": "exp_16m_sustained", "extra": extra}))


if __name__ == "__main__":
    main()
