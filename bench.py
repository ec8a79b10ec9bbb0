"""Benchmark: exact kNN scan rate on one chip (BASELINE.md config 1).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Workload: exact top-10 cosine kNN over 1M×128-dim fp32 vectors
(BASELINE.json config 1) through the engine's two-phase kernel
(fenix_tpu.ops.topk2), measured on the single available chip:

- headline: SUSTAINED scan rate (Q=8) — ``lax.scan`` over 64 distinct
  query batches inside one jit, so the fixed per-dispatch cost of this
  environment's remote-tunnel transport (~1.3 ms/call, measured in
  benchmarks/exp_sustained.py) is paid once, not 64×. This is the
  device's steady-state rate, the number the HBM-roofline target
  (≥0.80, BASELINE.md) speaks about; vs_baseline = fraction of the
  chip's spec HBM bandwidth.
- extra: the per-dispatch rate (one search per jit call, the latency-
  path number), batch-1024 QPS (per-dispatch and sustained), bf16/int8
  scan modes (exact fp32 rescore), and 8M-row rates.

Timing note: through the axon tunnel ``block_until_ready`` returns
before execution finishes; the device→host readback of the tiny [Q, k]
result is the only reliable fence.
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

# Public per-chip HBM bandwidth (bytes/s) by device generation.
HBM_BW = {
    "v5e": 819e9,
    "v5litepod": 819e9,
    "v5 lite": 819e9,
    "v5p": 2765e9,
    "v4": 1228e9,
    "v6e": 1640e9,
}


def detect_hbm_bw(device) -> float:
    kind = (getattr(device, "device_kind", "") or "").lower()
    for key, bw in HBM_BW.items():
        if key in kind:
            return bw
    return 819e9  # conservative default


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fenix_tpu.ops import topk2

    dev = jax.devices()[0]

    n, d, k_pad = 1_048_576, 128, 16  # canonical: N pow2, k→16 (top-10 padded)
    rng = np.random.default_rng(0)
    corpus = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    aux_mul, aux_add = topk2.prepare_aux(corpus, None, "cosine")

    @functools.partial(jax.jit, static_argnames=("k",))
    def sustained(corpus_, qbatches, mul, add, k, scan_int8=None):
        """One dispatch, many scans: lax.scan over [I, Q, D] batches."""

        def body(_, q):
            return None, topk2.topk_two_phase(
                corpus_, q, mul, add, k=k, metric="cosine", corpus_scan_int8=scan_int8
            )

        _, (dist, ids) = jax.lax.scan(body, None, qbatches)
        return dist, ids

    def timed_sustained(q: int, inner: int, iters: int, corpus_=corpus,
                        mul=aux_mul, add=aux_add, scan_int8=None) -> float:
        qb = jnp.asarray(rng.standard_normal((inner, q, d)).astype(np.float32))
        np.asarray(sustained(corpus_, qb, mul, add, k_pad, scan_int8)[0])  # compile
        start = time.perf_counter()
        for _ in range(iters):
            out = sustained(corpus_, qb, mul, add, k_pad, scan_int8)
        np.asarray(out[0])
        return (time.perf_counter() - start) / (iters * inner)

    def timed_dispatch(q: int, iters: int, **kw) -> float:
        queries = jnp.asarray(rng.standard_normal((q, d)).astype(np.float32))
        np.asarray(  # warmup / compile
            topk2.topk_two_phase(
                corpus, queries, aux_mul, aux_add, k=k_pad, metric="cosine", **kw
            )[0]
        )
        start = time.perf_counter()
        for _ in range(iters):
            out = topk2.topk_two_phase(
                corpus, queries, aux_mul, aux_add, k=k_pad, metric="cosine", **kw
            )
        np.asarray(out[0])
        return (time.perf_counter() - start) / iters

    # --- headline: sustained scan rate, 1M Q=8 -----------------------------
    t_scan = timed_sustained(q=8, inner=64, iters=4)
    scan_rows_per_s = n / t_scan
    scan_bytes_per_s = n * d * 4 / t_scan
    roofline = detect_hbm_bw(dev)

    t_disp = timed_dispatch(q=8, iters=20)

    # --- batch-1024 QPS: per-dispatch and sustained --------------------------
    q_big = 1024
    t_batch = timed_dispatch(q=q_big, iters=10)
    qps = q_big / t_batch
    t_batch_sus = timed_sustained(q=q_big, inner=8, iters=3)
    qps_sus = q_big / t_batch_sus

    # opt-in quantized phase-1 scans (exact fp32 rescore) — recall≈1
    corpus_bf16 = corpus.astype(jnp.bfloat16)
    v8, sv = topk2.quantize_corpus_int8(corpus)

    t_batch_bf16 = timed_dispatch(q=q_big, iters=10, corpus_scan=corpus_bf16)
    qps_bf16 = q_big / t_batch_bf16
    t_batch_int8 = timed_dispatch(q=q_big, iters=10, corpus_scan_int8=(v8, sv))
    qps_int8 = q_big / t_batch_int8
    t_scan_int8 = timed_sustained(q=8, inner=64, iters=4, scan_int8=(v8, sv))

    # --- 8M rows: sustained fp32 / int8 (generated on device: skip the
    # 4 GB upload) ------------------------------------------------------------
    n8 = 8 * 1_048_576
    corpus_8m = jax.random.normal(jax.random.PRNGKey(7), (n8, d), dtype=jnp.float32)
    am8, aa8 = topk2.prepare_aux(corpus_8m, None, "cosine")
    v8b, svb = topk2.quantize_corpus_int8(corpus_8m)

    t8m = timed_sustained(q=8, inner=8, iters=3, corpus_=corpus_8m, mul=am8, add=aa8)
    t8m_int8 = timed_sustained(
        q=8, inner=8, iters=3, corpus_=corpus_8m, mul=am8, add=aa8, scan_int8=(v8b, svb)
    )

    # --- measured stack read ceiling (self-calibration) ---------------------
    # Pure sustained HBM read: scan body reads n8 rows at an iteration-
    # dependent offset (unhoistable) and max-reduces. The spec roofline
    # (819 GB/s v5e) is not reachable through any kernel on this stack —
    # this measures what IS (benchmarks/exp_hbm_ceiling.py: 592 GB/s).
    @functools.partial(jax.jit, static_argnames=("n_read",))
    def pure_read(big, offsets, n_read):
        def body(carry, off):
            sl = jax.lax.dynamic_slice(big, (off, 0), (n_read, big.shape[1]))
            return carry + jnp.max(sl), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), offsets)
        return acc

    half = n8 // 2
    offs = jnp.asarray(rng.integers(0, half, 16).astype(np.int32))
    np.asarray(pure_read(corpus_8m, offs, half))  # compile
    start = time.perf_counter()
    for _ in range(4):
        out = pure_read(corpus_8m, offs, half)
    np.asarray(out)
    ceiling = half * d * 4 * 16 * 4 / (time.perf_counter() - start)

    result = {
        "metric": "scan_rows_per_sec_per_chip_1Mx128_cosine_top10",
        "value": round(scan_rows_per_s, 1),
        "unit": "rows/s/chip",
        "vs_baseline": round(scan_bytes_per_s / roofline, 4),
        "extra": {
            "device": str(getattr(dev, "device_kind", dev)),
            "hbm_roofline_bytes_per_s": roofline,
            "scan_gbytes_per_s": round(scan_bytes_per_s / 1e9, 2),
            "stack_read_ceiling_gbytes_per_s": round(ceiling / 1e9, 1),
            "vs_stack_ceiling": round(scan_bytes_per_s / ceiling, 4),
            "methodology": "sustained: 64 scans per dispatch (lax.scan); "
            "per_dispatch: one jit call per scan (adds ~1.3 ms fixed "
            "tunnel dispatch cost in this environment)",
            "scan_rows_per_s_per_dispatch": round(n / t_disp, 1),
            "qps_batch1024": round(qps, 1),
            "qps_batch1024_sustained": round(qps_sus, 1),
            "qps_batch1024_bf16scan": round(qps_bf16, 1),
            "qps_batch1024_int8scan": round(qps_int8, 1),
            "scan_rows_per_s_int8": round(n / t_scan_int8, 1),
            "scan_rows_per_s_8M_fp32": round(n8 / t8m, 1),
            "scan_rows_per_s_8M_int8": round(n8 / t8m_int8, 1),
            "roofline_fraction_8M_fp32": round(n8 * d * 4 / t8m / roofline, 4),
            "scan_seconds": round(t_scan, 6),
            "batch1024_seconds": round(t_batch, 5),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
