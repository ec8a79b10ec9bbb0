"""Benchmark: exact kNN scan rate on one chip (BASELINE.md config 1).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Workload: exact top-10 cosine kNN over 1M×128-dim fp32 (BASELINE.json
config 1), measured two ways on the single available chip:
- bandwidth-bound scan rate (Q=8): rows/s vs the chip's HBM roofline
  (vs_baseline = fraction of roofline; target ≥0.80 per BASELINE.md);
- throughput (Q=1024 batch): queries/s.
"""

from __future__ import annotations

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

    from fenix_tpu.ops import distance as distance_ops

    dev = jax.devices()[0]

    n, d, k = 1_000_000, 128, 10
    block = 65536
    n_pad = ((n + block - 1) // block) * block

    rng = np.random.default_rng(0)
    corpus_host = rng.standard_normal((n_pad, d)).astype(np.float32)
    corpus = jnp.asarray(corpus_host)
    mask = jnp.ones((n_pad,), dtype=bool)

    def timed(q: int, iters: int) -> float:
        queries = jnp.asarray(
            rng.standard_normal((q, d)).astype(np.float32)
        )
        # warmup (compile); sync via small host transfer — through the
        # axon tunnel block_until_ready returns before execution finishes,
        # so device→host readback of the [Q,k] result is the only
        # reliable fence (and it is tiny).
        np.asarray(
            distance_ops.topk_search(corpus, queries, mask, k=k, metric="cosine", block=block)[0]
        )
        start = time.perf_counter()
        for _ in range(iters):
            out = distance_ops.topk_search(
                corpus, queries, mask, k=k, metric="cosine", block=block
            )
        np.asarray(out[0])
        return (time.perf_counter() - start) / iters

    # bandwidth-bound scan (small query batch)
    t_scan = timed(q=8, iters=10)
    scan_rows_per_s = n_pad / t_scan
    scan_bytes_per_s = n_pad * d * 4 / t_scan
    roofline = detect_hbm_bw(dev)

    # throughput (large query batch)
    q_big = 1024
    t_batch = timed(q=q_big, iters=5)
    qps = q_big / t_batch

    result = {
        "metric": "scan_rows_per_sec_per_chip_1Mx128_cosine_top10",
        "value": round(scan_rows_per_s, 1),
        "unit": "rows/s/chip",
        "vs_baseline": round(scan_bytes_per_s / roofline, 4),
        "extra": {
            "device": str(getattr(dev, "device_kind", dev)),
            "hbm_roofline_bytes_per_s": roofline,
            "scan_gbytes_per_s": round(scan_bytes_per_s / 1e9, 2),
            "qps_batch1024": round(qps, 1),
            "scan_seconds": round(t_scan, 5),
            "batch1024_seconds": round(t_batch, 5),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
