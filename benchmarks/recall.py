"""Recall@k of IVF (coder + probes) search vs exact brute force.

BASELINE metric includes "recall@10 (exact = 1.0)". Exact search is
exact by construction (tests assert id-level parity with numpy); this
harness quantifies the approximate path: recall@k as a function of
``probes`` on clustered data (the reference's test distribution,
tests/test_flight.py:22)."""

from __future__ import annotations

import tempfile

import numpy as np
import pyarrow as pa

from benchmarks import common


def main() -> None:
    p = common.parser("IVF recall@k")
    p.add_argument("--k", type=int, default=10)
    args = p.parse_args()

    from fenix_tpu import coder, index
    from fenix_tpu.io import ingest, table
    from tests import oracles

    n = int(100_000 * min(args.scale * 10, 1.0)) or 10_000
    d = 128
    rng = np.random.default_rng(0)
    # clustered corpus: 64 centers
    centers = rng.standard_normal((64, d)).astype(np.float32) * 4
    assign = rng.integers(0, 64, n)
    vecs = centers[assign] + rng.standard_normal((n, d)).astype(np.float32)

    root = tempfile.mkdtemp(prefix="fenix_recall_")
    table.make(
        root,
        "vec",
        pa.table(
            {
                "id": pa.array(np.arange(n)),
                "vector": ingest.numpy_to_fixed_size_list(vecs, pa.float32()),
            }
        ).to_reader(),
    )
    coder.make(
        root,
        "ivf",
        "vec",
        "vector",
        {
            "metric": "l2",
            "codebook_size": 8,
            "num_codebooks": 2,
            "batch_size": 1024,
            "num_epochs": 3,
        },
        seed=0,
    )
    index.make(root, "ivf", "vec", "vector")

    queries = centers[rng.integers(0, 64, 50)] + rng.standard_normal((50, d)).astype(
        np.float32
    )
    exact = oracles.distance(queries, vecs, "l2")
    _, want = oracles.topk(exact, args.k)

    recalls = {}
    for probes in (1, 4, 16, 64):
        hits = 0
        for qi in range(len(queries)):
            got = index.call(
                root,
                "ivf",
                "vec",
                "vector",
                queries[qi],
                metric="l2",
                maxval=args.k,
                probes=probes,
            )
            hits += len(set(np.asarray(got.column("id")).tolist()) & set(want[qi].tolist()))
        recalls[probes] = hits / (len(queries) * args.k)

    common.emit(
        "ivf_recall_at_k",
        recalls[16],
        f"recall@{args.k} (probes=16)",
        n=n,
        recalls={str(p): round(r, 4) for p, r in recalls.items()},
    )


if __name__ == "__main__":
    main()
