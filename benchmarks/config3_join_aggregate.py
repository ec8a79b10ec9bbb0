"""BASELINE config 3: kNN + device join to an attributes table + hash
aggregate over match groups, end-to-end through the engine."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa

from benchmarks import common


def main() -> None:
    args = common.parser("kNN + join + aggregate").parse_args()

    from fenix_tpu.engine import analytics, executor
    from fenix_tpu.io import ingest, table

    n = int(1_000_000 * min(args.scale, 10.0)) // 1024 * 1024 or 1024
    n_attrs = int(10_000_000 * min(args.scale, 1.0)) or 10_000
    d, k = 128, 128
    rng = np.random.default_rng(0)

    root = tempfile.mkdtemp(prefix="fenix_bench3_")
    vecs = common.make_corpus(n, d)
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
    attr_keys = rng.permutation(max(n_attrs, n))[:n_attrs]
    table.make(
        root,
        "attrs",
        pa.table(
            {
                "key": pa.array(attr_keys.astype(np.int64)),
                "grp": pa.array((attr_keys % 100).astype(np.int64)),
                "weight": pa.array(rng.standard_normal(n_attrs)),
            }
        ).to_reader(),
    )

    cache = executor.get_cache(root)
    target = rng.standard_normal(d).astype(np.float32)
    spec_join = analytics.JoinSpec(source="attrs", right_on="key")
    spec_agg = analytics.AggregateSpec(group_by="grp", value="weight", agg="sum", max_groups=128)

    def run():
        req = executor.SearchRequest(
            source="vec", column="vector", target=target, metric="cosine", maxval=k
        )
        return analytics.execute_search_join(cache, req, spec_join, spec_agg)

    run()  # warmup/compile
    import time

    start = time.perf_counter()
    for _ in range(args.iters):
        out = run()
    elapsed = (time.perf_counter() - start) / args.iters

    common.emit(
        "search_join_aggregate_qps",
        1.0 / elapsed,
        "queries/s",
        n_vectors=n,
        n_attrs=n_attrs,
        k=k,
        groups=out.num_rows,
        seconds=round(elapsed, 5),
    )


if __name__ == "__main__":
    main()
