"""2-process ``jax.distributed`` worker (launched by test_multihost.py,
and by __graft_entry__.dryrun_multichip's multi-host leg).

Each process owns a set of virtual CPU devices; together they form one
global mesh spanning a REAL process boundary — the DCN-analog
rendezvous the single-process virtual mesh cannot exercise
(SURVEY.md §4 last bullet; VERDICT r1 missing #1). Across that boundary
it runs: row-sharded exact search with the candidate-only merge,
mesh-sharded k-means training, and the all_to_all shuffle.

Replicated results (search ids/dists, trained codebooks) are written to
``<out>/proc<id>.npz`` by every process; the driver asserts they are
(a) identical across processes and (b) identical to the same
computation on its own single-process mesh — the process boundary must
not change the math. Shuffle correctness is asserted in-process on
local invariants (row conservation via psum; every received key hashes
to its owning shard).

Usage: python multihost_worker.py <coordinator> <process_id> <nproc> \
           <local_devices> <out_dir>
"""

import os
import sys


def main() -> None:
    coordinator, pid, nproc, local_dev, out_dir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), sys.argv[5]
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_dev} "
        + os.environ.get("XLA_FLAGS", "")
    )

    import numpy as np
    import jax
    import jax.numpy as jnp

    from fenix_tpu import native
    from fenix_tpu.ops import kmeans
    from fenix_tpu.parallel import distributed
    from fenix_tpu.parallel import mesh as mesh_mod
    from fenix_tpu.parallel import search as psearch
    from fenix_tpu.parallel import shuffle as pshuffle

    cfg = distributed.ClusterConfig(
        coordinator_address=coordinator, num_processes=nproc, process_id=pid
    )
    mesh = distributed.initialize(cfg)
    assert jax.process_count() == nproc, jax.process_count()
    n_dev = jax.device_count()
    assert n_dev == nproc * local_dev, (n_dev, nproc, local_dev)

    # Deterministic corpus: every process builds the same data on host
    # and feeds only ITS contiguous row range into the global array.
    N, D, Q, K = 4096, 32, 4, 10
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((N, D)).astype(np.float32)
    queries = rng.standard_normal((Q, D)).astype(np.float32)

    sharding = mesh_mod.row_sharding(mesh, 2)
    per_proc = N // nproc
    local = corpus[pid * per_proc : (pid + 1) * per_proc]
    corpus_dev = jax.make_array_from_process_local_data(sharding, local)
    mask_dev = jax.make_array_from_process_local_data(
        mesh_mod.row_sharding(mesh, 1), np.ones(per_proc, dtype=bool)
    )

    # --- sharded exact search + candidate merge over the boundary -----
    fn = psearch.build_sharded_search(mesh, k=K, metric="l2")
    dist, ids = fn(corpus_dev, jnp.asarray(queries), mask_dev)
    dist, ids = np.asarray(dist), np.asarray(ids)  # replicated outputs

    oracle = np.sqrt(((queries[:, None, :] - corpus[None, :, :]) ** 2).sum(-1))
    want = np.argsort(oracle, axis=1, kind="stable")[:, :K]
    assert (ids == want).all(), (ids, want)

    # --- mesh-sharded k-means over the boundary ------------------------
    codebooks = np.asarray(
        kmeans.train_sharded(
            mesh, corpus_dev, N, 0,
            num_codebooks=2, codebook_size=4, batch_size=256,
            num_epochs=2, metric="l2",
        )
    )
    assert np.isfinite(codebooks).all()

    # --- all_to_all shuffle over the boundary --------------------------
    keys = rng.integers(0, 1 << 20, N).astype(np.int32)
    keys_dev = jax.make_array_from_process_local_data(
        mesh_mod.row_sharding(mesh, 1), keys[pid * per_proc : (pid + 1) * per_proc]
    )
    capacity = pshuffle.estimate_capacity(keys, n_dev, N // n_dev, safety=2.0)
    sh = pshuffle.build_shuffle(mesh, capacity, (D,))
    recv_rows, recv_keys, valid, overflow = sh(corpus_dev, keys_dev)

    assert not bool(np.asarray(overflow.addressable_shards[0].data).any())
    # row conservation: psum of local valid counts is replicated
    total = int(
        np.asarray(
            jax.jit(
                jax.shard_map(
                    lambda v: jax.lax.psum(
                        v.sum(dtype=jnp.int32),
                        (mesh_mod.DATA_AXIS, mesh_mod.MODEL_AXIS),
                    ),
                    mesh=mesh,
                    in_specs=jax.sharding.PartitionSpec(
                        (mesh_mod.DATA_AXIS, mesh_mod.MODEL_AXIS)
                    ),
                    out_specs=jax.sharding.PartitionSpec(),
                )
            )(valid)
        )
    )
    assert total == N, (total, N)
    # every received key hashes to the shard that now owns it
    per_shard = valid.shape[0] // n_dev
    for kv, vv in zip(recv_keys.addressable_shards, valid.addressable_shards):
        s = kv.index[0].start // per_shard
        k_local = np.asarray(kv.data)[np.asarray(vv.data)]
        parts, _ = native.hash_partition(k_local.astype(np.int64), n_dev)
        assert (parts == s).all(), (s, set(parts.tolist()))

    # --- partitioned-attrs join+aggregate over the boundary ------------
    # (the non-star-schema analytics route: attr key ranges sharded
    # ACROSS PROCESSES, per-shard partial group tables, exact merge)
    from functools import partial as _partial

    from jax.sharding import PartitionSpec as P

    from fenix_tpu.engine import analytics as ana

    A, G = n_dev * 64, 8
    akeys = rng.integers(0, 512, A).astype(np.int32)  # heavy duplicates
    perm = np.argsort(akeys, kind="stable").astype(np.int32)
    sk = akeys[perm]
    grp_perm = (akeys % 5).astype(np.int32)[perm]
    per_shard = A // n_dev
    bounds = np.full(n_dev, np.iinfo(np.int32).min, np.int32)
    bounds[1:] = sk[np.arange(1, n_dev) * per_shard - 1]

    rs1 = mesh_mod.row_sharding(mesh, 1)
    per_proc_a = A // nproc
    sl = slice(pid * per_proc_a, (pid + 1) * per_proc_a)
    pk = jax.make_array_from_process_local_data(rs1, sk[sl])
    pi = jax.make_array_from_process_local_data(rs1, perm[sl])
    gcol = jax.make_array_from_process_local_data(rs1, grp_perm[sl])
    bnd = jax.make_array_from_process_local_data(
        rs1, bounds[pid * local_dev : (pid + 1) * local_dev]
    )
    left_keys = rng.integers(0, 600, 64).astype(np.int32)  # some miss
    left_vals = rng.standard_normal(64).astype(np.float32)
    axes = (mesh_mod.DATA_AXIS, mesh_mod.MODEL_AXIS)

    @jax.jit
    @_partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(axes), P(axes), P(axes), P(axes)),
        out_specs=P(), check_vma=False,
    )
    def parted_sum(lk, lv, pk_l, pi_l, bound_l, group_l):
        valid = jnp.ones(lk.shape, bool)
        hit, pos = ana._local_join_claim(
            lk, valid, pk_l, pi_l, bound_l, jnp.int32(A), ana._is_first_shard()
        )
        groups = jnp.take(group_l, jnp.where(hit, pos, 0)).astype(jnp.int32)
        packed = ana._pack_groups_parted(groups, lv, hit, "sum", G, False)
        return jax.lax.all_gather(packed, axes, axis=0, tiled=True)

    packed = np.asarray(
        parted_sum(jnp.asarray(left_keys), jnp.asarray(left_vals), pk, pi, bnd, gcol)
    )
    tbl = ana._merge_parted_tables(packed, n_dev, G, "sum", False)
    join_gk = np.asarray(tbl.column(ana.GROUP_COL))
    join_gv = np.asarray(tbl.column(ana.AGG_COL))

    first: dict[int, int] = {}
    for i, kk in enumerate(akeys.tolist()):
        first.setdefault(kk, i)
    want: dict[int, float] = {}
    for kk, vv in zip(left_keys.tolist(), left_vals.tolist()):
        if kk in first:
            g = kk % 5
            want[g] = want.get(g, 0.0) + float(vv)
    assert set(join_gk.tolist()) == set(want), (join_gk, want)
    for g_, v_ in zip(join_gk.tolist(), join_gv.tolist()):
        assert abs(v_ - want[g_]) < 1e-4, (g_, v_, want[g_])

    # --- ring search over the boundary (VERDICT r3 #5) -----------------
    # query blocks ppermute around the shard ring ACROSS THE PROCESS
    # boundary; each process asserts its addressable query rows against
    # the host oracle and ships them for the driver's cross-process +
    # single-process equality checks
    rng_r = np.random.default_rng(42)
    q_ring = n_dev * 2
    ring_queries = rng_r.standard_normal((q_ring, D)).astype(np.float32)
    aux_mul, aux_add = psearch.shard_aux(corpus_dev, mask_dev, "l2")
    per_proc_q = q_ring // nproc
    q_sharded = jax.make_array_from_process_local_data(
        mesh_mod.row_sharding(mesh, 2),
        ring_queries[pid * per_proc_q : (pid + 1) * per_proc_q],
    )
    ring_packed = psearch.build_ring_search(mesh, k=K, metric="l2")(
        corpus_dev, q_sharded, aux_mul, aux_add
    )
    parts = sorted(
        ring_packed.addressable_shards, key=lambda s: s.index[1].start or 0
    )
    local_packed = np.concatenate([np.asarray(s.data) for s in parts], axis=1)
    q_start = min(s.index[1].start or 0 for s in parts)
    ring_ids = local_packed[1]
    ring_dist = local_packed[0].view(np.float32)
    ring_oracle = np.sqrt(
        ((ring_queries[:, None, :] - corpus[None, :, :]) ** 2).sum(-1)
    )
    ring_want = np.argsort(ring_oracle, axis=1, kind="stable")[:, :K]
    assert (
        ring_ids == ring_want[q_start : q_start + ring_ids.shape[0]]
    ).all(), (pid, q_start)

    # --- mesh-composed STREAMING residency over the boundary (r4 #2) ---
    # the larger-than-HBM mode's mesh form (engine/residency.stream_topk
    # with a mesh up): every chunk uploads ROW-SHARDED — this process
    # feeds only ITS slice of each chunk — the sharded serving search
    # merges per-shard candidates across the process boundary, and the
    # host merges chunks by (dist, id). Must equal the exact oracle.
    from fenix_tpu.ops import topk2 as topk2_stream

    chunk = N // 4  # 4 chunks
    per_proc_c = chunk // nproc
    serving = psearch.build_serving_search(mesh, k=K, metric="l2")
    st_d, st_i = [], []
    for start in range(0, N, chunk):
        loc = corpus[start + pid * per_proc_c : start + (pid + 1) * per_proc_c]
        c_dev = jax.make_array_from_process_local_data(sharding, loc)
        m_dev = jax.make_array_from_process_local_data(
            mesh_mod.row_sharding(mesh, 1), np.ones(per_proc_c, dtype=bool)
        )
        am_c, aa_c = psearch.shard_aux(c_dev, m_dev, "l2")
        packed = np.asarray(serving(c_dev, jnp.asarray(queries), am_c, aa_c))
        d_l, i_l = topk2_stream.unpack_result(packed)
        st_d.append(d_l)
        st_i.append(np.where(i_l >= 0, i_l + start, -1))
    d_all = np.concatenate(st_d, axis=1)
    i_all = np.concatenate(st_i, axis=1)
    d_all = np.where(i_all >= 0, d_all, np.inf)
    stream_ids = np.empty((Q, K), np.int64)
    stream_dist = np.empty((Q, K), np.float32)
    for qi in range(Q):
        order = np.lexsort((i_all[qi], d_all[qi]))[:K]
        stream_ids[qi] = i_all[qi][order]
        stream_dist[qi] = d_all[qi][order]
    stream_want = np.argsort(oracle, axis=1, kind="stable")[:, :K]
    assert (stream_ids == stream_want).all(), (pid, stream_ids, stream_want)

    # --- dim-sharded search over the boundary (VERDICT r3 #5) ----------
    # D columns over MODEL (2), rows over DATA (4): the per-step psum
    # assembling exact scores crosses the process boundary
    mesh_dim = mesh_mod.make_mesh(model_parallel=2)
    from jax.sharding import NamedSharding

    from fenix_tpu.ops import topk2 as topk2_ops

    n_pad = corpus.shape[0]  # N divides the mesh blocks here
    half_rows = n_pad // nproc
    corpus_local = corpus[pid * half_rows : (pid + 1) * half_rows]
    corpus_dim = jax.make_array_from_process_local_data(
        NamedSharding(mesh_dim, P(mesh_mod.DATA_AXIS, mesh_mod.MODEL_AXIS)),
        corpus_local,
    )
    full_mask = np.ones(n_pad, bool)
    am, aa = topk2_ops.prepare_aux(jnp.asarray(corpus), jnp.asarray(full_mask), "l2")
    aux_mul_d = jax.make_array_from_process_local_data(
        NamedSharding(mesh_dim, P(mesh_mod.DATA_AXIS)),
        np.asarray(am)[pid * half_rows : (pid + 1) * half_rows],
    )
    aux_add_d = jax.make_array_from_process_local_data(
        NamedSharding(mesh_dim, P(mesh_mod.DATA_AXIS)),
        np.asarray(aa)[pid * half_rows : (pid + 1) * half_rows],
    )
    qp = np.asarray(topk2_ops.prepare_queries(jnp.asarray(queries), "l2"))
    qp_dev = jax.make_array_from_process_local_data(
        NamedSharding(mesh_dim, P(None, mesh_mod.MODEL_AXIS)), qp
    )
    q_sq = jax.make_array_from_process_local_data(
        NamedSharding(mesh_dim, P()),
        (queries.astype(np.float64) ** 2).sum(1).astype(np.float32),
    )
    dim_packed = np.asarray(
        psearch.build_dim_sharded_search(mesh_dim, k=K, metric="l2")(
            corpus_dim, qp_dev, aux_mul_d, aux_add_d, q_sq
        )
    )  # replicated output: fully addressable on every process
    dim_ids = dim_packed[1]
    dim_dist = dim_packed[0].view(np.float32)
    dim_want = np.argsort(oracle, axis=1, kind="stable")[:, :K]
    assert (dim_ids == dim_want).all(), (pid, dim_ids, dim_want)

    os.makedirs(out_dir, exist_ok=True)
    np.savez(
        os.path.join(out_dir, f"proc{pid}.npz"),
        ids=ids, dist=dist, codebooks=codebooks,
        join_gk=join_gk, join_gv=join_gv,
        ring_ids=ring_ids, ring_dist=ring_dist, ring_q_start=np.int64(q_start),
        dim_ids=dim_ids, dim_dist=dim_dist,
        stream_ids=stream_ids, stream_dist=stream_dist,
    )
    print(f"worker {pid}: OK", flush=True)


if __name__ == "__main__":
    main()
