"""Partitioned-attribute joins: the dimension side sharded over the
mesh (sorted contiguous key ranges, session.parted_key) must return
the same answers as the replicated star-schema path — for every
aggregate, with duplicate keys straddling shard boundaries, and for
enrichment. Closes the "distributed analytics assume star schemas"
limit (docs/DESIGN.md Known limits)."""

import numpy as np
import pyarrow as pa
import pytest

from fenix_tpu.engine import analytics, executor, session
from fenix_tpu.io import ingest, table
from fenix_tpu.utils.metrics import GLOBAL as METRICS

# grp has 11 distinct values — the overflow test relies on 11 > 4

ROWS, DIM, ATTRS = 2_000, 16, 5_000
BLOCK = 128  # shard_block = 1024 on the 8-device mesh → attrs span 5 shards


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    rng = np.random.default_rng(3)
    root = str(tmp_path_factory.mktemp("parted_root"))
    vecs = rng.standard_normal((ROWS, DIM)).astype(np.float32)
    table.make(
        root,
        "vec",
        pa.table(
            {
                "id": pa.array(np.arange(ROWS)),
                "vector": ingest.numpy_to_fixed_size_list(vecs, pa.float32()),
            }
        ).to_reader(),
    )
    # duplicate keys everywhere (5000 rows over 1500 distinct values) so
    # runs straddle the 1024-row shard ranges; first-match semantics must
    # still pick the globally smallest attr row per key
    keys = rng.integers(0, 1500, ATTRS)
    table.make(
        root,
        "attrs",
        pa.table(
            {
                "key": pa.array(keys.astype(np.int64)),
                "grp": pa.array((keys % 11).astype(np.int64)),
                "weight": pa.array(
                    rng.standard_normal(ATTRS).astype(np.float64) * 10.0
                ),
                # big enough that f32 sums would round (> 2^24), each
                # value inside int32
                "wint": pa.array((5_000_000 + keys).astype(np.int64)),
            }
        ).to_reader(),
    )
    return root


@pytest.fixture(scope="module")
def cache(root):
    return session.DeviceCache(root, block=BLOCK)


def request(k=200):
    rng = np.random.default_rng(7)
    return executor.SearchRequest(
        source="vec",
        column="vector",
        target=rng.standard_normal(DIM).astype(np.float32),
        metric="l2",
        maxval=k,
    )


def _run(cache, partitioned, aggregate=None, **join_kw):
    join = analytics.JoinSpec(
        source="attrs", right_on="key", partitioned=partitioned, **join_kw
    )
    return analytics.execute_search_join(cache, request(), join, aggregate)


def _as_dict(t: pa.Table) -> dict:
    return dict(
        zip(
            np.asarray(t.column(analytics.GROUP_COL)).tolist(),
            np.asarray(t.column(analytics.AGG_COL)).tolist(),
        )
    )


@pytest.mark.parametrize("agg", ["count", "sum", "mean", "min", "max"])
def test_aggregate_matches_replicated_float(cache, agg):
    spec = analytics.AggregateSpec(group_by="grp", value="weight", agg=agg)
    rep = _as_dict(_run(cache, False, spec))
    part = _as_dict(_run(cache, True, spec))
    assert set(rep) == set(part)
    for k in rep:
        assert part[k] == pytest.approx(rep[k], rel=1e-5, abs=1e-5)


@pytest.mark.parametrize("agg", ["count", "sum", "mean", "min", "max"])
def test_aggregate_matches_replicated_int(cache, agg):
    spec = analytics.AggregateSpec(group_by="grp", value="wint", agg=agg)
    rep = _as_dict(_run(cache, False, spec))
    part = _as_dict(_run(cache, True, spec))
    assert set(rep) == set(part)
    for k in rep:
        if agg == "mean":
            assert part[k] == pytest.approx(rep[k], rel=1e-12)
        else:
            assert part[k] == rep[k]  # exact int64


def test_int_sum_is_exact_past_f32(cache):
    """The merged partitioned int sum must match a float64 host oracle
    exactly — limb lanes recombine across shards without rounding."""
    spec = analytics.AggregateSpec(group_by="grp", value="wint", agg="sum")
    part = _as_dict(_run(cache, True, spec))
    assert any(v > (1 << 24) for v in part.values())
    assert all(float(v).is_integer() for v in part.values())


def test_count_and_dist_value(cache):
    for spec in (
        analytics.AggregateSpec(group_by="grp", agg="count"),
        analytics.AggregateSpec(group_by="grp", value=executor.DIST_COL, agg="sum"),
    ):
        rep = _as_dict(_run(cache, False, spec))
        part = _as_dict(_run(cache, True, spec))
        assert set(rep) == set(part)
        for k in rep:
            assert part[k] == pytest.approx(rep[k], rel=1e-5, abs=1e-5)


def test_enrichment_matches_replicated(cache):
    rep = _run(cache, False)
    part = _run(cache, True)
    assert rep.column_names == part.column_names
    for name in rep.column_names:
        a, b = rep.column(name).to_pylist(), part.column(name).to_pylist()
        assert a == b, name


def test_first_match_semantics(cache, root):
    """Duplicate keys: the joined weight must come from the globally
    FIRST attr row of each key, even when the claiming shard boundary
    splits the run."""
    part = _run(cache, True)
    attrs = table.load(root, "attrs")
    keys = np.asarray(attrs.column("key"))
    weights = np.asarray(attrs.column("weight"))
    first = {}
    for i, k in enumerate(keys.tolist()):
        first.setdefault(k, weights[i])
    ids = np.asarray(part.column("id"))
    got = part.column("weight").to_pylist()
    for i, w in zip(ids.tolist(), got):
        want = first.get(i)
        if want is None:
            assert w is None
        else:
            assert w == want


def test_int32_min_key_claimed(tmp_path_factory):
    """INT32_MIN is a legal key (the range guard admits ≥ −2^31); the
    first shard must claim it on the bare local match — a strict
    'key > previous boundary' test can never be true against an int32
    sentinel."""
    rng = np.random.default_rng(5)
    root = str(tmp_path_factory.mktemp("minkey_root"))
    lo = np.iinfo(np.int32).min
    n = 256
    jkeys = np.arange(n).astype(np.int64)
    jkeys[7] = lo  # the row a nearby query will win
    table.make(
        root,
        "vec",
        pa.table(
            {
                "id": pa.array(np.arange(n)),
                "jkey": pa.array(jkeys),
                "vector": ingest.numpy_to_fixed_size_list(
                    rng.standard_normal((n, DIM)).astype(np.float32), pa.float32()
                ),
            }
        ).to_reader(),
    )
    akeys = np.concatenate([[lo], np.arange(0, 200)]).astype(np.int64)
    table.make(
        root,
        "attrs",
        pa.table(
            {
                "key": pa.array(akeys),
                "grp": pa.array((np.abs(akeys) % 5).astype(np.int64)),
                "weight": pa.array(np.arange(len(akeys)).astype(np.float64)),
            }
        ).to_reader(),
    )
    cache = session.DeviceCache(root, block=BLOCK)
    req = executor.SearchRequest(
        source="vec", column="vector",
        target=np.asarray(
            ingest.fixed_size_list_to_numpy(table.load(root, "vec").column("vector"))
        )[7],
        metric="l2", maxval=4,
    )
    for partitioned in (False, True):
        out = analytics.execute_search_join(
            cache, req,
            analytics.JoinSpec(
                source="attrs", right_on="key", left_on="jkey",
                partitioned=partitioned,
            ),
        )
        row = {i: w for i, w in zip(out.column("id").to_pylist(),
                                    out.column("weight").to_pylist())}
        assert row[7] == 0.0, f"partitioned={partitioned}: INT32_MIN key lost"


def test_group_overflow_raises_actionably(cache):
    """More distinct groups than max_groups must raise the same
    actionable ValueError as the replicated path, not an IndexError."""
    spec = analytics.AggregateSpec(group_by="grp", agg="count", max_groups=4)
    with pytest.raises(ValueError, match="max_groups"):
        _run(cache, True, spec)
    with pytest.raises(ValueError, match="max_groups"):
        _run(cache, False, spec)


def test_two_step_route_partitioned(cache):
    """coded/bf16/int8 searches take the two-step join (search first,
    then the join probe); the partitioned attrs must give the same
    answers there too."""
    rng = np.random.default_rng(11)
    req = executor.SearchRequest(
        source="vec", column="vector",
        target=rng.standard_normal(DIM).astype(np.float32),
        metric="l2", maxval=150, precision="int8",
    )
    for aggregate in (
        None,
        analytics.AggregateSpec(group_by="grp", agg="count"),
        analytics.AggregateSpec(group_by="grp", value="weight", agg="sum"),
        analytics.AggregateSpec(group_by="grp", value="wint", agg="sum"),
        analytics.AggregateSpec(
            group_by="grp", value=executor.DIST_COL, agg="mean"
        ),
    ):
        rep = analytics.execute_search_join(
            cache, req,
            analytics.JoinSpec(source="attrs", right_on="key", partitioned=False),
            aggregate,
        )
        part = analytics.execute_search_join(
            cache, req,
            analytics.JoinSpec(source="attrs", right_on="key", partitioned=True),
            aggregate,
        )
        if aggregate is None:
            assert rep.column_names == part.column_names
            for name in rep.column_names:
                assert rep.column(name).to_pylist() == part.column(name).to_pylist()
        else:
            dr, dp = _as_dict(rep), _as_dict(part)
            assert set(dr) == set(dp)
            for k in dr:
                assert dp[k] == pytest.approx(dr[k], rel=1e-5, abs=1e-5)


def test_inner_join_partitioned(cache):
    """General inner joins (result rows duplicate per matching attr
    row) must produce identical expanded tables and pair aggregates on
    the partitioned route — including duplicate runs straddling shard
    boundaries and the max_matches overflow contract."""
    rng = np.random.default_rng(13)
    req = executor.SearchRequest(
        source="vec", column="vector",
        target=rng.standard_normal(DIM).astype(np.float32),
        metric="l2", maxval=40,
    )

    def run(partitioned, aggregate=None, max_matches=4096):
        return analytics.execute_search_join(
            cache, req,
            analytics.JoinSpec(
                source="attrs", right_on="key", how="inner",
                partitioned=partitioned, max_matches=max_matches,
            ),
            aggregate,
        )

    rep, part = run(False), run(True)
    assert rep.column_names == part.column_names
    assert rep.num_rows == part.num_rows and rep.num_rows > 40  # expansion
    for name in rep.column_names:
        assert rep.column(name).to_pylist() == part.column(name).to_pylist(), name

    for spec in (
        analytics.AggregateSpec(group_by="grp", agg="count"),
        analytics.AggregateSpec(group_by="grp", value="wint", agg="sum"),
        analytics.AggregateSpec(group_by="grp", value="weight", agg="mean"),
        analytics.AggregateSpec(group_by="grp", value=executor.DIST_COL, agg="min"),
    ):
        dr, dp = _as_dict(run(False, spec)), _as_dict(run(True, spec))
        assert set(dr) == set(dp)
        for k in dr:
            assert dp[k] == pytest.approx(dr[k], rel=1e-5, abs=1e-5), spec.agg

    with pytest.raises(ValueError, match="max_matches"):
        run(True, max_matches=8)
    with pytest.raises(ValueError, match="max_matches"):
        run(False, max_matches=8)


def test_empty_search_result_joins(cache):
    """A search whose filter matches nothing must join/aggregate to an
    EMPTY table on every two-step route, not crash on zero-length
    device shapes."""
    from fenix_tpu import expr

    rng = np.random.default_rng(21)
    req = executor.SearchRequest(
        source="vec", column="vector",
        target=rng.standard_normal(DIM).astype(np.float32),
        metric="l2", maxval=10, precision="int8",
        filter=expr.field("id") < 0,  # matches nothing
    )
    for partitioned in (False, True):
        join = analytics.JoinSpec(
            source="attrs", right_on="key", partitioned=partitioned
        )
        out = analytics.execute_search_join(cache, req, join, None)
        assert out.num_rows == 0
        for spec in (
            analytics.AggregateSpec(group_by="grp", agg="count"),
            analytics.AggregateSpec(group_by="grp", value="weight", agg="sum"),
            analytics.AggregateSpec(
                group_by="grp", value=executor.DIST_COL, agg="mean"
            ),
        ):
            out = analytics.execute_search_join(cache, req, join, spec)
            assert out.num_rows == 0, (partitioned, spec.agg)


def test_inner_join_int32_max_key(tmp_path_factory):
    """INT32_MAX is a legal key but also the padding sentinel: the
    partitioned inner join must not count the padding tail as matches
    (it previously inflated `total` past max_matches)."""
    rng = np.random.default_rng(17)
    root = str(tmp_path_factory.mktemp("maxkey_root"))
    hi = np.iinfo(np.int32).max
    n = 128
    jkeys = np.arange(n).astype(np.int64)
    jkeys[5] = hi
    table.make(
        root,
        "vec",
        pa.table(
            {
                "id": pa.array(np.arange(n)),
                "jkey": pa.array(jkeys),
                "vector": ingest.numpy_to_fixed_size_list(
                    rng.standard_normal((n, DIM)).astype(np.float32), pa.float32()
                ),
            }
        ).to_reader(),
    )
    akeys = np.concatenate([[hi, hi], np.arange(0, 99)]).astype(np.int64)
    table.make(
        root,
        "attrs",
        pa.table(
            {
                "key": pa.array(akeys),
                "weight": pa.array(np.arange(len(akeys)).astype(np.float64)),
            }
        ).to_reader(),
    )
    cache = session.DeviceCache(root, block=BLOCK)
    req = executor.SearchRequest(
        source="vec", column="vector",
        target=np.asarray(
            ingest.fixed_size_list_to_numpy(table.load(root, "vec").column("vector"))
        )[5],
        metric="l2", maxval=4,
    )
    outs = {}
    for partitioned in (False, True):
        out = analytics.execute_search_join(
            cache, req,
            analytics.JoinSpec(
                source="attrs", right_on="key", left_on="jkey", how="inner",
                # tight bound: counting even a few padding slots as
                # matches would trip it on either route
                partitioned=partitioned, max_matches=16,
            ),
        )
        outs[partitioned] = out
    assert outs[False].to_pylist() == outs[True].to_pylist()
    # the INT32_MAX probe row expanded to exactly its two real matches
    ids = outs[True].column("id").to_pylist()
    assert ids.count(5) == 2


def test_concurrent_attr_mutations_and_parted_joins(tmp_path, rng):
    """Writers mutate the ATTRIBUTE table while partitioned joins serve:
    every query must see a coherent revision (read_stable + per-entry
    stamps), never a torn pairing of old keys with new group columns."""
    import concurrent.futures

    root = str(tmp_path)
    n = 1024
    vecs = rng.standard_normal((n, DIM)).astype(np.float32)
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
    # grp == key % 7 ALWAYS: any coherent revision satisfies the
    # invariant; a torn read pairs keys with a foreign grp column
    keys0 = rng.integers(0, n, 2000)
    table.make(
        root,
        "attrs",
        pa.table(
            {
                "key": pa.array(keys0.astype(np.int64)),
                "grp": pa.array((keys0 % 7).astype(np.int64)),
            }
        ).to_reader(),
    )
    cache = session.DeviceCache(root, block=64)
    errors: list[Exception] = []

    def writer(i: int) -> None:
        try:
            keys = rng.integers(0, n, 2000 + i * 16)
            table.rewrite(
                root,
                "attrs",
                pa.table(
                    {
                        "key": pa.array(keys.astype(np.int64)),
                        "grp": pa.array((keys % 7).astype(np.int64)),
                    }
                ).to_reader(),
            )
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def reader(q: np.ndarray) -> None:
        try:
            out = analytics.execute_search_join(
                cache,
                executor.SearchRequest(
                    source="vec", column="vector", target=q,
                    metric="l2", maxval=64,
                ),
                analytics.JoinSpec(source="attrs", right_on="key", partitioned=True),
            )
            ids = np.asarray(out.column("id"))
            grp = out.column("grp").to_pylist()
            for i, g in zip(ids.tolist(), grp):
                if g is not None:
                    assert g == i % 7, (i, g)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    queries = rng.standard_normal((16, DIM)).astype(np.float32)
    with concurrent.futures.ThreadPoolExecutor(10) as pool:
        futs = [pool.submit(writer, i) for i in range(6)]
        futs += [pool.submit(reader, q) for q in queries]
        [f.result() for f in futs]
    assert not errors, errors[:3]


def test_route_counter_and_auto_threshold(cache, monkeypatch):
    spec = analytics.AggregateSpec(group_by="grp", agg="count")
    before = METRICS.snapshot().get("join.partitioned", 0)
    _run(cache, True, spec)
    assert METRICS.snapshot().get("join.partitioned", 0) == before + 1

    # auto routing: threshold below the table size engages partitioning
    monkeypatch.setenv("FENIX_PART_ATTRS_MIN", "1")
    _run(cache, None, spec)
    assert METRICS.snapshot().get("join.partitioned", 0) == before + 2

    monkeypatch.setenv("FENIX_PART_ATTRS_MIN", str(1 << 30))
    _run(cache, None, spec)
    assert METRICS.snapshot().get("join.partitioned", 0) == before + 2
