"""Property-style randomized tests: many random shapes/configs against
the numpy oracles (beyond the fixed-shape unit tests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fenix_tpu import expr
from fenix_tpu.ops import relational as rel
from fenix_tpu.ops import topk2
from tests import oracles

METRICS = ["cosine", "dot", "l2"]


@pytest.mark.parametrize("trial", range(8))
def test_two_phase_random_configs(trial):
    rng = np.random.default_rng(100 + trial)
    n = int(rng.integers(2, 40)) * 128  # multiple of BUCKET
    d = int(rng.integers(2, 12)) * 8
    q = int(rng.integers(1, 9))
    k = int(rng.integers(1, 33))
    metric = METRICS[trial % 3]
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    mask = rng.random(n) < rng.uniform(0.05, 1.0)
    if not mask.any():
        mask[0] = True

    aux_mul, aux_add = topk2.prepare_aux(jnp.asarray(corpus), jnp.asarray(mask), metric)
    dist, ids = topk2.topk_two_phase(
        jnp.asarray(corpus), jnp.asarray(queries), aux_mul, aux_add, k=k, metric=metric
    )
    dist, ids = np.asarray(dist), np.asarray(ids)

    cand = np.flatnonzero(mask)
    want_d, want_i = oracles.topk(oracles.distance(queries, corpus[mask], metric), k)
    take = min(k, mask.sum())
    for qi in range(q):
        valid = ids[qi] >= 0
        assert valid.sum() == take, (trial, n, d, q, k, metric)
        np.testing.assert_array_equal(ids[qi][valid], cand[want_i[qi][:take]])
        np.testing.assert_allclose(
            dist[qi][valid], want_d[qi][:take], rtol=2e-4, atol=2e-5
        )


@pytest.mark.parametrize("trial", range(6))
def test_group_aggregate_random(trial):
    rng = np.random.default_rng(200 + trial)
    n = int(rng.integers(10, 2000))
    n_keys = int(rng.integers(1, 50))
    keys = rng.integers(0, n_keys, n).astype(np.int64)
    vals = rng.standard_normal(n).astype(np.float32)
    agg = ["sum", "count", "mean", "min", "max"][trial % 5]

    gk, gv, cnt = rel.group_aggregate(
        jnp.asarray(keys), jnp.asarray(vals), max_groups=64, agg=agg
    )
    gk, gv, cnt = np.asarray(gk), np.asarray(gv), int(cnt)
    uniq = np.unique(keys)
    assert cnt == len(uniq)
    np.testing.assert_array_equal(gk[:cnt], uniq)
    for i, key in enumerate(uniq):
        members = vals[keys == key]
        want = {
            "sum": members.sum(),
            "count": float(len(members)),
            "mean": members.mean(),
            "min": members.min(),
            "max": members.max(),
        }[agg]
        np.testing.assert_allclose(gv[i], want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("trial", range(6))
def test_join_inner_random(trial):
    rng = np.random.default_rng(300 + trial)
    left = rng.integers(0, 30, int(rng.integers(1, 200))).astype(np.int64)
    right = rng.integers(0, 30, int(rng.integers(1, 150))).astype(np.int64)
    cap = 4096
    li, ri, total = rel.join_inner(jnp.asarray(left), jnp.asarray(right), max_matches=cap)
    li, ri, total = np.asarray(li), np.asarray(ri), int(total)

    want = [(i, j) for i, lk in enumerate(left) for j in np.flatnonzero(right == lk)]
    assert total == len(want)
    assert list(zip(li[:total], ri[:total])) == want


@pytest.mark.parametrize("trial", range(5))
def test_expr_random_trees(trial):
    rng = np.random.default_rng(400 + trial)
    import pyarrow as pa

    n = 500
    table = pa.table(
        {
            "a": pa.array(rng.integers(0, 50, n)),
            "b": pa.array(rng.standard_normal(n)),
        }
    )

    def random_expr(depth=0):
        if depth >= 2 or rng.random() < 0.4:
            field = expr.field(["a", "b"][int(rng.integers(0, 2))])
            op = int(rng.integers(0, 4))
            if op == 0:
                return field < float(rng.standard_normal() * 10)
            if op == 1:
                return field >= float(rng.standard_normal() * 10)
            if op == 2:
                return field.isin([int(x) for x in rng.integers(0, 50, 4)])
            return ~(field == int(rng.integers(0, 50)))
        left, right = random_expr(depth + 1), random_expr(depth + 1)
        return (left & right) if rng.random() < 0.5 else (left | right)

    tree = random_expr()
    decoded = expr.Expr.from_json(tree.to_json())
    host = decoded.mask(table)
    cols = {
        "a": jnp.asarray(np.asarray(table.column("a"))),
        "b": jnp.asarray(np.asarray(table.column("b"))),
    }
    device = np.asarray(decoded.device_mask(cols))
    np.testing.assert_array_equal(host, device)
    # Arrow expression path agrees as well
    np.testing.assert_array_equal(
        np.asarray(table.filter(decoded.to_arrow()).column("a")),
        np.asarray(table.column("a"))[host],
    )
