"""Multi-codebook k-means (Lloyd) iteration, jit/vmap on TPU.

Semantics parity: /root/reference/src/fenix/io/coder/coder.py:53-65 —
one Lloyd step per batch: assign each sample to its nearest centroid,
then ``index_reduce(..., reduce="mean")`` with ``include_self=True``,
i.e. the new centroid is the mean of {old centroid} ∪ {assigned
samples}; cosine normalizes before and after. The reference vmaps the
step over codebooks (coder.py:95); here that is ``jax.vmap`` over the
leading codebook axis, which shards cleanly over a mesh axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from fenix_tpu.ops.distance import canonical_metric, normalize, pairwise_distance


def lloyd_step_single(
    centroids: jax.Array,  # [K, D]
    batch: jax.Array,  # [B, D]
    metric: str,
) -> jax.Array:
    """One Lloyd step for a single codebook."""
    metric = canonical_metric(metric)

    if metric == "cosine":
        centroids = normalize(centroids)
        batch = normalize(batch)

    k = centroids.shape[0]
    dist = pairwise_distance(batch, centroids, metric)  # [B, K]
    assign = jnp.argmin(dist, axis=-1)  # [B]

    # mean over {old centroid} ∪ {assigned samples}  (include_self=True)
    sums = jax.ops.segment_sum(batch, assign, num_segments=k)  # [K, D]
    counts = jax.ops.segment_sum(
        jnp.ones((batch.shape[0],), dtype=jnp.float32), assign, num_segments=k
    )  # [K]
    centroids = (centroids + sums) / (1.0 + counts[:, None])

    if metric == "cosine":
        centroids = normalize(centroids)

    return centroids


@functools.partial(jax.jit, static_argnames=("metric",), donate_argnums=(0,))
def lloyd_step(
    codebooks: jax.Array,  # [n_codebooks, K, D]
    batch: jax.Array,  # [n_codebooks, B, D]
    metric: str,
) -> jax.Array:
    """Vmapped Lloyd step over the codebook axis (coder.py:95 parity)."""
    return jax.vmap(lloyd_step_single, in_axes=(0, 0, None))(codebooks, batch, metric)


@functools.partial(
    jax.jit, static_argnames=("num_codebooks", "codebook_size", "batch_size", "num_epochs", "metric")
)
def train(
    corpus: jax.Array,  # [N, D]
    seed: jax.Array,  # scalar uint32
    num_codebooks: int,
    codebook_size: int,
    batch_size: int,
    num_epochs: int,
    metric: str,
) -> jax.Array:
    """Full multi-codebook k-means training as ONE device computation.

    Reference semantics (coder.py:94-127): random-row init, then per
    epoch a fresh permutation consumed in ``num_codebooks·batch_size``
    batches, one vmapped Lloyd step each. Runs as nested ``lax.scan``s
    so the whole training is a single dispatch — the reference pays a
    host round-trip per batch (and this environment ~1.7 ms per
    dispatch, which dominated per-step training).
    """
    n_rows, dim = corpus.shape
    key = jax.random.PRNGKey(seed)

    key, init_key = jax.random.split(key)
    init_rows = jax.random.choice(init_key, n_rows, (codebook_size * num_codebooks,), replace=False)
    codebooks = jnp.take(corpus, init_rows, axis=0).reshape(
        num_codebooks, codebook_size, dim
    )

    rows_per_step = num_codebooks * batch_size
    steps = n_rows // rows_per_step

    def epoch(carry, epoch_key):
        cbs = carry
        perm = jax.random.permutation(epoch_key, n_rows)[: steps * rows_per_step]
        idx = perm.reshape(steps, num_codebooks, batch_size)

        def step(cbs, step_idx):
            sample = jnp.take(corpus, step_idx, axis=0)  # [n, b, D]
            cbs = jax.vmap(lloyd_step_single, in_axes=(0, 0, None))(cbs, sample, metric)
            return cbs, None

        cbs, _ = jax.lax.scan(step, cbs, idx)
        return cbs, None

    epoch_keys = jax.random.split(key, num_epochs)
    codebooks, _ = jax.lax.scan(epoch, codebooks, epoch_keys)
    return codebooks


def sharded_lloyd_step(mesh: jax.sharding.Mesh, data_axis: str, model_axis: str | None, metric: str):
    """Build a pjit'd Lloyd step over a device mesh.

    Rows (the batch) shard over ``data_axis`` (data parallelism);
    codebooks optionally shard over ``model_axis`` (the tensor-parallel
    analog for this workload). Segment sums reduce over the data axis
    with an implicit ``psum`` inserted by XLA via sharding propagation.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    cb_spec = P(model_axis, None, None) if model_axis else P(None, None, None)
    batch_spec = P(model_axis, data_axis, None) if model_axis else P(None, data_axis, None)

    def step(codebooks, batch):
        return jax.vmap(lloyd_step_single, in_axes=(0, 0, None))(codebooks, batch, metric)

    return jax.jit(
        step,
        in_shardings=(NamedSharding(mesh, cb_spec), NamedSharding(mesh, batch_spec)),
        out_shardings=NamedSharding(mesh, cb_spec),
        donate_argnums=(0,),
    )
