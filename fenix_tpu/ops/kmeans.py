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
