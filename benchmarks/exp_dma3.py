"""Is the ~4.2 ms Pallas floor per-call, per-step, or per-byte?

exp_dma2: trivial kernels (input-only, output-only, compute+tiny-out)
all cost ~4.2 ms per dispatch at 1M rows — the real work is marginal.
Probes:

  pl_1M      — trivial in-only kernel, 1M rows (grid 512)   [anchor]
  pl_128k    — same kernel, 128k rows (grid 64): fixed vs proportional
  pl_x2      — two 1M kernels chained in ONE jit: additive or shared?
  pl_scan8   — the kernel 8× via lax.scan in one jit (amortizes dispatch)
  xla_reduce — pure-XLA bucket-max over the same 512 MB (no Pallas):
               what the non-Pallas stack streams at

    python -m benchmarks.exp_dma3
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def fence(x):
    return np.asarray(x)


def timeit(fn, *args, iters=8):
    out = fn(*args)
    fence(out[0] if isinstance(out, tuple) else out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - start) / iters


BN = 2048


def trivial(corpus):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = corpus.shape
    ni = n // BN

    def kernel(v_ref, out_ref):
        out_ref[:, :] = jnp.zeros((8, 128), jnp.float32) + v_ref[0, 0]

    return pl.pallas_call(
        kernel,
        grid=(ni,),
        in_specs=[pl.BlockSpec((BN, d), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ni * 8, 128), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=n * d, bytes_accessed=n * d * 4, transcendentals=0
        ),
    )(corpus)


@jax.jit
def pl_once(corpus):
    return jnp.max(trivial(corpus))


@jax.jit
def pl_x2(corpus):
    return jnp.max(trivial(corpus)) + jnp.min(trivial(corpus * 1.0000001))


@jax.jit
def pl_scan8(corpus):
    def body(c, _):
        return c * 1.0000001, jnp.max(trivial(c))

    _, outs = jax.lax.scan(body, corpus, None, length=8)
    return jnp.sum(outs)


@jax.jit
def xla_reduce(corpus):
    n, d = corpus.shape
    return jnp.max(corpus.reshape(n // 32, 32 * d).max(axis=1))


def main():
    dev = jax.devices()[0]
    print(f"device: {getattr(dev, 'device_kind', dev)}", flush=True)

    rng = np.random.default_rng(0)
    c1m = jnp.asarray(rng.standard_normal((1_048_576, 128)).astype(np.float32))
    c128k = jnp.asarray(rng.standard_normal((131_072, 128)).astype(np.float32))
    fence(c128k[0, 0])

    t = timeit(pl_once, c1m, iters=8)
    print(json.dumps({"variant": "pl_1M", "ms": round(t * 1e3, 3)}), flush=True)

    t = timeit(pl_once, c128k, iters=8)
    print(json.dumps({"variant": "pl_128k", "ms": round(t * 1e3, 3)}), flush=True)

    t = timeit(pl_x2, c1m, iters=8)
    print(json.dumps({"variant": "pl_x2_1M", "ms": round(t * 1e3, 3)}), flush=True)

    t = timeit(pl_scan8, c1m, iters=4)
    print(json.dumps({"variant": "pl_scan8_1M", "ms": round(t * 1e3, 3),
                      "ms_per_kernel": round(t * 1e3 / 8, 3)}), flush=True)

    t = timeit(xla_reduce, c1m, iters=8)
    print(json.dumps({"variant": "xla_reduce_1M", "ms": round(t * 1e3, 3),
                      "gb_per_s": round(1_048_576 * 128 * 4 / t / 1e9, 1)}), flush=True)


if __name__ == "__main__":
    main()
