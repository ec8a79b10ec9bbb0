"""Storage + ingest layer.

Module-path parity with the reference's ``fenix.io`` namespace
(/root/reference/src/fenix/io/__init__.py:1 exports arrow, batch,
coder, index, table, torch): ``coder``/``index`` resolve lazily to the
top-level engine modules, and ``ingest`` plays the ``torch`` bridge
role (Arrow ⇄ device arrays).
"""

from fenix_tpu.io import arrow, batch, ingest, table

__all__ = ["arrow", "batch", "coder", "index", "ingest", "table"]


def __getattr__(name: str):
    # lazy: fenix_tpu.coder/index import fenix_tpu.io at module load
    if name == "coder":
        from fenix_tpu import coder

        return coder
    if name == "index":
        from fenix_tpu import index

        return index
    raise AttributeError(f"module 'fenix_tpu.io' has no attribute {name!r}")
