from fenix_tpu.io import arrow, batch, ingest, table

__all__ = ["arrow", "batch", "ingest", "table"]
