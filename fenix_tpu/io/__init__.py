from fenix_tpu.io import arrow, ingest, table

__all__ = ["arrow", "ingest", "table"]
