from fenix_tpu.parallel import mesh, search

__all__ = ["mesh", "search"]
