from fenix_tpu.parallel import mesh, search, shuffle

__all__ = ["mesh", "search", "shuffle"]
