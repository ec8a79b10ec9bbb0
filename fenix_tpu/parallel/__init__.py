from fenix_tpu.parallel import distributed, mesh, search, shuffle

__all__ = ["distributed", "mesh", "search", "shuffle"]
