from fenix_tpu.ops import cells, distance, kmeans

__all__ = ["cells", "distance", "kmeans"]
