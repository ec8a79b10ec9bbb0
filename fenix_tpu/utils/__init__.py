from fenix_tpu.utils import metrics, profiling

__all__ = ["metrics", "profiling"]
