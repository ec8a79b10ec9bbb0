from fenix_tpu.engine import executor, session

__all__ = ["executor", "session"]
