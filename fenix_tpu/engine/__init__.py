from fenix_tpu.engine import executor, service, session

__all__ = ["executor", "service", "session"]
