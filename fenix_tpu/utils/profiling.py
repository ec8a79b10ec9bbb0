"""Profiling hooks: jax.profiler traces + named annotations.

SURVEY.md §5 tracing plan: the reference's only instrumentation is a
tqdm bar (coder.py:111); here every engine stage can be annotated and
whole requests traced to a Perfetto-compatible dump directory.
"""

from __future__ import annotations

import contextlib
import os
import threading
from typing import Iterator

import jax

TRACE_DIR_ENV = "FENIX_TRACE_DIR"

# one trace at a time: the Flight server wraps every request handler in
# trace(), and handlers run on a thread pool — a second start_trace
# while one is active raises. Non-blocking: concurrent requests during
# an active capture simply run untraced (their device work still lands
# in the active trace's timeline).
_TRACE_LOCK = threading.Lock()


@contextlib.contextmanager
def trace(log_dir: str | None = None) -> Iterator[None]:
    """Capture a device trace for the enclosed block.

    Enabled when a directory is given or $FENIX_TRACE_DIR is set;
    otherwise a no-op, so call sites can wrap hot paths unconditionally.
    View with Perfetto / tensorboard-profile.
    """
    log_dir = log_dir or os.environ.get(TRACE_DIR_ENV)
    if not log_dir:
        yield
        return
    if not _TRACE_LOCK.acquire(blocking=False):
        yield
        return
    try:
        jax.profiler.start_trace(log_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()
    finally:
        _TRACE_LOCK.release()


def annotate(name: str):
    """Named span visible in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)
