"""Shared helpers for the BASELINE.md config benchmarks.

Each benchmark prints one JSON line. Sizes default to the target
config; ``--scale`` shrinks them to fit a single chip / CPU run
(the driver's official number comes from /root/repo/bench.py).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def sync(x) -> None:
    """Reliable completion fence (device→host readback of a few bytes —
    block_until_ready returns early through the axon tunnel)."""
    np.asarray(x).ravel()[:1]


def timeit(fn, iters: int = 10) -> float:
    out = fn()
    sync(out[0] if isinstance(out, tuple) else out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - start) / iters


def parser(name: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=name)
    p.add_argument("--scale", type=float, default=1.0, help="size multiplier (≤1 shrinks)")
    p.add_argument("--iters", type=int, default=10)
    return p


def emit(metric: str, value: float, unit: str, **extra) -> None:
    print(
        json.dumps(
            {"metric": metric, "value": round(value, 2), "unit": unit, "extra": extra}
        )
    )


def make_corpus(n: int, d: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, d)).astype(np.float32)
