"""Numpy reference oracles mirroring the reference's torch semantics
(/root/reference/src/fenix/io/coder/coder.py:38-65, 143-194)."""

from __future__ import annotations

import numpy as np


def normalize(x: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    norm = np.sqrt(np.sum(np.square(x), axis=-1, keepdims=True))
    return x / np.maximum(norm, eps)


def distance(u: np.ndarray, v: np.ndarray, metric: str) -> np.ndarray:
    """[Q, D] × [N, D] → [Q, N], reference coder.py:38-50 semantics."""
    if metric in {"euclidean", "l2"}:
        diff = u[:, None, :] - v[None, :, :]
        return np.sqrt(np.sum(np.square(diff), axis=-1))
    if metric == "cosine":
        return 0.5 - 0.5 * (normalize(u) @ normalize(v).T)
    if metric in {"dot", "inner_product"}:
        return -(u @ v.T)
    raise ValueError(metric)


def topk(dist: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Ascending top-k with ties broken by index (stable)."""
    order = np.argsort(dist, axis=-1, kind="stable")[:, :k]
    return np.take_along_axis(dist, order, axis=-1), order


def lloyd_step(q: np.ndarray, v: np.ndarray, metric: str) -> np.ndarray:
    """Reference coder.py:53-65: argmin assign then include-self mean."""
    if metric == "cosine":
        q = normalize(q)
        v = normalize(v)
    d = distance(v, q, metric)
    assign = np.argmin(d, axis=-1)
    out = q.copy()
    k = q.shape[0]
    for c in range(k):
        members = v[assign == c]
        if len(members):
            out[c] = (q[c] + members.sum(axis=0)) / (1 + len(members))
    if metric == "cosine":
        out = normalize(out)
    return out


def cell_scores(targets: np.ndarray, codebooks: np.ndarray, metric: str) -> np.ndarray:
    """[Q, k^n] composite cell scores, codebook 0 most significant
    (reference coder.py:171-181 cross-product order)."""
    n, k, d = codebooks.shape
    dist = distance(targets, codebooks.reshape(n * k, d), metric).reshape(-1, n, k)
    scores = dist[:, 0, :]
    for j in range(1, n):
        scores = (scores[:, :, None] + dist[:, j, None, :]).reshape(scores.shape[0], -1)
    return scores
