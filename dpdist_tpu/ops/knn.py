"""k-nearest-neighbor helpers (reference tf_util.pairwise_distance/knn,
utils/tf_util.py:22-55) — matmul-identity distances + top_k."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dpdist_tpu.ops.chamfer import pairwise_sqdist


def pairwise_distance(points):
    """(B, N, D) -> (B, N, N) squared distances (self pairs included)."""
    return pairwise_sqdist(points, points)


def knn(points, k: int, *, exclude_self: bool = False):
    """Indices (B, N, k) of each point's k nearest neighbors."""
    d = pairwise_distance(points)
    if exclude_self:
        n = d.shape[-1]
        d = d + jnp.eye(n, dtype=d.dtype)[None] * 1e10
    _, idx = jax.lax.top_k(-d, k)
    return idx
