"""Device mesh construction.

The TPU-native replacement for the reference's in-graph GPU towers
(train_multi_gpu_pc_compare_dist.py:237-302): a jax.sharding.Mesh over ICI
with a 'data' axis for batch parallelism and an optional 'points' axis —
the sequence-parallel analog — for sharding the query-point dimension of
dense evaluation (each query point is independent given the embedding,
cf. dpdist_util.py:494-511, so no cross-point communication is needed).

Multi-host runs extend the same mesh over DCN via
jax.distributed.initialize(); nothing in the train step changes.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(data: int = 1, points: int = 1, *, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = data * points
    if n > len(devices):
        raise ValueError(f"mesh {data}x{points} needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(data, points)
    return Mesh(arr, axis_names=("data", "points"))


def default_mesh() -> Mesh:
    """All available devices on the data axis."""
    return make_mesh(data=len(jax.devices()))
