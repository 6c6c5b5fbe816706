"""Dense point-to-surface evaluation with query-point-axis sharding.

The sequence-parallel analog for this model family (SURVEY §2.5): every
query point is evaluated independently against the (small) surface
embedding (dpdist_util.py:494-511), so scaling to 1e5-1e6 query points is
an embarrassingly-parallel shard of the point axis over the 'points' mesh
axis — the embedding is replicated, the decoder runs on local shards, no
cross-point communication is needed.

Use cases: dense distance-field extraction (marching-cubes style surface
reconstruction from a trained DPDist), GT-quality evaluation sweeps, and
the dense eval densities of the offline generator (10^4-10^6 points,
dataset_sample_with_gt.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dpdist_tpu.configs import DPDistConfig
from dpdist_tpu.models.dpdist import dpdist_embed, _decoder_inputs, _conv3d_decode, _output_activation
from dpdist_tpu.nn.layers import mlp_apply


def _decode_queries(params, state, cfg: DPDistConfig, queries, table):
    """One-directional decode: distances of `queries` to the encoded surface."""
    x, mask = _decoder_inputs(cfg, queries, table)
    if cfg.conv_version == 3 and cfg.k > 0:
        y = _conv3d_decode(params["decoder"], cfg, x)
    else:
        y, _ = mlp_apply(params["decoder"], state.get("decoder", {}), x,
                         train=False)
    y = _output_activation(y.astype(jnp.float32), cfg.output_act)
    d = y[..., 0]
    if cfg.k > 0:
        d = d * mask
    return d


def dense_point_to_surface(params, state, cfg: DPDistConfig, cloud, queries,
                           *, mesh: Optional[Mesh] = None):
    """Distances of (B, N, 3) query points to surface(cloud), N-sharded.

    Args:
      cloud: (B, M, 3) the surface sample to encode (replicated work: the
        encoder output is only (B, V, k^3*C)).
      queries: (B, N, 3); with a mesh, N must divide by mesh.shape['points'].

    Returns:
      (B, N) float32 learned distances (channel 0, mask-zeroed).
    """
    table, _ = dpdist_embed(params, state, cfg, cloud, train=False)

    if mesh is None or mesh.shape.get("points", 1) == 1:
        return _decode_queries(params, state, cfg, queries, table)

    npoints = mesh.shape["points"]
    assert queries.shape[1] % npoints == 0, (
        f"query axis {queries.shape[1]} not divisible by points={npoints}"
    )

    def local(params, state, table, q_shard):
        return _decode_queries(params, state, cfg, q_shard, table)

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(None, "points", None)),
        out_specs=P(None, "points"),
        check_vma=False,
    )
    queries = jax.device_put(queries, NamedSharding(mesh, P(None, "points", None)))
    return sharded(params, state, table, queries)
