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


def _decode_queries_pretransformed(params, state, cfg: DPDistConfig, queries,
                                   table_w1, w1_delta, b1):
    """First decoder layer with the embedding half folded into the table.

    relu(concat(delta, emb) @ W1 + b) == relu(delta @ W1d + emb @ W1e + b),
    and emb @ W1e == onehot @ (table @ W1e) — so for N >> V it is ~8x
    cheaper (2503 -> 1024-wide rows) to pre-transform the V-row table once
    than to transform every gathered query row.
    """
    from dpdist_tpu.ops.voxel import voxel_assign, gather_patches

    vox, mask, delta = voxel_assign(queries, cfg.grid_size)
    h = gather_patches(table_w1, vox, mask)            # (B, N, mlp[0])
    h = jax.nn.relu(h + jnp.matmul(delta, w1_delta) + b1)
    layers = params["decoder"]["layers"]
    for lp in layers[1:-1]:
        h = jax.nn.relu(jnp.matmul(h, lp["w"]) + lp["b"])
    y = jnp.matmul(h, layers[-1]["w"]) + layers[-1]["b"]
    y = _output_activation(y.astype(jnp.float32), cfg.output_act)
    return y[..., 0] * mask


def distance_field(params, state, cfg: DPDistConfig, cloud, *,
                   resolution: int = 64, extent: float = 1.0,
                   mesh: Optional[Mesh] = None):
    """Evaluate the learned distance on a dense regular grid.

    Returns (B, R, R, R) distances — the implicit field for level-set /
    marching-cubes surface extraction from a trained DPDist. R^3 query
    points shard over the 'points' mesh axis when a mesh is given.
    """
    import numpy as np

    r = np.linspace(-extent, extent, resolution).astype(np.float32)
    X, Y, Z = np.meshgrid(r, r, r, indexing="ij")
    q = jnp.asarray(np.stack([X, Y, Z], -1).reshape(1, -1, 3))
    B = cloud.shape[0]
    q = jnp.broadcast_to(q, (B, q.shape[1], 3))
    d = dense_point_to_surface(params, state, cfg, cloud, q, mesh=mesh)
    return d.reshape(B, resolution, resolution, resolution)


def dense_point_to_surface(params, state, cfg: DPDistConfig, cloud, queries,
                           *, mesh: Optional[Mesh] = None,
                           pretransform: str = "auto"):
    """Distances of (B, N, 3) query points to surface(cloud), N-sharded.

    Args:
      cloud: (B, M, 3) the surface sample to encode (replicated work: the
        encoder output is only (B, V, k^3*C)).
      queries: (B, N, 3); with a mesh, N must divide by mesh.shape['points'].
      pretransform: "auto" | "on" | "off" — fold the first decoder layer
        into the patch table when the query count dwarfs the voxel count
        (conv_version 1, BN off only).

    Returns:
      (B, N) float32 learned distances (channel 0, mask-zeroed).
    """
    table, _ = dpdist_embed(params, state, cfg, cloud, train=False)

    can_pre = (cfg.k > 0 and cfg.conv_version != 3 and not cfg.use_bn)
    use_pre = can_pre and (
        pretransform == "on"
        or (pretransform == "auto" and queries.shape[1] >= 4 * cfg.embedding_size)
    )
    if use_pre:
        w1 = params["decoder"]["layers"][0]["w"]       # (D+E, mlp[0])
        w1_delta = w1[: cfg.dims]
        w1_emb = w1[cfg.dims:]
        b1 = params["decoder"]["layers"][0]["b"]
        table_w1 = jnp.einsum("bve,eh->bvh", table, w1_emb)

        if mesh is None or mesh.shape.get("points", 1) == 1:
            return _decode_queries_pretransformed(
                params, state, cfg, queries, table_w1, w1_delta, b1)

        npoints = mesh.shape["points"]
        assert queries.shape[1] % npoints == 0

        def local_pre(params, table_w1, w1_delta, b1, q_shard):
            return _decode_queries_pretransformed(
                params, state, cfg, q_shard, table_w1, w1_delta, b1)

        sharded = jax.shard_map(
            local_pre, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(None, "points", None)),
            out_specs=P(None, "points"), check_vma=False,
        )
        queries = jax.device_put(
            queries, NamedSharding(mesh, P(None, "points", None)))
        return sharded(params, table_w1, w1_delta, b1, queries)

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
