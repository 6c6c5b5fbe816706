"""Tiled Pallas chamfer (NN-distance) kernel for large point clouds.

The XLA matmul-identity path (ops/chamfer.py) materializes the (B, N, M)
distance matrix — at N = M = 10^5 that is 40 GB per batch element and
cannot run. This kernel streams M-tiles per N-tile and keeps a running
row-minimum in VMEM, so memory is O(TN * TM) regardless of cloud size:
the TPU-native replacement for the reference's CUDA tf_nndistance at
dense-evaluation scales (SURVEY N1).

Distances use the exact per-dimension VPU formulation (the MXU's bf16
multiply is too coarse near the minimum; cf. threedmfv_pallas).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_POS = 3.4e38


def _min_kernel(a_ref, b_ref, out_ref, *, tn: int, tm: int,
                n_real: int, m_real: int):
    m_idx = pl.program_id(2)
    a = a_ref[0]                                        # (TN, 3)
    b = b_ref[0]                                        # (TM, 3)

    d2 = jnp.zeros((tn, tm), jnp.float32)
    for d in range(3):
        diff = a[:, d:d + 1] - b[:, d:d + 1].T
        d2 = d2 + diff * diff

    # mask padded b columns so they never win the min
    col = jax.lax.broadcasted_iota(jnp.int32, (tn, tm), 1) + m_idx * tm
    d2 = jnp.where(col < m_real, d2, _POS)
    tile_min = jnp.min(d2, axis=1)                      # (TN,)

    @pl.when(m_idx == 0)
    def _():
        out_ref[0, 0, 0] = tile_min

    @pl.when(m_idx > 0)
    def _():
        out_ref[0, 0, 0] = jnp.minimum(out_ref[0, 0, 0], tile_min)


def _pad_points(x, tile):
    B, N, _ = x.shape
    n_tiles = -(-N // tile)
    Np = n_tiles * tile
    if Np != N:
        x = jnp.concatenate(
            [x, jnp.zeros((B, Np - N, 3), x.dtype)], axis=1)
    return x, n_tiles


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_m", "interpret"))
def nn_min_sqdist_pallas(a, b, *, tile_n: int = 512, tile_m: int = 2048,
                         interpret: bool = False):
    """dist1[b, n] = min_m ||a[b,n] - b[b,m]||^2 without the N x M matrix."""
    B, N, _ = a.shape
    M = b.shape[1]
    tile_n = min(tile_n, max(8, -(-N // 8) * 8))
    tile_m = min(tile_m, max(128, -(-M // 128) * 128))
    a_p, nt = _pad_points(a.astype(jnp.float32), tile_n)
    b_p, mt = _pad_points(b.astype(jnp.float32), tile_m)

    kernel = functools.partial(_min_kernel, tn=tile_n, tm=tile_m,
                               n_real=N, m_real=M)
    out = pl.pallas_call(
        kernel,
        grid=(B, nt, mt),
        in_specs=[
            pl.BlockSpec((1, tile_n, 3), lambda bb, n, m: (bb, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m, 3), lambda bb, n, m: (bb, m, 0),
                         memory_space=pltpu.VMEM),
        ],
        # (B, nt, 1, TN) with a singleton third dim: Mosaic constrains the
        # LAST TWO block dims to be (8,128)-divisible or array-equal, and
        # a (1, TN) trailing block over a (1, TN) trailing array satisfies
        # it for ANY batch/tile count (a 2-D (B, nt*TN) layout breaks for
        # B > 1 — caught by bench.py's on-chip parity capture, round 3).
        out_specs=pl.BlockSpec((1, 1, 1, tile_n), lambda bb, n, m: (bb, n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nt, 1, tile_n), jnp.float32),
        interpret=interpret,
    )(a_p, b_p)
    return out.reshape(B, nt * tile_n)[:, :N]


def chamfer_distance_pallas(pc1, pc2, *, sqrt: bool = True,
                            interpret: bool = False):
    """Scalar chamfer via the streaming kernel (both directions)."""
    d1 = nn_min_sqdist_pallas(pc1, pc2, interpret=interpret)
    d2 = nn_min_sqdist_pallas(pc2, pc1, interpret=interpret)
    if sqrt:
        d1 = jnp.sqrt(jnp.maximum(d1, 1e-12))
        d2 = jnp.sqrt(jnp.maximum(d2, 1e-12))
    return (jnp.mean(d1) + jnp.mean(d2)) / 2.0
