"""Patch-gather Pallas kernel: per-query k^3-neighborhood assembly
without materializing the (B, V, k^3*C) patch table.

NEGATIVE RESULT (kept as a documented appendix + selectable A/B mode,
cfg.fused_gather='on'): measured SLOWER than both the XLA table path and
the VMEM patch-table kernel at the canonical config (14.3 vs 12.6 ms full
forward at B=256) — the per-offset (TILE, V) @ (V, C=20) matmul starves
the MXU's 128-wide lanes, while table_gather_pallas.py keeps full
k^3*C-wide lanes. 'auto' never selects this kernel; see
_fused_gather_mode (models/dpdist.py) for the measured dispatch table.

The XLA path builds the patch table (extract_patches) and fetches rows
with a one-hot matmul — profiling shows the table write+read is ~4 ms of
a 12.3 ms forward at B=256 (two 1.3 GB copies). This kernel instead keeps
the raw FV volume (V x C = 40 KB per cloud) resident in VMEM and emits
each query point's patch directly:

  rows are (query, offset) pairs; row (n, o) selects voxel
  nid[n, o] = neighbor_o(vox[n]) (or -1 if off-grid / outside), built
  cheaply in XLA. The kernel one-hot-encodes a row tile against the
  voxel axis and runs ONE MXU matmul (TILE x V) @ (V x C); -1 ids match
  nothing and produce zero rows — exactly the reference's zero padding
  for out-of-range neighbors (tf.extract_volume_patches SAME).

Traffic: read fv (B x V x C) once + write (B, N, k^3*C) output — the
table never exists.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def neighbor_ids(vox, mask, grid_size: int, k: int):
    """(B, N) voxel ids -> (B, N, k^3) neighbor flat ids, -1 where the
    neighbor falls outside the grid or the query itself is off-grid.

    Flat order matches extract_patches: offsets iterate (di, dj, dl)
    row-major over axes (y-index, x-index, z-index) of the FV volume.
    """
    g = grid_size
    kh = k // 2
    iy = vox // (g * g)
    rem = vox % (g * g)
    ix = rem // g
    iz = rem % g
    offs = np.stack(np.meshgrid(np.arange(k) - kh, np.arange(k) - kh,
                                np.arange(k) - kh, indexing="ij"),
                    -1).reshape(-1, 3)                       # (k^3, [di,dj,dl])
    oy = iy[..., None] + offs[None, None, :, 0]
    ox = ix[..., None] + offs[None, None, :, 1]
    oz = iz[..., None] + offs[None, None, :, 2]
    valid = ((oy >= 0) & (oy < g) & (ox >= 0) & (ox < g)
             & (oz >= 0) & (oz < g) & (mask[..., None] > 0))
    nid = oy * (g * g) + ox * g + oz
    return jnp.where(valid, nid, -1).astype(jnp.int32)


def _kernel(nid_ref, fv_ref, out_ref, *, V: int, C: int, tile: int):
    t = pl.program_id(1)
    # nid block is the full padded row (TPU block-shape rules forbid a
    # (1, tile) int block); slice this program's tile dynamically.
    nid = nid_ref[0, 0, pl.ds(t * tile, tile)]         # (tile,) int32
    fv = fv_ref[0]                                     # (V, C)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile, V), 1)
    onehot = (cols == nid[:, None]).astype(jnp.float32)
    out_ref[0] = jnp.dot(onehot, fv, preferred_element_type=jnp.float32)


def gather_patches_fused(fv, vox, mask, *, grid_size: int, k: int,
                         interpret: bool = False):
    """(B, V, C) fv + (B, N) voxel assignment -> (B, N, k^3*C) patches.

    Drop-in replacement for extract_patches + gather_patches; rows for
    off-grid queries are zero (they get mask-zeroed downstream anyway —
    note the XLA path leaves cell-0 garbage there instead, so compare
    only after masking). Differentiable in fv: the backward pass runs the
    XLA composition's VJP (a scatter-add), so training still works; the
    fused kernel saves its table traffic on the forward.
    """
    vox = jax.lax.stop_gradient(vox)
    mask = jax.lax.stop_gradient(mask)
    if not interpret:
        from dpdist_tpu.ops.threedmfv import _on_tpu

        interpret = not _on_tpu()  # CPU fallback for tests/smoke runs

    @jax.custom_vjp
    def f(fv_):
        return _gather_fused_impl(fv_, vox, mask, grid_size=grid_size, k=k,
                                  interpret=interpret)

    def fwd(fv_):
        return _gather_fused_impl(fv_, vox, mask, grid_size=grid_size, k=k,
                                  interpret=interpret), fv_

    def bwd(fv_, g):
        _, vjp = jax.vjp(
            lambda x: _xla_reference(x, vox, mask, grid_size, k), fv_)
        return (vjp(g)[0],)

    f.defvjp(fwd, bwd)
    return f(fv)


def _xla_reference(fv, vox, mask, grid_size, k):
    from dpdist_tpu.ops.voxel import extract_patches, gather_patches

    table = extract_patches(fv, grid_size, k)
    return gather_patches(table, vox, mask) * mask[..., None]


@functools.partial(jax.jit, static_argnames=("grid_size", "k", "interpret"))
def _gather_fused_impl(fv, vox, mask, *, grid_size: int, k: int,
                       interpret: bool = False):
    B, V, C = fv.shape
    N = vox.shape[1]
    K3 = k ** 3
    nid = neighbor_ids(vox, mask, grid_size, k).reshape(B, N * K3)

    R = N * K3
    tile = 1024
    n_tiles = -(-R // tile)
    Rp = n_tiles * tile
    if Rp != R:
        nid = jnp.concatenate(
            [nid, jnp.full((B, Rp - R), -1, jnp.int32)], axis=1)
    nid = nid.reshape(B, 1, Rp)

    kernel = functools.partial(_kernel, V=V, C=C, tile=tile)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            # (B, 1, Rp): a (1, 1, Rp) block satisfies the TPU block-shape
            # rule (last two dims equal the array's), unlike (1, tile).
            pl.BlockSpec((1, 1, Rp), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Rp, C), jnp.float32),
        interpret=interpret,
    )(nid, fv.astype(jnp.float32))
    return out[:, :R].reshape(B, N, K3 * C)
