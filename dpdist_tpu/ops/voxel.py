"""Voxel-grid operations for the DPDist implicit decoder.

Reference behavior being reproduced (all in utils/dpdist_util.py):
  * get_grid_centers (:982-992): cell centers l = arange(-1,1,2/g)+1/g on a
    meshgrid; flat center v = iy*g^2 + ix*g + iz has coords
    (l[ix], l[iy], l[iz]).
  * get_pc_grid_binary_mask_from_centers (:459-492): per-point binary
    membership over all V cells (lower bound strict, upper inclusive),
    argmax picks the containing cell, and points outside [-1,1]^3 get an
    all-zero mask (argmax then returns cell 0; the decoder output is
    multiplied by the mask so those points contribute 0).
  * local_z_3d (:911-960): tf.extract_volume_patches with a k^3 SAME-padded
    window; each voxel's patch is flattened offset-major, channel-last.
  * get_emb_and_concat (:434-457): triple gather_nd to fetch each query
    point's voxel patch, center-relative coordinates, and mask bit.

TPU-first redesign: membership is computed arithmetically per axis
(ix = ceil((x+1)/step) - 1 — no N x V mask, no argmax), and the patch fetch
is a one-hot matmul against the patch table, which runs on the MXU and
reproduces the reference's gather + tie-breaking semantics exactly.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def grid_centers(num_voxels: int, dims: int = 3) -> np.ndarray:
    """(V, D) cell centers in the reference's flat (meshgrid) order."""
    if dims == 2:
        g = int(np.floor(np.sqrt(num_voxels)))
        step = 2.0 / g
        l = np.arange(-1, 1, step) + step / 2
        X, Y = np.meshgrid(l, l)
        return np.stack([X, Y], -1).reshape(-1, 2).astype(np.float32)
    g = int(np.ceil(num_voxels ** (1.0 / 3.0)))
    step = 2.0 / g
    l = np.arange(-1, 1, step) + step / 2
    X, Y, Z = np.meshgrid(l, l, l)
    return np.stack([X, Y, Z], -1).reshape(-1, 3).astype(np.float32)


def voxel_assign(points, grid_size: int):
    """Assign each point to its containing grid cell.

    Cell i along an axis covers the half-open interval (lo_i, hi_i] with
    lo_i = -1 + i*step — identical to the reference's strict-lower /
    inclusive-upper mask (dpdist_util.py:478-488).

    Args:
      points: (..., N, D) coordinates.
      grid_size: g cells per axis over [-1, 1].

    Returns:
      vox:   (..., N) int32 flat cell index in meshgrid order
             (iy*g^2 + ix*g + iz for 3D), clamped to valid range.
      mask:  (..., N) float32 1.0 if the point lies inside the grid.
      delta: (..., N, D) point minus its (clamped) cell center.
    """
    g = grid_size
    D = points.shape[-1]
    step = 2.0 / g
    u = (points + 1.0) / step                       # cell i covers (i, i+1]
    idx = jnp.ceil(u).astype(jnp.int32) - 1         # (..., N, D)
    inside = jnp.all((u > 0.0) & (idx <= g - 1), axis=-1)
    idx = jnp.clip(idx, 0, g - 1)
    if D == 2:
        # meshgrid(l, l): flat v = iy*g + ix
        vox = idx[..., 1] * g + idx[..., 0]
    else:
        vox = idx[..., 1] * (g * g) + idx[..., 0] * g + idx[..., 2]
    mask = inside.astype(points.dtype)
    # Outside points behave like the reference: argmax of the all-zero mask
    # is cell 0, so delta is taken w.r.t. cell 0's center.
    vox = jnp.where(inside, vox, 0)
    centers = jnp.asarray(grid_centers(g ** D, D), dtype=points.dtype)
    delta = points - centers[vox]
    return vox, mask, delta


def extract_patches(volume_features, grid_size: int, k: int):
    """k^3 neighborhood patches around every cell, SAME (zero) padding.

    Args:
      volume_features: (B, V, C) per-cell features, V = g^3, flat order as
        produced by threedmfv (v = i*g^2 + j*g + l after the (B,V,C) ->
        (B,g,g,g,C) reshape, exactly like the reference's local_z_3d).
      grid_size: g.
      k: window size (odd).

    Returns:
      (B, V, k^3 * C) patches, flattened offset-major then channel —
      tf.extract_volume_patches ordering (dpdist_util.py:922-930).
    """
    B, V, C = volume_features.shape
    g = grid_size
    assert V == g ** 3, (V, g)
    kh = k // 2
    vol = volume_features.reshape(B, g, g, g, C)
    padded = jnp.pad(vol, ((0, 0), (kh, kh), (kh, kh), (kh, kh), (0, 0)))
    # Static k^3 shifted slices; XLA fuses these into one gather-free copy.
    slices = []
    for di in range(k):
        for dj in range(k):
            for dl in range(k):
                slices.append(padded[:, di:di + g, dj:dj + g, dl:dl + g, :])
    patches = jnp.stack(slices, axis=4)               # (B, g, g, g, k^3, C)
    return patches.reshape(B, V, k * k * k * C)


def extract_patches_2d(volume_features, grid_size: int, k: int):
    """2-D analog of extract_patches: k^2 neighborhoods, SAME padding.

    The reference's local_z_2d (dpdist_util.py:856-910) uses VALID padding
    (interior cells only); we use SAME like the 3-D path so every cell has
    a patch and the voxel-index spaces match — the 3-D path is the
    canonical one, and the reference's 2-D/3-D padding inconsistency is
    not worth reproducing.
    """
    B, V, C = volume_features.shape
    g = grid_size
    assert V == g ** 2, (V, g)
    kh = k // 2
    vol = volume_features.reshape(B, g, g, C)
    padded = jnp.pad(vol, ((0, 0), (kh, kh), (kh, kh), (0, 0)))
    slices = []
    for di in range(k):
        for dj in range(k):
            slices.append(padded[:, di:di + g, dj:dj + g, :])
    patches = jnp.stack(slices, axis=3)               # (B, g, g, k^2, C)
    return patches.reshape(B, V, k * k * C)


def point_cloud_to_volume(points, vsize: int = 12, radius: float = 1.0):
    """Binary occupancy voxelization (reference pc_util.py:41-52).

    Accepts (N, 3) or batched (B, N, 3) points in [-radius, radius];
    returns (vsize, vsize, vsize) / (B, vsize, ...) float32 occupancy.
    TPU-first: one vectorized scatter instead of the reference's fancy
    indexing, and batched natively (the reference loops per cloud,
    pc_util.py:24-38).
    """
    pts = jnp.asarray(points)
    squeeze = pts.ndim == 2
    if squeeze:
        pts = pts[None]
    voxel = 2.0 * radius / float(vsize)
    loc = ((pts + radius) / voxel).astype(jnp.int32)
    loc = jnp.clip(loc, 0, vsize - 1)
    flat = (loc[..., 0] * vsize + loc[..., 1]) * vsize + loc[..., 2]
    vol = jnp.zeros((pts.shape[0], vsize ** 3), jnp.float32)
    vol = jax.vmap(lambda v, f: v.at[f].set(1.0))(vol, flat)
    vol = vol.reshape(pts.shape[0], vsize, vsize, vsize)
    return vol[0] if squeeze else vol


def volume_to_point_cloud(vol) -> np.ndarray:
    """Occupied-cell indices as an (N, 3) array (pc_util.py:57-72).

    Host-side by nature (variable-length output); one np.argwhere
    replaces the reference's triple python loop.
    """
    v = np.asarray(vol)
    vsize = v.shape[0]
    assert v.shape[1] == vsize and v.shape[2] == vsize
    pts = np.argwhere(v == 1)
    return pts.astype(np.float64) if len(pts) else np.zeros((0, 3))


def gather_patches(patch_table, vox, mask):
    """Fetch each query point's voxel patch via a one-hot matmul.

    Args:
      patch_table: (B, V, E) per-voxel features.
      vox: (B, N) int32 voxel index per query point.
      mask: (B, N) 1/0 inside-grid mask.

    Returns:
      (B, N, E) gathered features (zeros where mask == 0 is NOT applied
      here — the reference multiplies the decoder *output* by the mask, and
      outside points legitimately read cell 0's patch before masking).
    """
    B, V, E = patch_table.shape
    onehot = jax.nn.one_hot(vox, V, dtype=patch_table.dtype)  # (B, N, V)
    return jnp.einsum("bnv,bve->bne", onehot, patch_table)
