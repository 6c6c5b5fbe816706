import numpy as np
import jax.numpy as jnp

from dpdist_tpu.ops.voxel import voxel_assign, grid_centers, extract_patches, gather_patches
from oracles import grid_binary_mask_oracle, extract_volume_patches_oracle


def test_grid_centers_match_reference():
    C = grid_centers(512, 3)
    g = 8
    step = 2 / g
    l = np.arange(-1, 1, step) + step / 2
    X, Y, Z = np.meshgrid(l, l, l)
    want = np.stack([X, Y, Z], -1).reshape(-1, 3)
    np.testing.assert_allclose(C, want, atol=1e-7)


def test_voxel_assign_matches_mask_argmax_oracle(rng):
    pts = rng.uniform(-1.3, 1.3, (4, 128, 3)).astype(np.float32)
    C = grid_centers(512, 3)
    vox, mask, delta = voxel_assign(jnp.asarray(pts), 8)
    bv, rel, argmax = grid_binary_mask_oracle(C.astype(np.float64), pts.astype(np.float64))
    inside = bv.max(2) > 0
    np.testing.assert_array_equal(np.asarray(mask), inside.astype(np.float32))
    # voxel ids must agree wherever the point is inside the grid
    np.testing.assert_array_equal(
        np.asarray(vox)[inside], argmax[inside].astype(np.int32)
    )
    # delta = point - assigned-center (oracle gathers rel at argmax)
    want_delta = np.take_along_axis(
        rel, argmax[..., None, None].repeat(3, -1), 2
    ).squeeze(2)
    np.testing.assert_allclose(
        np.asarray(delta)[inside], want_delta[inside], atol=1e-6
    )


def test_voxel_assign_2d(rng):
    pts = rng.uniform(-1.1, 1.1, (2, 64, 2)).astype(np.float32)
    C = grid_centers(64, 2)
    vox, mask, delta = voxel_assign(jnp.asarray(pts), 8)
    bv, rel, argmax = grid_binary_mask_oracle(C.astype(np.float64), pts.astype(np.float64))
    inside = bv.max(2) > 0
    np.testing.assert_array_equal(np.asarray(mask), inside.astype(np.float32))
    np.testing.assert_array_equal(np.asarray(vox)[inside], argmax[inside].astype(np.int32))


def test_extract_patches_matches_tf_ordering(rng):
    B, g, C, k = 2, 4, 3, 3
    fv = rng.normal(size=(B, g ** 3, C)).astype(np.float32)
    got = np.asarray(extract_patches(jnp.asarray(fv), g, k))
    vol = fv.reshape(B, g, g, g, C)
    want = extract_volume_patches_oracle(vol, k).reshape(B, g ** 3, -1)
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_gather_patches_one_hot(rng):
    B, V, E, N = 2, 64, 5, 16
    table = rng.normal(size=(B, V, E)).astype(np.float32)
    vox = rng.integers(0, V, (B, N)).astype(np.int32)
    mask = np.ones((B, N), np.float32)
    got = np.asarray(gather_patches(jnp.asarray(table), jnp.asarray(vox), jnp.asarray(mask)))
    want = np.take_along_axis(table, vox[..., None].repeat(E, -1), 1)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_volume_roundtrip_matches_reference_semantics(rng):
    """point_cloud_to_volume / volume_to_point_cloud (pc_util.py:24-72):
    occupancy semantics vs a literal numpy re-execution, plus roundtrip."""
    from dpdist_tpu.ops.voxel import point_cloud_to_volume, volume_to_point_cloud

    pts = rng.uniform(-0.999, 0.999, (50, 3)).astype(np.float32)
    vol = np.asarray(point_cloud_to_volume(pts, vsize=12, radius=1.0))

    ref = np.zeros((12, 12, 12))
    loc = ((pts + 1.0) / (2.0 / 12)).astype(int)
    ref[loc[:, 0], loc[:, 1], loc[:, 2]] = 1.0
    np.testing.assert_array_equal(vol, ref)

    back = volume_to_point_cloud(vol)
    assert back.shape[1] == 3
    assert len(back) == int(vol.sum())
    assert set(map(tuple, back.astype(int))) == set(map(tuple, loc))

    # batched variant matches per-cloud
    batch = rng.uniform(-1, 1, (3, 20, 3)).astype(np.float32)
    bv = np.asarray(point_cloud_to_volume(batch, vsize=8))
    for i in range(3):
        np.testing.assert_array_equal(
            bv[i], np.asarray(point_cloud_to_volume(batch[i], vsize=8)))

    assert volume_to_point_cloud(np.zeros((4, 4, 4))).shape == (0, 3)
