"""Batched SE(3) transforms (pure jax.numpy, differentiable).

Replaces the reference's host-side numpy loops (helper.apply_transformation
helper.py:229-258, transformation_quat2mat helper.py:309-329) with batched
on-device ops so the iterative-PCRNet refinement loop can run entirely
inside one jitted lax.scan instead of host/device ping-pong per iteration.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Exact-f32 matmuls for all pose algebra AND point-cloud transforms:
# TPU default matmul precision (bf16 passes) puts ~1e-2 entry error
# into composed transforms (on-chip probe: mean 2.8 / max 11.4 deg
# geodesic noise after 8 composes vs 0.002 deg at HIGHEST; RESULTS.md
# round 5) and ~4e-3 coordinate error into transformed clouds. These
# are 3x3/4x4-by-N ops; HIGHEST is effectively free.
_matmul = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

from dpdist_tpu.geometry.rotations import (
    euler_zyx_to_matrix,
    matrix_to_euler_zyx,
    quat_to_matrix,
    normalize_quat,
    rotation_geodesic_error,
)


def pose6_to_matrix(pose6):
    """(..., 6) pose (tx,ty,tz,rx,ry,rz) -> (..., 4, 4) homogeneous matrix."""
    R = euler_zyx_to_matrix(pose6[..., 3], pose6[..., 4], pose6[..., 5])
    t = pose6[..., 0:3]
    T = jnp.zeros(pose6.shape[:-1] + (4, 4), dtype=pose6.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def pose7_to_matrix(pose7):
    """(..., 7) pose (tx,ty,tz,qw,qx,qy,qz) -> (..., 4, 4).

    Quaternion is normalized first (reference ipcr_model.get_loss:302-307).
    """
    q = normalize_quat(pose7[..., 3:7])
    R = quat_to_matrix(q)
    t = pose7[..., 0:3]
    T = jnp.zeros(pose7.shape[:-1] + (4, 4), dtype=pose7.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def apply_pose6(points, pose6):
    """Apply batched euler pose to points (..., N, 3).

    Semantics identical to helper.apply_transformation (helper.py:229-258):
    rotate by Rz then Ry then Rx, then translate.
    """
    R = euler_zyx_to_matrix(pose6[..., 3], pose6[..., 4], pose6[..., 5])
    return _matmul(points, jnp.swapaxes(R, -1, -2)) + pose6[..., None, 0:3]


def apply_quat(points, quat, translation):
    """Rotate (..., N, 3) points by (w,x,y,z) quaternion + translate.

    On-device equivalent of helper.transformation_quat_tensor
    (helper.py:539-570); differentiable w.r.t. all inputs.
    """
    R = quat_to_matrix(quat)
    return _matmul(points, jnp.swapaxes(R, -1, -2)) + translation[..., None, :]


def apply_transform(points, T):
    """Apply (..., 4, 4) homogeneous transform to (..., N, 3) points."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return _matmul(points, jnp.swapaxes(R, -1, -2)) + t[..., None, :]


def compose_transforms(T_new, T_prev):
    """Accumulate a refinement step: T_total = T_new @ T_prev.

    Mirrors transformation_quat2mat's update (helper.py:309-329), which
    pre-multiplies the per-iteration transform onto the running product.
    """
    return _matmul(T_new, T_prev)


def invert_transform(T):
    """Invert (..., 4, 4) rigid transform without a general solve."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -(_matmul(Rt, t[..., None]))[..., 0]
    Ti = jnp.zeros_like(T)
    Ti = Ti.at[..., :3, :3].set(Rt)
    Ti = Ti.at[..., :3, 3].set(ti)
    Ti = Ti.at[..., 3, 3].set(1.0)
    return Ti


def matrix_to_pose6(T):
    """(..., 4, 4) -> (..., 6) euler pose, inverse of pose6_to_matrix."""
    rx, ry, rz = matrix_to_euler_zyx(T[..., :3, :3])
    return jnp.concatenate(
        [T[..., :3, 3], jnp.stack([rx, ry, rz], -1)], axis=-1
    )


def transform_errors(T_pred, T_gt):
    """Translation L2 error + geodesic rotation error (degrees).

    The evaluator's metric pair (find_errors,
    results_itrPCRNet_no_stop.py:112-133). The reference compares the
    *inverse* predicted transform against the ground-truth source pose;
    callers pass whichever pair matches their protocol.
    """
    t_err = jnp.linalg.norm(T_pred[..., :3, 3] - T_gt[..., :3, 3], axis=-1)
    r_err = rotation_geodesic_error(T_pred[..., :3, :3], T_gt[..., :3, :3])
    return t_err, r_err


def convergence_measure(T, T_prev):
    """||T @ T_prev^{-1} - I||_F^2 per batch element.

    Matches check_convergenceT (results_itrPCRNet_no_stop.py:155-167).
    """
    M = _matmul(T, invert_transform(T_prev))
    eye = jnp.eye(4, dtype=T.dtype)
    d = M - eye
    return jnp.sum(d * d, axis=(-1, -2))
