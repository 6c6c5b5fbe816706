"""Batched rotation representations and conversions (pure jax.numpy).

Consolidates the reference's scattered rotation code (utils/eulerangles.py,
pcrnet-registration/helper.py:229-599) into one batched, differentiable,
jit-friendly module. Conventions match the reference:

  * Euler pose6 = (tx, ty, tz, rx, ry, rz); rotation applied as
    R = Rx @ Ry @ Rz (reference helper.apply_transformation:229-258 applies
    Rz, then Ry, then Rx by pre-multiplication).
  * Quaternions are (w, x, y, z), rotation matrix per Besl-McKay as in
    helper.transformation_quat_tensor (helper.py:539-570).
  * 6D ortho representation per helper.transformation_6D_tensor.

All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# All matmuls in this module are 3x3/4x4 pose algebra: force exact-f32
# accumulation. TPU's DEFAULT matmul precision uses bf16 passes, which
# injects ~1e-2 absolute entry error — measured on-chip as mean 2.8 /
# max 11.4 deg of geodesic rotation-error noise through an 8-step
# compose chain (probe in RESULTS.md round 5; HIGHEST: 0.002 deg).
# At these shapes HIGHEST costs nothing.
_matmul = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def _rx(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [jnp.stack([o, z, z], -1), jnp.stack([z, c, -s], -1), jnp.stack([z, s, c], -1)], -2
    )


def _ry(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [jnp.stack([c, z, s], -1), jnp.stack([z, o, z], -1), jnp.stack([-s, z, c], -1)], -2
    )


def _rz(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [jnp.stack([c, -s, z], -1), jnp.stack([s, c, z], -1), jnp.stack([z, z, o], -1)], -2
    )


def euler_zyx_to_matrix(rx, ry, rz):
    """R = Rx(rx) @ Ry(ry) @ Rz(rz): rotate about z first, then y, then x.

    Matches transforms3d euler2mat(rz, ry, rx, 'szyx') and the reference's
    apply_transformation order (helper.py:229-258).
    """
    return _matmul(_matmul(_rx(rx), _ry(ry)), _rz(rz))


def matrix_to_euler_zyx(R):
    """Inverse of euler_zyx_to_matrix; returns (rx, ry, rz).

    R = Rx Ry Rz =>
      R[0,2] = sin(ry); R[0,1] = -cos(ry) sin(rz); R[0,0] = cos(ry) cos(rz)
      R[1,2] = -sin(rx) cos(ry); R[2,2] = cos(rx) cos(ry)
    Gimbal-safe via the standard atan2 formulation (cf. reference
    utils/eulerangles.py mat2euler semantics for 'szyx').
    """
    r02 = jnp.clip(R[..., 0, 2], -1.0, 1.0)
    ry = jnp.arcsin(r02)
    # Non-degenerate branch
    rx = jnp.arctan2(-R[..., 1, 2], R[..., 2, 2])
    rz = jnp.arctan2(-R[..., 0, 1], R[..., 0, 0])
    # Degenerate (|cos ry| ~ 0): set rz = 0, fold everything into rx
    cy = jnp.sqrt(jnp.maximum(R[..., 0, 0] ** 2 + R[..., 0, 1] ** 2, 0.0))
    degen = cy < 1e-7
    rx_d = jnp.arctan2(R[..., 2, 1], R[..., 1, 1])
    rx = jnp.where(degen, rx_d, rx)
    rz = jnp.where(degen, jnp.zeros_like(rz), rz)
    return rx, ry, rz


def normalize_quat(q, eps: float = 1e-7):
    """Normalize quaternion(s) (..., 4) to unit norm.

    Uses the reference's additive-epsilon form (ipcr_model.get_loss:302-307).
    """
    n = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True)) + eps
    return q / n


def quat_to_matrix(q):
    """(w, x, y, z) quaternion(s) (..., 4) -> rotation matrix (..., 3, 3).

    Besl-McKay formula, identical to helper.transformation_quat_tensor
    (helper.py:539-570). Input need not be normalized if used with
    normalize_quat first.
    """
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = q0 * q0 + q1 * q1 - q2 * q2 - q3 * q3
    r11 = q0 * q0 + q2 * q2 - q1 * q1 - q3 * q3
    r22 = q0 * q0 + q3 * q3 - q1 * q1 - q2 * q2
    r01 = 2 * (q1 * q2 - q0 * q3)
    r02 = 2 * (q1 * q3 + q0 * q2)
    r10 = 2 * (q1 * q2 + q0 * q3)
    r12 = 2 * (q2 * q3 - q0 * q1)
    r20 = 2 * (q1 * q3 - q0 * q2)
    r21 = 2 * (q2 * q3 + q0 * q1)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], -1),
            jnp.stack([r10, r11, r12], -1),
            jnp.stack([r20, r21, r22], -1),
        ],
        -2,
    )


def matrix_to_quat(R):
    """Rotation matrix (..., 3, 3) -> unit quaternion (w, x, y, z).

    Shepperd's branchless method via jnp.where over the four cases.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # Case 0: trace dominant
    s0 = safe_sqrt(1.0 + tr) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], -1)
    # Case 1: m00 dominant
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], -1)
    # Case 2: m11 dominant
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], -1)
    # Case 3: m22 dominant
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], -1)

    cond0 = tr > 0
    cond1 = (m00 >= m11) & (m00 >= m22)
    cond2 = m11 >= m22
    q = jnp.where(
        cond0[..., None],
        q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    return normalize_quat(q, eps=0.0)


def quat_multiply(a, b):
    """Hamilton product of (w, x, y, z) quaternions."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        -1,
    )


def rotation_6d_to_matrix(ortho6d):
    """6D rotation representation (..., 6) -> matrix, Gram-Schmidt style.

    Matches helper.transformation_6D_tensor (helper.py:576-599):
    columns of R are (x, y, z) built from the two raw vectors.
    """
    x_raw = ortho6d[..., 0:3]
    y_raw = ortho6d[..., 3:6]

    def _norm(v):
        return v / jnp.sqrt(jnp.sum(v * v, -1, keepdims=True))

    x = _norm(x_raw)
    z = _norm(jnp.cross(x, y_raw))
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], -1)


def rotation_geodesic_error(R_pred, R_gt):
    """Axis-angle geodesic rotation error in degrees.

    Matches the evaluator's find_errors (results_itrPCRNet_no_stop.py:112-133):
    error = ||rodrigues(R_pred^T @ R_gt)|| in degrees.
    """
    M = _matmul(jnp.swapaxes(R_pred, -1, -2), R_gt)
    tr = M[..., 0, 0] + M[..., 1, 1] + M[..., 2, 2]
    cos_theta = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos_theta))
