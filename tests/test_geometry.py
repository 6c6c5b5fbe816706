import numpy as np
import jax.numpy as jnp

from dpdist_tpu.geometry import (
    euler_zyx_to_matrix,
    matrix_to_euler_zyx,
    quat_to_matrix,
    matrix_to_quat,
    normalize_quat,
    rotation_6d_to_matrix,
    rotation_geodesic_error,
    pose6_to_matrix,
    apply_pose6,
    apply_quat,
    apply_transform,
    invert_transform,
    compose_transforms,
    transform_errors,
)


def apply_transformation_reference(datas, poses):
    """Literal numpy copy of helper.apply_transformation (helper.py:229-258)."""
    out = np.zeros(datas.shape, dtype=np.float32)
    for i in range(datas.shape[0]):
        rz, ry, rx = poses[i, 5], poses[i, 4], poses[i, 3]
        Rx = np.array([[1, 0, 0], [0, np.cos(rx), -np.sin(rx)], [0, np.sin(rx), np.cos(rx)]])
        Ry = np.array([[np.cos(ry), 0, np.sin(ry)], [0, 1, 0], [-np.sin(ry), 0, np.cos(ry)]])
        Rz = np.array([[np.cos(rz), -np.sin(rz), 0], [np.sin(rz), np.cos(rz), 0], [0, 0, 1]])
        p = np.dot(Rz, datas[i].reshape(-1, 3).T).T
        p = np.dot(Ry, p.T).T
        p = np.dot(Rx, p.T).T
        out[i] = p + poses[i, 0:3]
    return out


def test_apply_pose6_matches_reference(rng):
    pts = rng.normal(size=(4, 32, 3)).astype(np.float32)
    poses = rng.uniform(-1, 1, (4, 6)).astype(np.float32)
    got = np.asarray(apply_pose6(jnp.asarray(pts), jnp.asarray(poses)))
    want = apply_transformation_reference(pts, poses)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_euler_roundtrip(rng):
    ang = rng.uniform(-1.2, 1.2, (8, 3))
    R = euler_zyx_to_matrix(jnp.asarray(ang[:, 0]), jnp.asarray(ang[:, 1]), jnp.asarray(ang[:, 2]))
    rx, ry, rz = matrix_to_euler_zyx(R)
    np.testing.assert_allclose(np.stack([rx, ry, rz], -1), ang, atol=1e-5)


def test_quat_matrix_roundtrip(rng):
    q = normalize_quat(jnp.asarray(rng.normal(size=(16, 4))))
    R = quat_to_matrix(q)
    # Orthonormality
    eye = np.eye(3)
    np.testing.assert_allclose(
        np.asarray(R @ jnp.swapaxes(R, -1, -2)), np.tile(eye, (16, 1, 1)), atol=1e-6
    )
    q2 = matrix_to_quat(R)
    # Quaternions are sign-ambiguous
    dots = np.abs(np.sum(np.asarray(q) * np.asarray(q2), -1))
    np.testing.assert_allclose(dots, np.ones(16), atol=1e-5)


def test_quat_rotation_matches_besl_mckay(rng):
    # quat (w,x,y,z) = (cos t/2, sin t/2 * axis): rotate about z by t
    t = 0.7
    q = jnp.asarray([[np.cos(t / 2), 0, 0, np.sin(t / 2)]])
    pts = jnp.asarray(rng.normal(size=(1, 8, 3)).astype(np.float32))
    got = np.asarray(apply_quat(pts, q, jnp.zeros((1, 3))))
    Rz = np.array([[np.cos(t), -np.sin(t), 0], [np.sin(t), np.cos(t), 0], [0, 0, 1]])
    want = np.asarray(pts)[0] @ Rz.T
    np.testing.assert_allclose(got[0], want, atol=1e-5)


def test_rotation_6d(rng):
    x = rng.normal(size=(5, 6))
    R = np.asarray(rotation_6d_to_matrix(jnp.asarray(x)))
    eye = np.tile(np.eye(3), (5, 1, 1))
    np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(5), atol=1e-5)


def test_transform_compose_invert(rng):
    poses = rng.uniform(-0.5, 0.5, (3, 6)).astype(np.float32)
    T = pose6_to_matrix(jnp.asarray(poses))
    Ti = invert_transform(T)
    eye = np.tile(np.eye(4), (3, 1, 1))
    np.testing.assert_allclose(np.asarray(compose_transforms(T, Ti)), eye, atol=1e-5)
    pts = jnp.asarray(rng.normal(size=(3, 10, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(apply_transform(apply_transform(pts, T), Ti)), np.asarray(pts), atol=1e-5
    )


def test_geodesic_error():
    R1 = euler_zyx_to_matrix(jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(0.0))
    R2 = euler_zyx_to_matrix(jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(np.pi / 6))
    err = rotation_geodesic_error(R1, R2)
    np.testing.assert_allclose(float(err), 30.0, atol=1e-4)


def test_transform_errors(rng):
    poses = rng.uniform(-0.3, 0.3, (2, 6)).astype(np.float32)
    T = pose6_to_matrix(jnp.asarray(poses))
    te, re = transform_errors(T, T)
    np.testing.assert_allclose(np.asarray(te), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(re), 0.0, atol=1e-2)
