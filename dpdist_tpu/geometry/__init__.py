from dpdist_tpu.geometry.rotations import (
    euler_zyx_to_matrix,
    matrix_to_euler_zyx,
    quat_to_matrix,
    matrix_to_quat,
    quat_multiply,
    normalize_quat,
    rotation_6d_to_matrix,
    rotation_geodesic_error,
)
from dpdist_tpu.geometry.symmetry import (
    FAMILY_SYMMETRY,
    symmetry_aware_rotation_error,
    symmetry_aware_errors,
)
from dpdist_tpu.geometry.se3 import (
    pose6_to_matrix,
    pose7_to_matrix,
    apply_pose6,
    apply_quat,
    apply_transform,
    compose_transforms,
    invert_transform,
    transform_errors,
)

__all__ = [
    "euler_zyx_to_matrix",
    "matrix_to_euler_zyx",
    "quat_to_matrix",
    "matrix_to_quat",
    "quat_multiply",
    "normalize_quat",
    "rotation_6d_to_matrix",
    "rotation_geodesic_error",
    "pose6_to_matrix",
    "pose7_to_matrix",
    "apply_pose6",
    "apply_quat",
    "apply_transform",
    "compose_transforms",
    "invert_transform",
    "transform_errors",
    "FAMILY_SYMMETRY",
    "symmetry_aware_rotation_error",
    "symmetry_aware_errors",
]
