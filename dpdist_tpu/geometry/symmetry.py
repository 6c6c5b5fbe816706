"""Symmetry-aware rotation error for registration evaluation.

The raw geodesic rotation error (find_errors,
results_itrPCRNet_no_stop.py:112-133) treats every degree of rotation as
error — but for a rotationally symmetric template (cylinder, torus,
cone, capsule) a whole orbit of ground-truth rotations produces the
IDENTICAL observation, so the metric charges the policy for an
unobservable degree of freedom. The reference has no answer to this
(its synthetic families are all chairs); this module adds one, going
beyond reference parity: the error against the ground-truth COSET

    sym_err = min_{S in G} geodesic(R_pred, R_gt @ S)

where G is the template's rotational symmetry group in its canonical
frame. All synthetic families (data/synthetic.py) are constructed about
the +z axis and only centered/scaled afterwards, so their symmetry
groups are known exactly:

  cylinder / torus / capsule : C_inf about z, plus a 180-degree flip
                               about any horizontal axis (O(2) coset)
  cone                       : C_inf about z (the apex breaks the flip)
  box / sphere (squashed)    : D_2 — 180-degree rotations about x, y, z
                               (a generic ellipsoid / distinct-sided box)
  chair                      : trivial (the back breaks every rotation;
                               its only symmetry is a mirror, which is
                               not a rotation)

For the continuous groups the minimization has a closed form via the
swing-twist decomposition: among all rotations that agree on the
symmetry axis image, the minimal geodesic angle is the angle between
the axis and its image,

    min_theta geodesic(R_z(theta)^T R_rel) = arccos(z . R_rel z),

and the flip coset contributes 180 deg minus that tilt (the flip maps
the axis to its negative). Translation error is unchanged: every
symmetry fixes the (centered) template's origin, so the ground-truth
translation is invariant over the coset.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

# family -> ("axis", flip: bool) for continuous groups,
#           ("d2",) for the three-axis 180-degree discrete group,
#           None for trivial.
FAMILY_SYMMETRY = {
    "cylinder": ("axis", True),
    "torus": ("axis", True),
    "capsule": ("axis", True),
    "cone": ("axis", False),
    "box": ("d2",),
    "sphere": ("d2",),
    "chair": None,
}

_D2 = np.stack([
    np.eye(3),
    np.diag([1.0, -1.0, -1.0]),   # 180 about x
    np.diag([-1.0, 1.0, -1.0]),   # 180 about y
    np.diag([-1.0, -1.0, 1.0]),   # 180 about z
])


def _geodesic_deg(M: np.ndarray) -> np.ndarray:
    """Rotation angle (degrees) of (..., 3, 3) rotation matrices."""
    tr = np.trace(M, axis1=-2, axis2=-1)
    return np.degrees(np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0)))


def symmetry_aware_rotation_error(R_pred: np.ndarray, R_gt: np.ndarray,
                                  family: Optional[str]) -> np.ndarray:
    """min_{S in G(family)} geodesic(R_pred, R_gt @ S), degrees.

    R_pred, R_gt: (..., 3, 3). family None / unknown -> the plain
    geodesic error (G trivial), so this is always safe to call.
    """
    R_rel = np.swapaxes(R_gt, -1, -2) @ R_pred
    sym = FAMILY_SYMMETRY.get(family or "")
    if sym is None:
        return _geodesic_deg(R_rel)
    if sym[0] == "axis":
        # tilt of the symmetry axis: arccos(z . R_rel z)
        cos_tilt = np.clip(R_rel[..., 2, 2], -1.0, 1.0)
        tilt = np.degrees(np.arccos(cos_tilt))
        if sym[1]:  # flip coset: axis -> -axis
            return np.minimum(tilt, 180.0 - tilt)
        return tilt
    # d2: minimum over the four 180-degree coset representatives
    # (S^T = S for 180-degree rotations)
    angles = _geodesic_deg(_D2 @ R_rel[..., None, :, :])
    return np.min(angles, axis=-1)


def symmetry_aware_errors(R_pred: np.ndarray, R_gt: np.ndarray,
                          families) -> np.ndarray:
    """Vectorized over a (B, 3, 3) batch with per-case family labels.

    families: sequence of length B (None entries -> plain geodesic).
    """
    fams = list(families)
    out = np.empty(R_pred.shape[0], dtype=np.float64)
    for fam in set(fams):
        m = np.asarray([f == fam for f in fams])
        out[m] = symmetry_aware_rotation_error(R_pred[m], R_gt[m], fam)
    return out
