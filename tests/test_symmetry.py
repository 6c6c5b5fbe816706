"""Symmetry-aware rotation error (geometry/symmetry.py) — a beyond-
reference metric: scores a predicted rotation against the ground-truth
coset R_gt @ G for the template family's rotational symmetry group G."""
import numpy as np
import jax

from dpdist_tpu.geometry import euler_zyx_to_matrix
from dpdist_tpu.geometry.symmetry import (
    FAMILY_SYMMETRY,
    symmetry_aware_rotation_error,
    symmetry_aware_errors,
)


def _rot(ax, deg):
    r = np.radians(deg)
    c, s = np.cos(r), np.sin(r)
    if ax == "x":
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    if ax == "y":
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def _rand_R(rng):
    return np.asarray(euler_zyx_to_matrix(*rng.uniform(-np.pi, np.pi, 3)))


def test_continuous_symmetry_zeroes_twist():
    rng = np.random.default_rng(0)
    for fam in ("cylinder", "torus", "cone", "capsule"):
        for _ in range(5):
            R_gt = _rand_R(rng)
            twist = R_gt @ _rot("z", rng.uniform(-179, 179))
            err = symmetry_aware_rotation_error(
                twist[None], R_gt[None], fam)[0]
            assert err < 0.05, (fam, err)


def test_flip_coset():
    rng = np.random.default_rng(1)
    R_gt = _rand_R(rng)
    flipped = R_gt @ _rot("x", 180)
    # cylinder admits the flip; cone does not (apex)
    assert symmetry_aware_rotation_error(
        flipped[None], R_gt[None], "cylinder")[0] < 0.05
    assert symmetry_aware_rotation_error(
        flipped[None], R_gt[None], "cone")[0] > 179.0


def test_axis_tilt_is_the_residual():
    R_gt = np.eye(3)
    tilted = _rot("x", 25.0)
    err = symmetry_aware_rotation_error(tilted[None], R_gt[None],
                                        "cylinder")[0]
    assert abs(err - 25.0) < 0.05


def test_d2_families():
    rng = np.random.default_rng(2)
    for fam in ("box", "sphere"):
        R_gt = _rand_R(rng)
        for ax in ("x", "y", "z"):
            flipped = R_gt @ _rot(ax, 180)
            assert symmetry_aware_rotation_error(
                flipped[None], R_gt[None], fam)[0] < 0.05
        # a 90-degree z twist is NOT in D2: residual 90
        q = R_gt @ _rot("z", 90)
        err = symmetry_aware_rotation_error(q[None], R_gt[None], fam)[0]
        assert abs(err - 90.0) < 0.05


def test_trivial_family_matches_geodesic():
    rng = np.random.default_rng(3)
    R_gt, R_pred = _rand_R(rng), _rand_R(rng)
    tr = np.trace(R_gt.T @ R_pred)
    raw = np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1)))
    for fam in ("chair", None, "unknown_family"):
        err = symmetry_aware_rotation_error(R_pred[None], R_gt[None],
                                            fam)[0]
        assert abs(err - raw) < 1e-6


def test_sym_error_properties():
    """sym <= raw always; invariant to right-multiplying the GT by a
    group element."""
    rng = np.random.default_rng(4)
    for fam, sym in FAMILY_SYMMETRY.items():
        for _ in range(3):
            R_gt, R_pred = _rand_R(rng), _rand_R(rng)
            raw = symmetry_aware_rotation_error(
                R_pred[None], R_gt[None], None)[0]
            err = symmetry_aware_rotation_error(
                R_pred[None], R_gt[None], fam)[0]
            assert err <= raw + 1e-6, fam
            if sym is None:
                continue
            S = _rot("z", 77.0) if sym[0] == "axis" else _rot("y", 180)
            err2 = symmetry_aware_rotation_error(
                R_pred[None], (R_gt @ S)[None], fam)[0]
            assert abs(err - err2) < 0.05, fam


def test_vectorized_mixed_batch():
    rng = np.random.default_rng(5)
    R_gt = np.stack([_rand_R(rng) for _ in range(4)])
    R_pred = R_gt @ _rot("z", 40.0)
    fams = ["cylinder", "chair", "cone", None]
    errs = symmetry_aware_errors(R_pred, R_gt, fams)
    assert errs[0] < 0.05 and errs[2] < 0.05           # symmetric: twist free
    assert abs(errs[1] - 40.0) < 0.05                  # chair pays it
    assert abs(errs[3] - 40.0) < 0.05


def test_evaluate_registration_sym_fields(tmp_path):
    from dpdist_tpu.configs import PCRNetConfig
    from dpdist_tpu.data.registration import RegistrationDataset
    from dpdist_tpu.eval.registration import evaluate_registration
    from dpdist_tpu.models import init_pcrnet

    cfg = PCRNetConfig(num_point=32, out_features=64,
                       head_widths=(32, 16), max_loops=2)
    params, _ = init_pcrnet(jax.random.PRNGKey(0), cfg)
    ds = RegistrationDataset(n_templates=4, num_point=32, seed=0,
                             families=("cylinder", "chair"))
    rep = evaluate_registration(params, cfg, ds, num_cases=8,
                                iterations=2, batch_size=8)
    assert "sym_rot_err_mean_deg" in rep
    assert rep["sym_rot_err_mean_deg"] <= rep["rot_err_mean_deg"] + 1e-6
    pf = rep["per_family"]
    # trivial family: sym == raw; symmetric family: sym <= raw
    assert abs(pf["chair"]["sym_rot_err_mean_deg"]
               - pf["chair"]["rot_err_mean_deg"]) < 1e-5
    assert (pf["cylinder"]["sym_rot_err_mean_deg"]
            <= pf["cylinder"]["rot_err_mean_deg"] + 1e-6)
    for k in ("sym_acc_rot2.5_trans0.05", "sym_acc_rot20.0_trans0.2"):
        assert 0.0 <= pf["cylinder"][k] <= 1.0
        assert k in rep["sym_acc"]
