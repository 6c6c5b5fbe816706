import numpy as np
import pytest

from dpdist_tpu.data.io import (
    read_ply,
    write_ply,
    read_xyz_txt,
    write_xyz_txt,
    write_templates_h5,
    read_templates_h5,
    write_pose_csv,
    read_pose_csv,
)
from dpdist_tpu.eval.viz import save_cloud_pair, save_iteration_curves, save_loss_curve
from dpdist_tpu.eval.comparison import perturbation_sweep, monotonicity


def test_xyz_txt_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    p = str(tmp_path / "c.txt")
    write_xyz_txt(p, pts)
    np.testing.assert_allclose(read_xyz_txt(p), pts, atol=1e-5)


@pytest.mark.parametrize("binary", [True, False])
def test_ply_roundtrip(tmp_path, rng, binary):
    pts = rng.normal(size=(40, 3)).astype(np.float32)
    p = str(tmp_path / "c.ply")
    write_ply(p, pts, binary=binary)
    got = read_ply(p)
    np.testing.assert_allclose(got, pts, atol=1e-5)


def test_templates_h5_roundtrip(tmp_path, rng):
    t = rng.normal(size=(4, 128, 3)).astype(np.float32)
    p = str(tmp_path / "templates_train.h5")
    write_templates_h5(p, t, files=["a", "b", "c", "d"])
    np.testing.assert_allclose(read_templates_h5(p), t)


def test_pose_csv_roundtrip(tmp_path, rng):
    poses = rng.uniform(-1, 1, (10, 6)).astype(np.float32)
    p = str(tmp_path / "poses.csv")
    write_pose_csv(p, poses)
    np.testing.assert_allclose(read_pose_csv(p), poses, atol=1e-4)


def test_viz_writes_files(tmp_path, rng):
    a = rng.normal(size=(64, 3))
    out = save_cloud_pair(str(tmp_path / "pair.png"), a, a)
    if out is not None:
        import os
        assert os.path.getsize(out) > 0
    out2 = save_iteration_curves(str(tmp_path / "curves.png"),
                                 [10, 5, 2], [0.1, 0.05, 0.02], [1, 0.1, 0.01])
    out3 = save_loss_curve(str(tmp_path / "loss.png"), [1.0, 0.5, 0.2])
    assert (out2 is None) == (out is None)
    assert (out3 is None) == (out is None)


def test_perturbation_sweep_shapes(rng):
    import jax
    from dpdist_tpu.configs import DPDistConfig
    from dpdist_tpu.models import init_dpdist

    cfg = DPDistConfig(num_point=16, embedding_size=64, k=3, mlp=(16, 16, 16))
    params, state = init_dpdist(jax.random.PRNGKey(0), cfg)
    surfaces = rng.uniform(-0.8, 0.8, (2, 64, 3)).astype(np.float32)
    sweep = perturbation_sweep(params, state, cfg, surfaces, kind="noise",
                               magnitudes=(0.0, 0.1), num_point=16)
    assert len(sweep["dpdist"]) == 2
    assert len(sweep["chamfer"]) == 2
    # chamfer must respond to noise regardless of training
    assert sweep["chamfer"][1] > sweep["chamfer"][0]
    assert 0.0 <= monotonicity(sweep["chamfer"]) <= 1.0

    # occlude kind (round 3): points stay ON the surface, so chamfer's
    # response comes from the missing ball; values must be finite and the
    # zero-magnitude entry equals a plain resample
    occ = perturbation_sweep(params, state, cfg, surfaces, kind="occlude",
                             magnitudes=(0.0, 0.5), num_point=16)
    assert all(np.isfinite(v) for v in occ["chamfer"] + occ["dpdist"])
    assert occ["chamfer"][1] > occ["chamfer"][0]


def test_make_templates_cli(tmp_path):
    from dpdist_tpu.cli.make_templates import main

    out = str(tmp_path / "reg")
    main(["--out_dir", out, "--n_templates", "3", "--num_point", "256",
          "--num_poses", "20"])
    import os
    assert os.path.exists(os.path.join(out, "templates_train.h5"))
    t = read_templates_h5(os.path.join(out, "templates_test.h5"))
    assert t.shape == (3, 256, 3)
    poses = read_pose_csv(os.path.join(out, "itr_net_eval_data45.csv"))
    assert poses.shape == (20, 6)
