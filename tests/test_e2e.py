"""End-to-end smoke: the full reference pipeline in miniature.

gen data -> train DPDist -> freeze -> train AUE with it -> train PCRNet
with it -> evaluate registration. Everything tiny; asserts wiring, not
quality.
"""

import numpy as np
import jax
import pytest

from dpdist_tpu.configs import AUEConfig, DPDistConfig, PCRNetConfig, TrainConfig
from dpdist_tpu.data.gtgen import generate_synthetic_dataset
from dpdist_tpu.data.modelnet import SurfacePairDataset
from dpdist_tpu.data.registration import RegistrationDataset
from dpdist_tpu.eval.registration import evaluate_registration
from dpdist_tpu.parallel import make_mesh
from dpdist_tpu.train import DPDistTrainer, AUETrainer, PCRNetTrainer
from dpdist_tpu.train.checkpoint import restore_checkpoint
from dpdist_tpu.models import init_dpdist
from dpdist_tpu.parallel.distributed import process_shard


def test_process_shard_partition():
    items = list(range(10))
    shards = [process_shard(items, process_index=i, process_count=3)
              for i in range(3)]
    assert sorted(sum(shards, [])) == items
    assert all(len(s) >= 3 for s in shards)


def test_full_pipeline_smoke(tmp_path):
    root = str(tmp_path / "data")
    generate_synthetic_dataset(root, families=("chair",), n_train=4, n_test=2,
                               n_surface=400, num_neg_points=200, seed=0)

    # 1. train DPDist a few steps
    mcfg = DPDistConfig(num_point=16, embedding_size=64, k=3, mlp=(32, 32, 32))
    tcfg = TrainConfig(batch_size=4, learning_rate=1e-3, log_every=10 ** 9)
    dp = DPDistTrainer(mcfg, tcfg, run_dir=str(tmp_path / "dp"),
                       mesh=make_mesh(data=2))
    ds = SurfacePairDataset(root, batch_size=4, npoints=32, seed=0)
    for e in range(2):
        loss = dp.train_epoch(ds, e)
    assert np.isfinite(loss)
    ckpt = dp.save(tag="e2e")

    # 2. restore through the checkpoint path (as the CLI does)
    tp, ts = init_dpdist(jax.random.PRNGKey(0), mcfg)
    tree, step, meta = restore_checkpoint(ckpt, {"params": tp, "state": ts})
    assert meta["model_config"]

    # 3. AUE with frozen DPDist loss
    acfg = AUEConfig(num_point=16)
    aue = AUETrainer(acfg, tcfg, mcfg, tree["params"], tree["state"],
                     opt_type="ours", run_dir=str(tmp_path / "aue"))
    a_loss = aue.train_epoch(ds, 0)
    assert np.isfinite(a_loss)

    # 4. PCRNet with frozen DPDist loss, 2 refinement iterations
    pcfg = PCRNetConfig(num_point=16, out_features=32, max_loops=2,
                        eval_iterations=3)
    reg_ds = RegistrationDataset(n_templates=2, num_point=16, seed=0)
    pcr = PCRNetTrainer(pcfg, TrainConfig(batch_size=2, learning_rate=1e-4,
                                          log_every=10 ** 9),
                        loss_type="dpdist",
                        dpdist=(mcfg, tree["params"], tree["state"]),
                        run_dir=str(tmp_path / "pcr"))
    t, s, _ = reg_ds.sample_batch(2)
    m = pcr.train_step(t, s)
    assert np.isfinite(float(m["loss"]))

    # 5. registration evaluation end to end
    rep = evaluate_registration(jax.device_get(pcr.params), pcfg, reg_ds,
                                num_cases=2, iterations=3, batch_size=2,
                                report_dir=str(tmp_path / "rep"))
    assert rep["num_cases"] == 2
    assert np.isfinite(rep["rot_err_mean_deg"])
