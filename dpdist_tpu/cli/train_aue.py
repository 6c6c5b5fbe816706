"""Train the autoencoder task with a frozen DPDist (or chamfer) loss.

Reference: train_multi_gpu_pc_compare_dist.py phases 2+3
(--train_comp != 'dpdist'): build AUE, train it against a frozen DPDist
checkpoint with --opt_type ours|chamfer.
"""

from __future__ import annotations

import argparse
import json

import jax

from dpdist_tpu.cli.common import add_train_args, train_config_from_args, mesh_from_args


def load_dpdist_checkpoint(ckpt_path: str):
    """Restore (cfg, params, state) from a DPDistTrainer checkpoint."""
    from dpdist_tpu.configs import DPDistConfig
    from dpdist_tpu.models import init_dpdist
    from dpdist_tpu.train.checkpoint import restore_checkpoint

    with open(ckpt_path + ".json") as f:
        meta = json.load(f)["metadata"]
    cfg = DPDistConfig.from_json(meta["model_config"])
    template_p, template_s = init_dpdist(jax.random.PRNGKey(0), cfg)
    tree, _, _ = restore_checkpoint(ckpt_path, {"params": template_p,
                                                "state": template_s})
    return cfg, tree["params"], tree["state"]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_train_args(p)
    p.add_argument("--dpdist_ckpt", required=True,
                   help="base path of a DPDistTrainer checkpoint")
    p.add_argument("--opt_type", default="ours", choices=["ours", "chamfer"])
    p.add_argument("--encoder_aue", default="pn", choices=["pn", "3dmfv"])
    p.add_argument("--num_point", type=int, default=64)
    p.add_argument("--data_root", default="data/synthetic")
    p.add_argument("--category", default="chair")
    p.add_argument("--log_dir", default="runs/aue")
    p.add_argument("--max_epoch_aue", type=int, default=100)
    p.add_argument("--resume", default=None, help="AUE checkpoint base path")
    p.add_argument("--start_epoch", type=int, default=0,
                   help="with --resume: continue epoch numbering from here "
                        "(total budget stays --max_epoch_aue)")
    p.add_argument("--archive_to", default=None,
                   help="base path (no extension) to copy aue_ckpt_best to "
                        "on every improvement (wipe-resilience)")
    a = p.parse_args(argv)

    from dpdist_tpu.configs import AUEConfig
    from dpdist_tpu.data.modelnet import SurfacePairDataset
    from dpdist_tpu.train.aue_trainer import AUETrainer

    dcfg, dparams, dstate = load_dpdist_checkpoint(a.dpdist_ckpt)
    tcfg = train_config_from_args(a).replace(learning_rate=max(a.learning_rate, 1e-3))
    acfg = AUEConfig(num_point=a.num_point, encoder=a.encoder_aue)

    trainer = AUETrainer(acfg, tcfg, dcfg, dparams, dstate,
                         opt_type=a.opt_type, run_dir=a.log_dir,
                         mesh=mesh_from_args(a))
    if a.resume:
        trainer.restore(a.resume)
    ds = SurfacePairDataset(a.data_root, batch_size=tcfg.batch_size,
                            npoints=a.num_point * 2, split="train",
                            class_choice=a.category, seed=a.seed)
    test_ds = SurfacePairDataset(a.data_root, batch_size=tcfg.batch_size,
                                 npoints=a.num_point * 2, split="test",
                                 class_choice=a.category, seed=a.seed)
    best = trainer.fit(ds, test_ds, max_epoch=a.max_epoch_aue,
                       start_epoch=a.start_epoch, archive_to=a.archive_to)
    print(f"best checkpoint: {best}")


if __name__ == "__main__":
    main()
