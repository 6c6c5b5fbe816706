"""Train DPDist (reference: train_multi_gpu_pc_compare_dist.py, phase 1)."""

from __future__ import annotations

import argparse

from dpdist_tpu.cli.common import (
    add_dpdist_model_args,
    add_train_args,
    dpdist_config_from_args,
    mesh_from_args,
    train_config_from_args,
)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_dpdist_model_args(p)
    add_train_args(p)
    p.add_argument("--data_root", default="data/synthetic")
    p.add_argument("--category", default="chair",
                   help="class filter; 'all' trains on every class")
    p.add_argument("--log_dir", default="runs/dpdist")
    p.add_argument("--eval_every", type=int, default=10)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--archive_to", default=None,
                   help="base path (no extension) to copy ckpt_best to on "
                        "every improvement, e.g. results/dpdist_multi; the "
                        "wipe-resilience mechanism — runs/ is gitignored "
                        "and has been destroyed by container replacement "
                        "twice (CLAUDE.md)")
    a = p.parse_args(argv)

    from dpdist_tpu.data.modelnet import SurfacePairDataset
    from dpdist_tpu.train import DPDistTrainer

    mcfg = dpdist_config_from_args(a)
    tcfg = train_config_from_args(a)
    mesh = mesh_from_args(a)

    trainer = DPDistTrainer(mcfg, tcfg, run_dir=a.log_dir, mesh=mesh)
    if a.resume:
        trainer.restore()

    category = None if a.category == "all" else a.category
    train_ds = SurfacePairDataset(a.data_root, batch_size=tcfg.batch_size,
                                  npoints=mcfg.num_point * 2, split="train",
                                  class_choice=category, seed=a.seed)
    test_ds = SurfacePairDataset(a.data_root, batch_size=tcfg.batch_size,
                                 npoints=mcfg.num_point * 2, split="test",
                                 class_choice=category, seed=a.seed)
    trainer.fit(train_ds, test_ds, eval_every=a.eval_every,
                archive_to=a.archive_to)


if __name__ == "__main__":
    main()
