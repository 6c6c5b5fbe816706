"""Train iterative PCRNet (reference: iterative_PCRNet{_ours}.py).

--loss_type dpdist reproduces iterative_PCRNet_ours.py (frozen DPDist
loss); chamfer/emd reproduce the iterative_PCRNet.py baselines.
"""

from __future__ import annotations

import argparse

from dpdist_tpu.cli.common import add_train_args, train_config_from_args, mesh_from_args


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_train_args(p)
    p.add_argument("--loss_type", default="dpdist",
                   choices=["dpdist", "chamfer", "emd"])
    p.add_argument("--dpdist_ckpt", default=None)
    p.add_argument("--num_point", type=int, default=1024)
    p.add_argument("--max_loops", type=int, default=8)
    p.add_argument("--out_features", type=int, default=1024)
    p.add_argument("--encoder", default="pointnet",
                   choices=["pointnet", "pointnet_avg", "3dmfv"],
                   help="siamese encoder (ipcr_model.py:198-233 pointnet; "
                        ":29-52 3dmfv inception)")
    p.add_argument("--families", nargs="+", default=["chair"])
    p.add_argument("--n_templates", type=int, default=16)
    p.add_argument("--max_rotate_deg", type=float, default=45.0)
    p.add_argument("--log_dir", default="runs/pcrnet")
    p.add_argument("--batches_per_epoch", type=int, default=32)
    p.add_argument("--s_rand_points", type=float, default=0.0)
    p.add_argument("--sparse", type=int, default=0, choices=[0, 1, 2],
                   help="disjoint template/source split (reference "
                        "SPARSE_SAMPLING; the canonical bash uses 1)")
    p.add_argument("--centroid_sub", type=int, default=1,
                   help="subtract the source centroid (canonical bash: 0)")
    p.add_argument("--noise_prob", type=float, default=0.0)
    p.add_argument("--occlusion_fraction", type=float, default=0.0,
                   help="train-time kNN-ball occlusion of sources "
                        "(the evaluator's --add_occlusions, applied during "
                        "training like the reference's OCCLUSIONS knob)")
    p.add_argument("--templates_h5", default=None)
    p.add_argument("--resume", default=None, help="PCRNet checkpoint base path")
    p.add_argument("--action_reg", type=float, default=0.0,
                   help="L1 penalty on the predicted pose magnitude of "
                        "the LATE half of the train_single rollout — "
                        "teaches the policy to emit the identity once "
                        "converged (fix for the no-stop@50 translation "
                        "drift, results/fixed_point_bias.json)")
    p.add_argument("--fp_reg", type=float, default=0.0,
                   help="L1 penalty on the actions of a --fp_steps rollout "
                        "started from the GT-ALIGNED source (noise and "
                        "sparse-split asymmetry preserved) — unlike "
                        "--action_reg this conditions at the actual fixed "
                        "point the 50-iter no-stop evaluator dwells in")
    p.add_argument("--fp_steps", type=int, default=4,
                   help="rollout length of the fp_reg aligned-state rollout")
    p.add_argument("--train_single", action="store_true",
                   help="supervise every refinement iteration (reference --train_single)")
    p.add_argument("--eval_cases", type=int, default=64,
                   help="in-training validation cases (per-family slices "
                        "need enough cases per family)")
    p.add_argument("--select_family", default=None,
                   help="best-ckpt selection on this family's eval slice "
                        "(multi-family pooled rot err is symmetry-diluted)")
    p.add_argument("--archive_to", default=None,
                   help="base path (no extension) to copy pcrnet_ckpt_best "
                        "to on every improvement, e.g. results/policy_x "
                        "(wipe-resilience: runs/ is gitignored and has been "
                        "destroyed by container replacement twice)")
    a = p.parse_args(argv)

    from dpdist_tpu.configs import PCRNetConfig
    from dpdist_tpu.data.registration import RegistrationDataset
    from dpdist_tpu.train.pcrnet_trainer import PCRNetTrainer

    dpdist = None
    if a.loss_type == "dpdist":
        if not a.dpdist_ckpt:
            raise SystemExit("--loss_type dpdist requires --dpdist_ckpt")
        from dpdist_tpu.cli.train_aue import load_dpdist_checkpoint

        dpdist = load_dpdist_checkpoint(a.dpdist_ckpt)

    pcfg = PCRNetConfig(num_point=a.num_point, max_loops=a.max_loops,
                        out_features=a.out_features, encoder=a.encoder)
    tcfg = train_config_from_args(a)

    trainer = PCRNetTrainer(pcfg, tcfg, loss_type=a.loss_type, dpdist=dpdist,
                            train_single=a.train_single,
                            action_reg=a.action_reg,
                            fp_reg=a.fp_reg, fp_steps=a.fp_steps,
                            run_dir=a.log_dir, mesh=mesh_from_args(a))
    if a.resume:
        trainer.restore(a.resume)
    ds_kw = dict(h5_path=a.templates_h5, families=tuple(a.families),
                 n_templates=a.n_templates, num_point=a.num_point,
                 max_rotate_deg=a.max_rotate_deg, sparse=a.sparse,
                 s_rand_points=a.s_rand_points,
                 centroid_sub=bool(a.centroid_sub))
    ds = RegistrationDataset(seed=a.seed, **ds_kw)
    eval_ds = RegistrationDataset(seed=a.seed + 10 ** 6, **ds_kw)
    best = trainer.fit(ds, epochs=tcfg.max_epoch,
                       batches_per_epoch=a.batches_per_epoch,
                       eval_dataset=eval_ds,
                       eval_cases=a.eval_cases,
                       select_family=a.select_family,
                       archive_to=a.archive_to,
                       random_points_prob=a.s_rand_points,
                       noise_prob=a.noise_prob,
                       occlusion_fraction=a.occlusion_fraction)
    print(f"best checkpoint: {best}")


if __name__ == "__main__":
    main()
