"""Registration evaluation (reference: results_itrPCRNet_no_stop.py).

Fixed-iteration refinement without early stop; writes the report JSON,
per-case CSV, and per-iteration error curves.
"""

from __future__ import annotations

import argparse
import json

import jax


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True, help="PCRNetTrainer checkpoint base path")
    p.add_argument("--iterations", type=int, default=50)
    p.add_argument("--num_cases", type=int, default=None,
                   help="default: all poses in --pose_file, else 512")
    p.add_argument("--num_point", type=int, default=1024)
    p.add_argument("--families", nargs="+", default=["chair"])
    p.add_argument("--n_templates", type=int, default=16)
    p.add_argument("--max_rotate_deg", type=float, default=45.0)
    p.add_argument("--templates_h5", default=None)
    p.add_argument("--report_dir", default="runs/registration_eval")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--s_rand_points", type=float, default=0.0)
    p.add_argument("--sparse", type=int, default=0, choices=[0, 1, 2],
                   help="disjoint template/source split (reference "
                        "SPARSE_SAMPLING; the canonical bash uses 1)")
    p.add_argument("--centroid_sub", type=int, default=1,
                   help="subtract the source centroid (the reference "
                        "evaluator forces 0 on the sparse path)")
    p.add_argument("--use_noise_data", action="store_true",
                   help="per-point gaussian noise on sources (helper.add_noise)")
    p.add_argument("--add_occlusions", type=float, default=0.0,
                   help="fraction of each source removed as a kNN ball")
    p.add_argument("--pose_file", default=None,
                   help="fixed-pose CSV ('default' = the committed "
                        "5,070-pose set; num_cases then defaults to all)")
    p.add_argument("--stop_threshold", type=float, default=None,
                   help="convergence-stopping protocol: freeze each case "
                        "once ||T@T_prev^-1 - I||_F^2 < threshold (the "
                        "reference defines this check with --threshold "
                        "1e-7 but ships it disabled, "
                        "results_itrPCRNet_no_stop.py:366-375)")
    p.add_argument("--stop_period", type=int, default=1,
                   help="compare against the transform from N iterations "
                        "back (2 detects period-2 flip limit cycles whose "
                        "per-iteration CE is pinned at ~8)")
    p.add_argument("--stop_select", default="last",
                   choices=["last", "chamfer", "period0"],
                   help="transform kept at convergence: 'last' (reference "
                        "semantics) or 'chamfer' (better-aligned of the "
                        "two most recent cycle states, GT-free)")
    a = p.parse_args(argv)

    from dpdist_tpu.configs import PCRNetConfig
    from dpdist_tpu.data.registration import RegistrationDataset
    from dpdist_tpu.eval.registration import evaluate_registration
    from dpdist_tpu.models import init_pcrnet
    from dpdist_tpu.train.checkpoint import restore_params_maybe_state

    with open(a.ckpt + ".json") as f:
        meta = json.load(f)["metadata"]
    pcfg = PCRNetConfig.from_json(meta["pcrnet_config"])
    template_params, template_state = init_pcrnet(jax.random.PRNGKey(0), pcfg)
    params, state, _ = restore_params_maybe_state(
        a.ckpt, template_params, template_state)

    pose_file = a.pose_file
    num_cases = a.num_cases
    if pose_file == "default":
        from dpdist_tpu.data.registration import default_eval_poses

        pose_file = default_eval_poses()
    if num_cases is None:
        if pose_file is not None:
            from dpdist_tpu.data.io import read_pose_csv

            num_cases = len(read_pose_csv(pose_file))
        else:
            num_cases = 512

    ds = RegistrationDataset(h5_path=a.templates_h5, families=tuple(a.families),
                             n_templates=a.n_templates, num_point=pcfg.num_point,
                             max_rotate_deg=a.max_rotate_deg, seed=a.seed,
                             sparse=a.sparse, s_rand_points=a.s_rand_points,
                             centroid_sub=bool(a.centroid_sub),
                             pose_file=pose_file)
    if a.use_noise_data or a.add_occlusions > 0:
        from dpdist_tpu.data.registration import PerturbedRegistrationDataset

        ds = PerturbedRegistrationDataset(ds, noise=a.use_noise_data,
                                          occlusion_fraction=a.add_occlusions)
    report = evaluate_registration(params, pcfg, ds,
                                   num_cases=num_cases,
                                   iterations=a.iterations,
                                   report_dir=a.report_dir, state=state,
                                   stop_threshold=a.stop_threshold,
                                   stop_period=a.stop_period,
                                   stop_select=a.stop_select)
    print(json.dumps({k: v for k, v in report.items()
                      if not k.startswith("curve_")}, indent=2))


if __name__ == "__main__":
    main()
