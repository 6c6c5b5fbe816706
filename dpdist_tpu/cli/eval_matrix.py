"""Evaluate several PCRNet checkpoints across several conditions in ONE
process, reusing the compiled evaluation program.

The bash-style matrix (one eval_registration process per cell, like the
reference's results_itrPCRNet_no_stop invocations) pays a jit compile
per process — minutes each through a remote-compile tunnel. All cells
share one program here (same shapes), so the matrix compiles once.

Usage:
  python -m dpdist_tpu.cli.eval_matrix \
      --ckpts chamfer=<base> dpdist=<base> \
      --conditions clean noise occl --out_dir runs/matrix_eval ...
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpts", nargs="+", required=True,
                   help="name=checkpoint_base pairs")
    p.add_argument("--conditions", nargs="+", default=["clean"],
                   choices=["clean", "noise", "occl"], type=str)
    p.add_argument("--occlusion_fraction", type=float, default=0.25)
    p.add_argument("--iterations", type=int, default=8)
    p.add_argument("--num_cases", type=int, default=None,
                   help="default: all poses in --pose_file, else 512")
    p.add_argument("--num_point", type=int, default=None,
                   help="defaults to the checkpoint's num_point")
    p.add_argument("--families", nargs="+", default=["chair"])
    p.add_argument("--n_templates", type=int, default=64)
    p.add_argument("--max_rotate_deg", type=float, default=45.0)
    p.add_argument("--sparse", type=int, default=0, choices=[0, 1, 2])
    p.add_argument("--s_rand_points", type=float, default=0.0)
    p.add_argument("--centroid_sub", type=int, default=1)
    p.add_argument("--seed", type=int, default=777)
    p.add_argument("--pose_file", default=None,
                   help="fixed-pose CSV for protocol parity "
                        "(results_itrPCRNet_no_stop.py:250-309); 'default' "
                        "uses the committed 5,070-pose set and, unless "
                        "--num_cases is given, evaluates ALL of them")
    p.add_argument("--stop_threshold", type=float, default=None,
                   help="enable the convergence-stopping protocol "
                        "(see eval_registration --stop_threshold)")
    p.add_argument("--stop_period", type=int, default=1,
                   help="period-N convergence check (see eval_registration)")
    p.add_argument("--stop_select", default="last",
                   choices=["last", "chamfer", "period0"],
                   help="transform kept at convergence (see eval_registration)")
    p.add_argument("--out_dir", default="runs/matrix_eval")
    p.add_argument("--skip_existing", action="store_true",
                   help="reuse per-cell JSONs already in out_dir "
                        "(resume a crashed matrix)")
    a = p.parse_args(argv)

    import jax

    from dpdist_tpu.configs import PCRNetConfig
    from dpdist_tpu.data.registration import (
        PerturbedRegistrationDataset,
        RegistrationDataset,
    )
    from dpdist_tpu.eval.registration import evaluate_registration
    from dpdist_tpu.models import init_pcrnet
    from dpdist_tpu.train.checkpoint import restore_params_maybe_state

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

    os.makedirs(a.out_dir, exist_ok=True)
    rows = []
    for spec in a.ckpts:
        name, _, base = spec.partition("=")
        if not base:
            name, base = os.path.basename(spec), spec
        with open(base + ".json") as f:
            meta = json.load(f)["metadata"]
        cfg = PCRNetConfig.from_json(meta["pcrnet_config"])
        tp, ts = init_pcrnet(jax.random.PRNGKey(0), cfg)
        params, state, _ = restore_params_maybe_state(base, tp, ts)

        for cond in a.conditions:
            def fmt(tag, r, _n=name, _c=cond):
                return (f"{_n:10s} {_c:6s} {tag:10s} "
                        f"rot {r['rot_err_mean_deg']:7.2f} "
                        f"trans {r['trans_err_mean']:.4f} "
                        f"acc2.5 {r['acc_rot2.5_trans0.05']:.3f} "
                        f"acc5 {r['acc_rot5.0_trans0.05']:.3f} "
                        f"acc10 {r['acc_rot10.0_trans0.1']:.3f} "
                        f"acc20 {r['acc_rot20.0_trans0.2']:.3f}")

            cell_json = os.path.join(a.out_dir, f"{name}_{cond}.json")
            if a.skip_existing and os.path.exists(cell_json):
                # resumability (a full-disk crash mid-matrix should not
                # cost a re-eval of every finished cell)
                rep = json.load(open(cell_json))
                for tag, r in [("all", rep)] + list(
                        rep.get("per_family", {}).items()):
                    row = fmt(tag, r)
                    rows.append(row)
                    print(row + "  (cached)", flush=True)
                continue
            ds = RegistrationDataset(
                families=tuple(a.families), n_templates=a.n_templates,
                num_point=a.num_point or cfg.num_point,
                max_rotate_deg=a.max_rotate_deg, seed=a.seed,
                sparse=a.sparse, s_rand_points=a.s_rand_points,
                centroid_sub=bool(a.centroid_sub), pose_file=pose_file)
            if cond != "clean":
                ds = PerturbedRegistrationDataset(
                    ds, noise=(cond == "noise"),
                    occlusion_fraction=(a.occlusion_fraction
                                        if cond == "occl" else 0.0))
            rep = evaluate_registration(
                params, cfg, ds, num_cases=num_cases,
                iterations=a.iterations, state=state,
                stop_threshold=a.stop_threshold, stop_period=a.stop_period,
                stop_select=a.stop_select,
                report_dir=os.path.join(a.out_dir, f"eval_{name}_{cond}"))
            with open(os.path.join(a.out_dir, f"{name}_{cond}.json"),
                      "w") as f:
                json.dump(rep, f, indent=2)

            row = fmt("all", rep)
            rows.append(row)
            print(row, flush=True)
            for fam, fr in rep.get("per_family", {}).items():
                frow = fmt(fam, fr)
                rows.append(frow)
                print(frow, flush=True)
    with open(os.path.join(a.out_dir, "summary.txt"), "w") as f:
        f.write("\n".join(rows) + "\n")


if __name__ == "__main__":
    main()
