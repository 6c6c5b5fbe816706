"""Compare DPDist / chamfer / EMD sensitivity on perturbation sweeps.

Produces the paper-style comparison table: for each perturbation kind and
magnitude, the mean score of each metric; plus the resample-invariance
check (two samplings of the same surface should score near zero).
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dpdist_ckpt", required=True)
    p.add_argument("--families", nargs="+", default=["chair"])
    p.add_argument("--n_surfaces", type=int, default=8)
    p.add_argument("--num_point", type=int, default=64)
    p.add_argument("--kinds", nargs="+",
                   default=["resample", "noise", "deform", "translate", "occlude"])
    p.add_argument("--out", default=None, help="write JSON report here")
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args(argv)

    from dpdist_tpu.cli.train_aue import load_dpdist_checkpoint
    from dpdist_tpu.data.synthetic import synthetic_surface
    from dpdist_tpu.eval.comparison import perturbation_sweep, monotonicity

    cfg, params, state = load_dpdist_checkpoint(a.dpdist_ckpt)
    surfaces = np.stack([
        synthetic_surface(a.families[i % len(a.families)], seed=a.seed + i,
                          n_points=max(4 * a.num_point, 512)) * 0.8
        for i in range(a.n_surfaces)
    ])

    report = {}
    for kind in a.kinds:
        mags = ([0.0] if kind == "resample"
                else [0.0, 0.1, 0.25, 0.5] if kind == "occlude"
                else [0.0, 0.02, 0.05, 0.1, 0.2])
        sweep = perturbation_sweep(params, state, cfg, surfaces, kind=kind,
                                   magnitudes=mags, num_point=a.num_point,
                                   seed=a.seed)
        sweep["dpdist_monotonicity"] = monotonicity(sweep["dpdist"])
        report[kind] = sweep
        print(f"== {kind} ==")
        print("  mag    dpdist   chamfer    emd")
        for i, m in enumerate(sweep["magnitudes"]):
            print(f"  {m:5.2f}  {sweep['dpdist'][i]:8.4f} "
                  f"{sweep['chamfer'][i]:8.4f} {sweep['emd'][i]:8.4f}")

    if a.out:
        with open(a.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"report written to {a.out}")


if __name__ == "__main__":
    main()
