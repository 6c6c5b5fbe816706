"""Create registration templates h5 + pose CSVs.

Reference: pcrnet-registration/utils/data_txt_to_hdf5.py (templates) and
utils/create_dataset/generate_poses_ours.py (train/test/eval pose CSVs).
Templates come from dense GT-dataset surfaces (<root>/<class>/<id>_dist_c_scaled.txt)
or from the synthetic family.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from dpdist_tpu.data.synthetic import stable_seed


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out_dir", default="data/registration")
    p.add_argument("--data_root", default=None,
                   help="GT dataset root; falls back to synthetic surfaces")
    p.add_argument("--category", default="chair")
    p.add_argument("--families", nargs="+", default=["chair"])
    p.add_argument("--n_templates", type=int, default=16)
    p.add_argument("--num_point", type=int, default=2048)
    p.add_argument("--num_poses", type=int, default=5070)
    p.add_argument("--max_rotate_deg", type=float, default=45.0)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args(argv)

    from dpdist_tpu.data.io import write_templates_h5, write_pose_csv
    from dpdist_tpu.data.registration import generate_poses

    os.makedirs(a.out_dir, exist_ok=True)
    names = []
    if a.data_root:
        from dpdist_tpu.data.io import read_xyz_txt

        paths = sorted(glob.glob(
            os.path.join(a.data_root, a.category, "*_dist_c_scaled.txt")))
        tmpl = []
        for path in paths[: a.n_templates]:
            pts = read_xyz_txt(path)
            if len(pts) < a.num_point:
                continue
            tmpl.append(pts[: a.num_point])
            names.append(os.path.basename(path))
        templates = np.stack(tmpl)
    else:
        from dpdist_tpu.data.synthetic import synthetic_surface

        templates = np.stack([
            synthetic_surface(a.families[i % len(a.families)], seed=a.seed + i,
                              n_points=a.num_point)
            for i in range(a.n_templates)
        ])
        names = [f"{a.families[i % len(a.families)]}_{i}" for i in range(a.n_templates)]

    for split in ("train", "test", "eval"):
        write_templates_h5(os.path.join(a.out_dir, f"templates_{split}.h5"),
                           templates, names)
        rng = np.random.default_rng(a.seed + stable_seed(split) % 1000)
        poses = generate_poses(a.num_poses, max_rotate_deg=a.max_rotate_deg,
                               rng=rng)
        write_pose_csv(
            os.path.join(a.out_dir,
                         f"itr_net_{split}_data{int(a.max_rotate_deg)}.csv"),
            poses)
    print(f"templates {templates.shape} + pose CSVs written to {a.out_dir}")


if __name__ == "__main__":
    main()
