"""Run a frozen serving artifact on point clouds — the consumer side of
the meta-graph handoff.

The reference's downstream processes reload the frozen net with
`tf.train.import_meta_graph(... input_map=...)` and sess.run it
(iterative_PCRNet_ours.py:229-245); this CLI is that import side for the
jax.export artifacts written by `cli.export_serving`: load the
StableHLO, feed clouds from .ply/.npy/.xyz files (or a synthetic pair),
and write the outputs.

  # registration policy: (template, source) -> (T_pred, aligned)
  python -m dpdist_tpu.cli.run_serving --artifact policy.pcrnet \
      --template t.ply --source s.ply --out_aligned aligned.ply \
      --out_json result.json

  # frozen distance (optionally with d/d src when exported --with_grad)
  python -m dpdist_tpu.cli.run_serving --artifact model.dpdist \
      --template t.ply --source s.ply

  # smoke/benchmark without files
  python -m dpdist_tpu.cli.run_serving --artifact policy.pcrnet \
      --synthetic chair --bench 20
"""

from __future__ import annotations

import argparse
import json
import time


def _read_cloud(path: str):
    import numpy as np

    if path.endswith(".npy"):
        pts = np.load(path)
    elif path.endswith(".ply"):
        from dpdist_tpu.data.io import read_ply

        pts = read_ply(path)
    else:
        from dpdist_tpu.data.io import read_xyz_txt

        pts = read_xyz_txt(path)
    pts = np.asarray(pts, np.float32)
    if pts.ndim == 2:
        pts = pts[None]
    if pts.ndim != 3 or pts.shape[-1] != 3:
        raise SystemExit(f"{path}: expected (N, 3) or (B, N, 3) points, "
                         f"got {pts.shape}")
    return pts


def _fit_points(pts, n: int, *, resample: bool, what: str):
    """Match the artifact's per-cloud point count."""
    import numpy as np

    if pts.shape[1] == n:
        return pts
    if pts.shape[1] > n and resample:
        idx = np.random.default_rng(0).permutation(pts.shape[1])[:n]
        return pts[:, idx]
    raise SystemExit(
        f"{what} has {pts.shape[1]} points but the artifact serves "
        f"{n}-point clouds; pass --resample to subsample (inputs with "
        f"fewer points cannot be upsampled)")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--artifact", required=True,
                   help="file written by cli.export_serving")
    p.add_argument("--template", default=None, help=".ply/.npy/.xyz cloud "
                   "(target for distance artifacts)")
    p.add_argument("--source", default=None)
    p.add_argument("--synthetic", default=None, metavar="FAMILY",
                   help="generate a template/source pair from a synthetic "
                        "family (chair/sphere/box/cylinder/torus) instead "
                        "of reading files")
    p.add_argument("--max_rotate_deg", type=float, default=45.0,
                   help="synthetic: pose magnitude of the source")
    p.add_argument("--resample", action="store_true",
                   help="random-subsample inputs to the artifact's point "
                        "count when they have more points")
    p.add_argument("--out_aligned", default=None,
                   help="registration: write the aligned source cloud "
                        "(.ply or .npy)")
    p.add_argument("--out_json", default=None,
                   help="write outputs (transform / distances) as JSON")
    p.add_argument("--bench", type=int, default=0, metavar="N",
                   help="also time N repeat calls (after one warmup)")
    a = p.parse_args(argv)

    import numpy as np

    from dpdist_tpu.serving import load_exported

    exported = load_exported(a.artifact)
    in_avals = list(exported.in_avals)
    if len(in_avals) != 2:
        raise SystemExit(f"artifact takes {len(in_avals)} inputs; this "
                         "runner serves the 2-cloud artifacts "
                         "(registration / frozen distance)")
    npoint = int(in_avals[0].shape[1])
    bdim = in_avals[0].shape[0]
    static_batch = int(bdim) if isinstance(bdim, int) else None

    if a.synthetic:
        from dpdist_tpu.data.registration import RegistrationDataset

        ds = RegistrationDataset(families=(a.synthetic,), n_templates=4,
                                 num_point=npoint,
                                 max_rotate_deg=a.max_rotate_deg, seed=0,
                                 sparse=1, s_rand_points=1.0,
                                 centroid_sub=False)
        template, source, _ = ds.sample_batch(static_batch or 1)
    elif a.template and a.source:
        template = _fit_points(_read_cloud(a.template), npoint,
                               resample=a.resample, what="--template")
        source = _fit_points(_read_cloud(a.source), npoint,
                             resample=a.resample, what="--source")
        if template.shape[0] != source.shape[0]:
            raise SystemExit("template and source batch sizes differ: "
                             f"{template.shape[0]} vs {source.shape[0]}")
    else:
        raise SystemExit("pass --template AND --source, or --synthetic")

    # honor a static exported batch by tiling the tail pair, then
    # slicing the outputs back to the true batch
    true_b = template.shape[0]
    if static_batch is not None and true_b != static_batch:
        if true_b > static_batch:
            raise SystemExit(f"artifact serves batch={static_batch}, got "
                             f"{true_b} pairs; split the input")
        reps = [1] * (static_batch - true_b)
        template = np.concatenate([template, template[-1:].repeat(len(reps), 0)])
        source = np.concatenate([source, source[-1:].repeat(len(reps), 0)])

    t0 = time.perf_counter()
    outs = exported.call(template, source)
    outs = [np.asarray(o)[:true_b] for o in
            (outs if isinstance(outs, (tuple, list)) else (outs,))]
    first_ms = 1e3 * (time.perf_counter() - t0)

    is_registration = outs[0].ndim == 3 and outs[0].shape[-2:] == (4, 4)
    result = {"artifact": a.artifact, "batch": true_b, "num_point": npoint,
              "platforms": list(exported.platforms),
              "first_call_ms": round(first_ms, 2)}
    if is_registration:
        T_pred, aligned = outs[0], outs[1]
        from dpdist_tpu.geometry.rotations import matrix_to_euler_zyx

        result["T_pred"] = T_pred.tolist()
        rx, ry, rz = matrix_to_euler_zyx(T_pred[:, :3, :3])
        result["euler_deg"] = np.degrees(
            np.stack([np.asarray(rx), np.asarray(ry), np.asarray(rz)],
                     -1)).tolist()
        result["translation"] = T_pred[:, :3, 3].tolist()
        if a.out_aligned:
            if a.out_aligned.endswith(".npy"):
                np.save(a.out_aligned, aligned)
            else:
                from dpdist_tpu.data.io import write_ply

                write_ply(a.out_aligned, aligned[0])
            result["out_aligned"] = a.out_aligned
    else:
        result["distance"] = np.asarray(outs[0]).reshape(-1).tolist()
        if len(outs) > 1:  # exported --with_grad
            result["grad_norm_per_pair"] = np.linalg.norm(
                np.asarray(outs[1]).reshape(true_b, -1), axis=-1).tolist()

    if a.bench:
        for o in exported.call(template, source):  # warmup again
            np.asarray(o)
        t0 = time.perf_counter()
        for _ in range(a.bench):
            outs_b = exported.call(template, source)
            for o in (outs_b if isinstance(outs_b, (tuple, list))
                      else (outs_b,)):
                np.asarray(o)
        result["bench_ms_per_call"] = round(
            1e3 * (time.perf_counter() - t0) / a.bench, 3)

    if a.out_json:
        with open(a.out_json, "w") as f:
            json.dump(result, f, indent=1)
    # keep the console line compact: the full 4x4s live in --out_json
    brief = {k: v for k, v in result.items() if k != "T_pred"}
    print(json.dumps(brief))


if __name__ == "__main__":
    main()
