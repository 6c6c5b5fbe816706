#!/usr/bin/env python3
"""Fixed-point bias of iterative-PCRNet policies (round-4 diagnosis).

Group C showed EVERY 8-iteration-trained multifam policy accumulates
translation error at ~1e-3/step under the reference's no-stop
50-iteration protocol (results_itrPCRNet_no_stop.py:331-335 semantics),
while the single-family policies do not. Hypothesized mechanism: the
policy's output at an ALIGNED (converged) state is a small per-case
translation bias b whose accumulation an 8-step training horizon never
makes visible to the loss. This script measures the bias directly:

  1. one-step bias: feed perfectly aligned identity-pose sparse pairs
     (template and source = disjoint 64-point subsets of the same
     surface — the canonical converged state) and record the predicted
     ||translation|| and rotation angle of ONE policy step;
  2. drift-from-identity: run the full 50-iteration refinement from the
     aligned state and record the final translation/rotation error of
     the composed transform (ground truth = identity).

Usage: DPDIST_PLATFORM=cpu python scripts/measure_fixed_point_bias.py
Writes results/fixed_point_bias.json and prints a markdown table.
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.chdir(ROOT)

if os.environ.get("DPDIST_PLATFORM", "cpu") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

MF = dict(families=("chair", "sphere", "box", "cylinder", "torus"),
          n_templates=125)
CHAIR = dict(families=("chair",), n_templates=64)

MODELS = {
    # multifam candidates (all drift under no-stop@50)
    "mf_dpdist_ts": ("runs/multifam_r3/pcr_dpdist_ts/pcrnet_ckpt_best", MF),
    "mf_dpdist_tsn": ("runs/multifam_r3/pcr_dpdist_tsn/pcrnet_ckpt_best", MF),
    "mf_chamfer_tsn": ("runs/multifam_r3/pcr_chamfer_tsn/pcrnet_ckpt_best", MF),
    "mf1200clip": ("runs/r4/mf_ts1200clip_dpdist/pcrnet_ckpt_best", MF),
    # round-4 horizon-fix candidates (evaluated when trained)
    "mf_loops16_dpdist": ("runs/r4/mf_loops16_dpdist/pcrnet_ckpt_best", MF),
    "mf_ar_dpdist": ("runs/r4/mf_ar_dpdist/pcrnet_ckpt_best", MF),
    "mf_tsn1200clip_dpdist":
        ("runs/r4/mf_tsn1200clip_dpdist/pcrnet_ckpt_best", MF),
    # single-family controls (stable under no-stop@50)
    "ts_dpdist": ("runs/ts_dpdist/pcrnet_ckpt_best", CHAIR),
    "tsn_dpdist": ("runs/ts_noise/pcr_dpdist/pcrnet_ckpt_best", CHAIR),
    "tsn_chamfer": ("runs/ts_noise/pcr_chamfer/pcrnet_ckpt_best", CHAIR),
}

N_CASES = 500
BATCH = 100
ITERS = 50


def rot_angle_deg_from_R(R):
    tr = np.clip((np.trace(R, axis1=-2, axis2=-1) - 1.0) / 2.0, -1.0, 1.0)
    return np.degrees(np.arccos(tr))


def measure(name, ckpt, proto):
    from dpdist_tpu.configs import PCRNetConfig
    from dpdist_tpu.data.registration import RegistrationDataset
    from dpdist_tpu.models import init_pcrnet
    from dpdist_tpu.models.pcrnet import pcrnet_iteration, pcrnet_refine
    from dpdist_tpu.train.checkpoint import restore_params_maybe_state

    with open(ckpt + ".json") as f:
        meta = json.load(f)["metadata"]
    cfg = PCRNetConfig.from_json(meta["pcrnet_config"])
    tp, ts = init_pcrnet(jax.random.PRNGKey(0), cfg)
    params, state, _ = restore_params_maybe_state(ckpt, tp, ts)

    # identity poses: max_rotate_deg=0 and t_clip=0 zero the sampled
    # transform; sparse=1 + s_rand_points=1.0 keeps the canonical
    # disjoint template/source split (the realistic converged state)
    ds = RegistrationDataset(families=proto["families"],
                             n_templates=proto["n_templates"],
                             num_point=cfg.num_point, max_rotate_deg=0.0,
                             t_clip=0.0, seed=777, sparse=1,
                             s_rand_points=1.0, centroid_sub=False)

    @jax.jit
    def one_step(src, tmpl):
        pose, _, _ = pcrnet_iteration(params, cfg, src, tmpl, state=state)
        return pose

    @jax.jit
    def full_refine(src, tmpl):
        _, T, _ = pcrnet_refine(params, cfg, src, tmpl, iterations=ITERS,
                                state=state)
        return T

    per_fam = {}
    for _ in range(N_CASES // BATCH):
        t, s, pose6, info = ds.sample_batch(BATCH, return_info=True)
        assert np.abs(pose6).max() == 0.0, "poses must be identity"
        pose = np.asarray(one_step(jnp.asarray(s), jnp.asarray(t)))
        T = np.asarray(full_refine(jnp.asarray(s), jnp.asarray(t)))
        t_step = np.linalg.norm(pose[:, :3], axis=-1)
        q = pose[:, 3:7] / np.linalg.norm(pose[:, 3:7], axis=-1, keepdims=True)
        r_step = np.degrees(2 * np.arccos(np.clip(np.abs(q[:, 0]), 0, 1)))
        te50 = np.linalg.norm(T[:, :3, 3], axis=-1)
        re50 = rot_angle_deg_from_R(T[:, :3, :3])
        fams = info["family"] or ["all"] * BATCH
        for i, fam in enumerate(fams):
            d = per_fam.setdefault(fam or "all", {"t1": [], "r1": [],
                                                  "te50": [], "re50": []})
            d["t1"].append(float(t_step[i]))
            d["r1"].append(float(r_step[i]))
            d["te50"].append(float(te50[i]))
            d["re50"].append(float(re50[i]))

    out = {}
    for fam, d in sorted(per_fam.items()):
        out[fam] = {
            "n": len(d["t1"]),
            "one_step_trans_mean": float(np.mean(d["t1"])),
            "one_step_rot_deg_mean": float(np.mean(d["r1"])),
            "te50_from_identity_mean": float(np.mean(d["te50"])),
            "te50_from_identity_p90": float(np.percentile(d["te50"], 90)),
            "re50_from_identity_mean": float(np.mean(d["re50"])),
        }
    pooled = {
        "one_step_trans_mean": float(np.mean(sum((d["t1"] for d in
                                                  per_fam.values()), []))),
        "te50_from_identity_mean": float(np.mean(sum((d["te50"] for d in
                                                      per_fam.values()), []))),
    }
    return {"per_family": out, "pooled": pooled}


def main():
    results = {}
    rows = []
    for name, (ckpt, proto) in MODELS.items():
        if not os.path.exists(ckpt + ".json"):
            continue
        r = measure(name, ckpt, proto)
        results[name] = r
        chair = r["per_family"].get("chair") or next(
            iter(r["per_family"].values()))
        rows.append(f"| {name} | {chair['one_step_trans_mean']:.5f} "
                    f"| {chair['one_step_rot_deg_mean']:.2f} "
                    f"| {chair['te50_from_identity_mean']:.4f} "
                    f"| {chair['re50_from_identity_mean']:.2f} |")
        print(f"done {name}", file=sys.stderr)

    print("| Model (chair slice) | one-step ||t|| | one-step rot (deg) "
          "| TE@50 from identity | RE@50 (deg) |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(r)

    dst = os.path.join(ROOT, "results", "fixed_point_bias.json")
    json.dump(results, open(dst, "w"), indent=1)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
