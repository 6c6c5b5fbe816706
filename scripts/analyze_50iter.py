#!/usr/bin/env python3
"""50-iteration no-stop stability analysis (VERDICT r3 #3).

The reference's canonical evaluator runs refinement for 50 iterations
with no stopping criterion (results_itrPCRNet_no_stop.py:331-335). The
round-3 multifam flagship degraded under it (translation drift of a
period-2 flip cycle). This script compares every group-C candidate's
chair-slice metrics at 50 iterations against the SAME checkpoint's
8-iteration fixed-pose eval, and applies the done-criterion:
acc@(2.5deg, 0.05) at 50 iters >= its value at 8 iters.

Emits results/eval50_r4/comparison.json and a markdown table.
"""

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# model key in runs/eval50_r4 -> its 8-iteration eval JSON
PAIRS = {
    # 8-iter anchors all POST-template-fix (rebaseline_postfix.sh): the
    # results/multifam_r3 anchors were pre-fix template draws and are
    # not comparable with the post-fix 50-iter cells (RESULTS.md, round-4
    # template-nondeterminism section)
    "mf1200clip": "runs/eval_r4_mf/mf1200clip_clean.json",
    "mf_dpdist_tsn": "runs/eval_r4_mf/mf_dpdist_tsn_clean.json",
    "mf_chamfer_tsn": "runs/eval_r4_mf/mf_chamfer_tsn_clean.json",
    "mf_ts_s1_dpdist": "runs/eval_r4_mf/mf_ts_s1_dpdist_clean.json",
    # the round-3 flagship itself, for the before/after row
    "mf_dpdist_ts": "runs/eval_r4_mf/mf_dpdist_ts_clean.json",
    # its chamfer counterpart (rebaseline stage 2): under no-stop@50 the
    # chamfer-ts policy additionally blows up ROTATION on the symmetric
    # families (torus 118 deg, cylinder 88 deg pooled into 52.9 vs
    # dpdist's 22.1), so dpdist's failure is translation-only drift
    # while chamfer's policy diverges rotationally off-chair
    "mf_chamfer_ts": "runs/eval_r4_mf/mf_chamfer_ts_clean.json",
    # round-4 trainings (groups D/E): noise+clip flagship candidates and
    # the clipped-recipe seed replicas
    "mf_tsn1200clip_dpdist": "runs/eval_r4_mf/mf_tsn1200clip_dpdist_clean.json",
    "mf_tsn1200clip_chamfer": "runs/eval_r4_mf/mf_tsn1200clip_chamfer_clean.json",
    # 16-iteration BPTT horizon (group C finding: EVERY 8-iteration-
    # trained multifam recipe drifts in translation under no-stop@50,
    # incl. noise-trained chamfer — the policy's converged-state output
    # is a constant small translation the 8-step horizon never
    # penalizes; doubling the horizon doubles the visible accumulated
    # bias and trains through 8 extra converged-state iterations)
    "mf_loops16_dpdist": "runs/eval_r4_mf/mf_loops16_dpdist_clean.json",
    "mf_loops16_chamfer": "runs/eval_r4_mf/mf_loops16_chamfer_clean.json",
    # action-regularized candidate: L1 penalty on late-rollout pose
    # magnitude (--action_reg), teaching the policy to emit the identity
    # at converged states — the other direct fix for the measured
    # constant fixed-point bias (results/fixed_point_bias.json)
    "mf_ar_dpdist": "runs/eval_r4_mf/mf_ar_dpdist_clean.json",
    "mf_ts1200clip_s1_dpdist": "runs/eval_r4_mf/mf_ts1200clip_s1_dpdist_clean.json",
    "mf_ts1200clip_s2_dpdist": "runs/eval_r4_mf/mf_ts1200clip_s2_dpdist_clean.json",
    # round-5 seed replicas of the recipe that PASSES no-stop@50
    "mf_tsn1200clip_s1_dpdist":
        "runs/eval_r4_mf/mf_tsn1200clip_s1_dpdist_clean.json",
    "mf_tsn1200clip_s2_dpdist":
        "runs/eval_r4_mf/mf_tsn1200clip_s2_dpdist_clean.json",
    # seed replica of the chamfer twin (the single-seed cell behind the
    # "dpdist-loss is what makes it stable" conclusion)
    "mf_tsn1200clip_s1_chamfer":
        "runs/eval_r4_mf/mf_tsn1200clip_s1_chamfer_clean.json",
}

# noise-template twin of the no-stop@50 protocol (round-5: the passing
# recipes re-run under the corruption column; 8-iter anchors from the
# group-D noise cells)
NOISE_PAIRS = {
    "mf_tsn1200clip_dpdist": "runs/eval_r4_mf/mf_tsn1200clip_dpdist_noise.json",
    "mf_loops16_dpdist": "runs/eval_r4_mf/mf_loops16_dpdist_noise.json",
}


def chair(d):
    pf = (d or {}).get("per_family") or {}
    return pf.get("chair") or d


def load(rel):
    p = os.path.join(ROOT, rel)
    return json.load(open(p)) if os.path.exists(p) else None


def main():
    out = {}
    rows = []
    for key, p8 in PAIRS.items():
        d50 = load(f"runs/eval50_r4/{key}_clean.json") or \
            load(f"runs/eval50_r3/{key}.json")
        d8 = load(p8)
        if d50 is None or d8 is None:
            continue
        c50, c8 = chair(d50), chair(d8)
        rec = {
            "rot8": c8["rot_err_mean_deg"], "rot50": c50["rot_err_mean_deg"],
            "te8": c8["trans_err_mean"], "te50": c50["trans_err_mean"],
            "acc8": c8["acc_rot2.5_trans0.05"],
            "acc50": c50["acc_rot2.5_trans0.05"],
        }
        rec["stable"] = bool(rec["acc50"] >= rec["acc8"] - 1e-9)
        out[key] = rec
        rows.append(
            f"| {key} | {rec['rot8']:.2f} -> {rec['rot50']:.2f} "
            f"| {rec['te8']:.4f} -> {rec['te50']:.4f} "
            f"| {100*rec['acc8']:.1f}% -> {100*rec['acc50']:.1f}% "
            f"| {'PASS' if rec['stable'] else 'FAIL'} |")

    print("| Model (chair slice) | rot err 8->50 | trans err 8->50 "
          "| acc@2.5/0.05 8->50 | no-stop stable |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(r)

    noise_rows = []
    for key, p8 in NOISE_PAIRS.items():
        d50 = load(f"runs/eval50_noise_r5/{key}_noise.json")
        d8 = load(p8)
        if d50 is None or d8 is None:
            continue
        c50, c8 = chair(d50), chair(d8)
        rec = {
            "rot8": c8["rot_err_mean_deg"], "rot50": c50["rot_err_mean_deg"],
            "te8": c8["trans_err_mean"], "te50": c50["trans_err_mean"],
            "acc8": c8["acc_rot2.5_trans0.05"],
            "acc50": c50["acc_rot2.5_trans0.05"],
        }
        rec["stable"] = bool(rec["acc50"] >= rec["acc8"] - 1e-9)
        out[f"{key}_noise"] = rec
        noise_rows.append(
            f"| {key} (noise) | {rec['rot8']:.2f} -> {rec['rot50']:.2f} "
            f"| {rec['te8']:.4f} -> {rec['te50']:.4f} "
            f"| {100*rec['acc8']:.1f}% -> {100*rec['acc50']:.1f}% "
            f"| {'PASS' if rec['stable'] else 'FAIL'} |")
    if noise_rows:
        print("\nNoise-template twin (corruption column, no-stop@50):")
        for r in noise_rows:
            print(r)

    # Group F: the same 50-iteration eval WITH the convergence-stopping
    # protocol (--stop_threshold 1e-7). Reported next to the no-stop row
    # so the rescue question is answered in one table. Note group F runs
    # 1,014 cases (the r3 eval50 protocol) vs group C's full set, so
    # compare acc against the no-stop 50-iter value, not the 8-iter one.
    stop_rows = []
    for tag, dirname, label in (
            ("stopthr", "eval50stop_r4", "+stop@1e-7"),
            ("stopthr_p2c", "eval50stop2_r4", "+p2-chamfer@1e-3"),
            ("stopthr_p2p0", "eval50stop4_r4", "+p2-period0@1e-3"),
            # parity-exact pick at the FULL 5,070-pose protocol —
            # directly comparable with the group-C 8-iter anchors
            ("stopthr_p2p0full", "eval50stop_p2p0_full",
             "+p2-period0@1e-3 FULL")):
        for key in ("mf_dpdist_ts", "mf_dpdist_tsn"):
            ds = load(f"runs/{dirname}/{key}_clean.json")
            if ds is None:
                continue
            cs = chair(ds)
            rec = {
                "rot50_stop": cs["rot_err_mean_deg"],
                "te50_stop": cs["trans_err_mean"],
                "acc50_stop": cs["acc_rot2.5_trans0.05"],
                "converged_frac": ds.get("converged_frac"),
                "converge_iter_mean": ds.get("converge_iter_mean"),
            }
            out[f"{key}_{tag}"] = rec
            stop_rows.append(
                f"| {key} {label} | rot {rec['rot50_stop']:.2f} "
                f"| trans {rec['te50_stop']:.4f} "
                f"| acc@2.5 {100*rec['acc50_stop']:.1f}% "
                f"| converged {rec['converged_frac']:.2f}"
                + (f" @iter {rec['converge_iter_mean']:.1f}"
                   if rec.get("converge_iter_mean") is not None else "")
                + " |")
    if stop_rows:
        print("\nGroup F (convergence-stopping protocol, 1,014 cases):")
        for r in stop_rows:
            print(r)

    dst = os.path.join(ROOT, "results", "eval50_r4", "comparison.json")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    json.dump(out, open(dst, "w"), indent=1)
    print(f"\nwrote {dst}")


if __name__ == "__main__":
    main()
