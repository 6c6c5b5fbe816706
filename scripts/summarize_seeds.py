#!/usr/bin/env python3
"""Aggregate the multi-seed replication (VERDICT r3 #1) into mean +/- std
tables and restate every round-3 'dpdist wins' conclusion against the
seed spread.

Seed 0 = the round-3 recipes, seeds 1,2 = the round-4 queue retrains of
the identical recipes. ALL cells read from the post-template-fix
re-baseline (results/postfix_r4 for the canonical chair table,
results/multifam_r4 for the multifam table) so every seed is evaluated
on the SAME stable template draw in one process — the pre-fix tables
(results/canonical_fixed, results/multifam_r3) carried a per-process
template-draw term (RESULTS.md round-4 epistemic section). Emits
results/seed_spread.json and a markdown table to stdout.
"""

import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(path):
    p = os.path.join(ROOT, "results", path)
    if not os.path.exists(p):
        return None
    return json.load(open(p))


# cell -> {seed: relative json path} per eval condition
CHAIR = {
    ("clean-trained", "chamfer"): ["postfix_r4/canonical_chamfer_{c}.json",
                                   "postfix_r4/canonical_clean_s1_chamfer_{c}.json",
                                   "postfix_r4/canonical_clean_s2_chamfer_{c}.json"],
    ("clean-trained", "dpdist"): ["postfix_r4/canonical_dpdist_{c}.json",
                                  "postfix_r4/canonical_clean_s1_dpdist_{c}.json",
                                  "postfix_r4/canonical_clean_s2_dpdist_{c}.json"],
    ("noise-trained", "chamfer"): ["postfix_r4/canonical_chamfer_n_{c}.json",
                                   "postfix_r4/canonical_noise_s1_chamfer_{c}.json",
                                   "postfix_r4/canonical_noise_s2_chamfer_{c}.json"],
    ("noise-trained", "dpdist"): ["postfix_r4/canonical_dpdist_n_{c}.json",
                                  "postfix_r4/canonical_noise_s1_dpdist_{c}.json",
                                  "postfix_r4/canonical_noise_s2_dpdist_{c}.json"],
    ("train_single", "chamfer"): ["postfix_r4/canonical_chamfer_ts_{c}.json",
                                  "postfix_r4/canonical_ts_s1_chamfer_{c}.json",
                                  "postfix_r4/canonical_ts_s2_chamfer_{c}.json"],
    ("train_single", "dpdist"): ["postfix_r4/canonical_dpdist_ts_{c}.json",
                                 "postfix_r4/canonical_ts_s1_dpdist_{c}.json",
                                 "postfix_r4/canonical_ts_s2_dpdist_{c}.json"],
}

MF = {
    ("multifam ts", "chamfer"): ["multifam_r4/mf_chamfer_ts_{c}.json",
                                 "multifam_r4/mf_ts_s1_chamfer_{c}.json",
                                 "multifam_r4/mf_ts_s2_chamfer_{c}.json"],
    ("multifam ts", "dpdist"): ["multifam_r4/mf_dpdist_ts_{c}.json",
                                "multifam_r4/mf_ts_s1_dpdist_{c}.json",
                                "multifam_r4/mf_ts_s2_dpdist_{c}.json"],
}

# Round-5: seed spreads of the grad-clipped 1200-epoch recipes (the
# post-fix-TRAINED cells VERDICT r4 Weak #3 asked for). Seed 0 of the
# ts recipe is the r4 mf1200clip training; s1/s2 are the r5a chain
# replicas; the tsn (noise-trained) pair is the recipe that passes
# no-stop@50 — seed 1 trained by chain_r5b.
MF_CLIP = {
    ("ts1200clip", "dpdist"): ["multifam_r4/mf1200clip_{c}.json",
                               "multifam_r4/mf_ts1200clip_s1_dpdist_{c}.json",
                               "multifam_r4/mf_ts1200clip_s2_dpdist_{c}.json"],
    ("tsn1200clip", "dpdist"): ["multifam_r4/mf_tsn1200clip_dpdist_{c}.json",
                                "multifam_r4/mf_tsn1200clip_s1_dpdist_{c}.json",
                                "multifam_r4/mf_tsn1200clip_s2_dpdist_{c}.json"],
    ("tsn1200clip", "chamfer"): ["multifam_r4/mf_tsn1200clip_chamfer_{c}.json",
                                 "multifam_r4/mf_tsn1200clip_s1_chamfer_{c}.json"],
}


def cell_stats(paths, cond, metric="rot_err_mean_deg", family=None):
    vals = []
    for p in paths:
        d = load(p.format(c=cond))
        if d is None:
            continue
        if family is not None:
            fam = (d.get("per_family") or {}).get(family)
            if fam is None:
                continue
            vals.append(fam[metric] if metric in fam
                        else fam.get(metric.replace("_deg", "")))
        else:
            vals.append(d[metric])
    return vals


def fmt(vals):
    if not vals:
        return "-"
    if len(vals) == 1:
        return f"{vals[0]:.2f} (1 seed)"
    return f"{np.mean(vals):.2f}+/-{np.std(vals):.2f} [n={len(vals)}]"


def main():
    out = {"chair": {}, "multifam": {}}
    print("## Canonical chair, 5,070 fixed poses, rot err mean (deg)\n")
    print("| Trained as / loss | clean | noise eval | occl eval |")
    print("|---|---|---|---|")
    for (recipe, loss), paths in CHAIR.items():
        row = [fmt(cell_stats(paths, c)) for c in ("clean", "noise", "occl")]
        print(f"| {recipe} {loss} | " + " | ".join(row) + " |")
        out["chair"][f"{recipe}/{loss}"] = {
            c: cell_stats(paths, c) for c in ("clean", "noise", "occl")}
    print("\n### acc@(2.5deg, 0.05)\n")
    print("| Trained as / loss | clean | noise eval | occl eval |")
    print("|---|---|---|---|")
    for (recipe, loss), paths in CHAIR.items():
        row = [fmt([100 * v for v in cell_stats(
            paths, c, metric="acc_rot2.5_trans0.05")])
            for c in ("clean", "noise", "occl")]
        print(f"| {recipe} {loss} | " + " | ".join(row) + " |")
        out["chair_acc"] = out.get("chair_acc", {})
        out["chair_acc"][f"{recipe}/{loss}"] = {
            c: cell_stats(paths, c, metric="acc_rot2.5_trans0.05")
            for c in ("clean", "noise", "occl")}

    print("\n## Multifam (chair slice), 5,070 fixed poses, rot err (deg)\n")
    print("| Model | clean | noise eval |")
    print("|---|---|---|")
    for (recipe, loss), paths in MF.items():
        row = [fmt(cell_stats(paths, c, family="chair"))
               for c in ("clean", "noise")]
        print(f"| {recipe} {loss} | " + " | ".join(row) + " |")
        out["multifam"][f"{recipe}/{loss}"] = {
            c: cell_stats(paths, c, family="chair")
            for c in ("clean", "noise")}

    print("\n## Multifam 1200-epoch grad-clipped recipes (chair slice), "
          "rot err (deg) / acc@(2.5,0.05)\n")
    print("| Model | clean rot | noise rot | clean acc | noise acc |")
    print("|---|---|---|---|---|")
    out["multifam_clip"] = {}
    for (recipe, loss), paths in MF_CLIP.items():
        rots = [fmt(cell_stats(paths, c, family="chair"))
                for c in ("clean", "noise")]
        accs = [fmt([100 * v for v in cell_stats(
            paths, c, metric="acc_rot2.5_trans0.05", family="chair")])
            for c in ("clean", "noise")]
        print(f"| {recipe} {loss} | " + " | ".join(rots + accs) + " |")
        out["multifam_clip"][f"{recipe}/{loss}"] = {
            c: {"rot": cell_stats(paths, c, family="chair"),
                "acc": cell_stats(paths, c, metric="acc_rot2.5_trans0.05",
                                  family="chair")}
            for c in ("clean", "noise")}

    # head-to-head restatement: per seed, per condition, does dpdist beat
    # chamfer within the SAME seed (paired comparison kills train-variance
    # common mode across losses only if seeds pair; they do - same recipe
    # seed s for both losses).
    print("\n## Paired per-seed dpdist-vs-chamfer (rot err, lower wins)\n")
    pairs = [("clean-trained", CHAIR), ("noise-trained", CHAIR),
             ("train_single", CHAIR), ("multifam ts", MF)]
    summary = {}
    for recipe, table in pairs:
        for cond in ("clean", "noise"):
            fam = "chair" if table is MF else None
            ch = cell_stats(table[(recipe, "chamfer")], cond, family=fam)
            dp = cell_stats(table[(recipe, "dpdist")], cond, family=fam)
            n = min(len(ch), len(dp))
            if n == 0:
                continue
            wins = sum(d < c for d, c in zip(dp[:n], ch[:n]))
            summary[f"{recipe}/{cond}"] = {
                "dpdist": dp[:n], "chamfer": ch[:n],
                "dpdist_wins": wins, "n_seeds": n}
            print(f"- {recipe} / {cond} eval: dpdist wins {wins}/{n} seeds "
                  f"(dp {['%.2f' % v for v in dp[:n]]} vs "
                  f"ch {['%.2f' % v for v in ch[:n]]})")
    out["paired"] = summary

    with open(os.path.join(ROOT, "results", "seed_spread.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("\nwrote results/seed_spread.json")


if __name__ == "__main__":
    main()
