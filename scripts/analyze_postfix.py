#!/usr/bin/env python3
"""Post-precision-fix re-baseline of the round-5 no-stop headline.

The r5 geometry fix (commit 3b9fe19) showed every pre-fix TPU-measured
acc@(2.5deg,0.05) cell was inflated by the default-matmul-precision
arccos bias, so the decisive cells behind the round-5 headline — the
tsn1200clip recipe passing the reference's 50-iteration no-stop
evaluator (results_itrPCRNet_no_stop.py:331-335) and its seed/loss
replicas — were re-measured in ONE post-fix pipeline:
runs/eval_px8 + runs/eval_px50 (scripted in this file's launch
commands; 5,070-case fixed-pose MF protocol, clean).

This script archives those cells into results/postfix_r5/ and emits
the restated pass/fail + seed-spread tables
(results/postfix_r5/no_stop_postfix.json).
"""

import json
import os
import shutil

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "results", "postfix_r5")

CELLS = [
    "mf_tsn1200clip_dpdist",
    "mf_tsn1200clip_s1_dpdist",
    "mf_tsn1200clip_s2_dpdist",
    "mf_tsn1200clip_chamfer",
    "mf_tsn1200clip_s1_chamfer",
    "mf_tsn1200clip_s2_chamfer",
    "mf_ts1200clip_s1_dpdist",
    "mf_ts1200clip_s2_dpdist",
    "mf_loops16_dpdist",
    "mf_loops16_chamfer",
    "mf_ar_dpdist",
    # horizon-extension fine-tune FROM the tsn1200clip anchor (16-loop
    # BPTT, 300 epochs, noise_prob 1.0) — the one trained-fix cell the
    # from-scratch loops16 failure left untested.
    "mf_tsn_ft16",
    # lane E: fixed-point-conditioning cells (--fp_reg) — the rollout-
    # from-the-GT-aligned-state action penalty, the one drift objective
    # the horizon/action-reg candidates never tested.
    "mf_tsn_fp1_dpdist",
    "mf_tsn_fp03_dpdist",
    "mf_tsnfp1200_dpdist",
]

# 50-iter cells re-run WITH the round-4 period0 serving stop
# (--stop_threshold 1e-3 --stop_period 2 --stop_select period0), to
# re-test the "stop recovers 8-iter accuracy" claim post-fix.
STOP_CELLS = [
    "mf_tsn1200clip_dpdist",
    "mf_tsn1200clip_s1_dpdist",
    "mf_tsn1200clip_s2_dpdist",
    "mf_tsn_ft16",
    "mf_tsn_fp1_dpdist",
    "mf_tsn_fp03_dpdist",
    "mf_tsnfp1200_dpdist",
]


def load(rel):
    p = os.path.join(ROOT, rel)
    return json.load(open(p)) if os.path.exists(p) else None


def chair(d):
    return ((d or {}).get("per_family") or {}).get("chair") or d


def main():
    os.makedirs(OUT, exist_ok=True)
    out = {}
    rows = []
    for key in CELLS:
        d8 = load(f"runs/eval_px8/{key}_clean.json")
        d50 = load(f"runs/eval_px50/{key}_clean.json")
        if d8 is None or d50 is None:
            print(f"skip {key} (cells not ready)")
            continue
        for it, d in (("px8", d8), ("px50", d50)):
            shutil.copy(os.path.join(ROOT, f"runs/eval_{it}/{key}_clean.json"),
                        os.path.join(OUT, f"{it}_{key}_clean.json"))
        c8, c50 = chair(d8), chair(d50)
        rec = {
            "chair_rot8": c8["rot_err_mean_deg"],
            "chair_rot50": c50["rot_err_mean_deg"],
            "chair_te8": c8["trans_err_mean"],
            "chair_te50": c50["trans_err_mean"],
            "chair_acc8": c8["acc_rot2.5_trans0.05"],
            "chair_acc50": c50["acc_rot2.5_trans0.05"],
            "pooled_acc8": d8["acc_rot2.5_trans0.05"],
            "pooled_acc50": d50["acc_rot2.5_trans0.05"],
            "pooled_sym_acc8":
                d8["sym_acc"]["sym_acc_rot2.5_trans0.05"],
            "pooled_sym_acc50":
                d50["sym_acc"]["sym_acc_rot2.5_trans0.05"],
        }
        rec["stable"] = bool(rec["chair_acc50"] >= rec["chair_acc8"] - 1e-9)
        out[key] = rec
        rows.append(
            f"| {key} | {rec['chair_rot8']:.2f} -> {rec['chair_rot50']:.2f} "
            f"| {rec['chair_te8']:.4f} -> {rec['chair_te50']:.4f} "
            f"| {100 * rec['chair_acc8']:.1f}% -> "
            f"{100 * rec['chair_acc50']:.1f}% "
            f"| {100 * rec['pooled_sym_acc8']:.1f}% -> "
            f"{100 * rec['pooled_sym_acc50']:.1f}% "
            f"| {'PASS' if rec['stable'] else 'FAIL'} |")

    print("| Model | chair rot 8->50 | chair trans 8->50 "
          "| chair acc@2.5 8->50 | pooled sym-acc@2.5 8->50 | stable |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(r)

    # seed spreads of the two headline statistics, post-fix
    def spread(keys, field):
        vals = [out[k][field] for k in keys if k in out]
        return {"n": len(vals), "values": vals,
                "min": min(vals) if vals else None,
                "max": max(vals) if vals else None}

    # period0-stop recovery cells (present only after the stop battery)
    stop = {}
    for key in STOP_CELLS:
        ds = load(f"runs/eval_px50stop/{key}_clean.json")
        if ds is None or key not in out:
            continue
        shutil.copy(os.path.join(ROOT, f"runs/eval_px50stop/{key}_clean.json"),
                    os.path.join(OUT, f"px50stop_{key}_clean.json"))
        cs = chair(ds)
        stop[key] = {
            "chair_rot50stop": cs["rot_err_mean_deg"],
            "chair_te50stop": cs["trans_err_mean"],
            "chair_acc50stop": cs["acc_rot2.5_trans0.05"],
            "recovers_8iter": bool(cs["acc_rot2.5_trans0.05"]
                                   >= out[key]["chair_acc8"] - 1e-9),
        }
    if stop:
        print("\nperiod0-stop @50 vs no-stop (chair acc@2.5):")
        for k, s in stop.items():
            print(f"  {k}: @8 {100*out[k]['chair_acc8']:.1f}% | no-stop@50 "
                  f"{100*out[k]['chair_acc50']:.1f}% | stop@50 "
                  f"{100*s['chair_acc50stop']:.1f}% "
                  f"({'recovers' if s['recovers_8iter'] else 'partial'})")

    seeds = {
        "tsn_dpdist_chair_acc50": spread(
            ["mf_tsn1200clip_dpdist", "mf_tsn1200clip_s1_dpdist",
             "mf_tsn1200clip_s2_dpdist"], "chair_acc50"),
        "tsn_dpdist_stable": [out[k]["stable"] for k in
                              ["mf_tsn1200clip_dpdist",
                               "mf_tsn1200clip_s1_dpdist",
                               "mf_tsn1200clip_s2_dpdist"] if k in out],
        "tsn_chamfer_stable": [out[k]["stable"] for k in
                               ["mf_tsn1200clip_chamfer",
                                "mf_tsn1200clip_s1_chamfer",
                                "mf_tsn1200clip_s2_chamfer"] if k in out],
        "ts_dpdist_stable": [out[k]["stable"] for k in
                             ["mf_ts1200clip_s1_dpdist",
                              "mf_ts1200clip_s2_dpdist"] if k in out],
    }
    payload = {"cells": out, "seeds": seeds, "stop_cells": stop,
               "protocol": "5070-case fixed-pose MF clean, post-fix "
                           "(HIGHEST pose algebra), one pipeline"}
    with open(os.path.join(OUT, "no_stop_postfix.json"), "w") as f:
        json.dump(payload, f, indent=2)
    print("\nseeds:", json.dumps(seeds, indent=1))


if __name__ == "__main__":
    main()
