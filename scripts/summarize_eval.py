#!/usr/bin/env python3
"""Markdown tables from eval_matrix output dirs: one row per model/cond
(+ optional per-family slices). Usage: summarize_eval.py DIR [--family]"""
import json
import glob
import os
import sys


def fmt_row(name, cond, tag, r):
    return (f"| {name} | {cond} | {tag} | {r['rot_err_mean_deg']:.2f} | "
            f"{r['trans_err_mean']:.4f} | {100*r['acc_rot2.5_trans0.05']:.1f} | "
            f"{100*r['acc_rot5.0_trans0.05']:.1f} | "
            f"{100*r['acc_rot10.0_trans0.1']:.1f} | "
            f"{100*r['acc_rot20.0_trans0.2']:.1f} |")


def main():
    d = sys.argv[1]
    fam = "--family" in sys.argv
    print("| model | cond | slice | rot err | trans err | @2.5 | @5 | @10 | @20 |")
    print("|---|---|---|---|---|---|---|---|---|")
    for f in sorted(glob.glob(os.path.join(d, "*_*.json"))):
        base = os.path.basename(f)[:-5]
        name, _, cond = base.rpartition("_")
        try:
            r = json.load(open(f))
            print(fmt_row(name, cond, "all", r))
            if fam:
                for k, fr in r.get("per_family", {}).items():
                    print(fmt_row(name, cond, k, fr))
        except Exception as e:
            print(f"| {base} | ERR {e} |")


if __name__ == "__main__":
    main()
