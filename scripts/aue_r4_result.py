#!/usr/bin/env python3
"""Assemble results/aue_eval_r4.json: the equal-budget AUE-3dmfv chamfer
rerun (VERDICT r3 #6) next to the round-3 cells.

The r3 chamfer cell stopped at ~epoch 91/300 (chip time); the r4 queue
retrains it to the full 300-epoch budget with best-ckpt selection. Eval
metrics come from the trainer's held-out eval rows in metrics.jsonl
(eval_dpdist / eval_chamfer at each eval epoch; best row = min of the
supervising metric, mirroring how aue_ckpt_best is selected).
"""

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUN = os.path.join(ROOT, "runs", "r4", "aue_3dmfv_chamfer_full")


def eval_rows(run):
    rows = []
    with open(os.path.join(run, "metrics.jsonl")) as f:
        for line in f:
            d = json.loads(line)
            if "eval_dpdist" in d:
                rows.append(d)
    return rows


def main():
    rows = eval_rows(RUN)
    best = min(rows, key=lambda r: r["eval_chamfer"])
    final = rows[-1]
    r3 = json.load(open(os.path.join(ROOT, "results", "aue_eval_r3.json")))
    out = {
        "encoder": "3dmfv",
        "chamfer_full_budget": {
            "eval_dpdist": round(best["eval_dpdist"], 6),
            "eval_chamfer_sq": round(best["eval_chamfer"], 6),
            "best_epoch": best.get("epoch"),
            "final_epoch": final.get("epoch"),
            "final_eval_chamfer_sq": round(final["eval_chamfer"], 6),
            "ckpt": "runs/r4/aue_3dmfv_chamfer_full/aue_ckpt_best",
        },
        "r3_cells_for_comparison": {
            "ours_300ep": r3["ours"],
            "chamfer_stopped_ep91": r3["chamfer"],
        },
        "note": "equal-budget rerun of the r3 early-stopped chamfer cell "
                "(300 epochs, best-ckpt on eval_chamfer; "
                "train_multi_gpu_pc_compare_dist.py:406-515 budget parity)",
    }
    path = os.path.join(ROOT, "results", "aue_eval_r4.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["chamfer_full_budget"], indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
