"""Round-4 training queue: two TPU lanes, staggered compile starts.

Runs the VERDICT-r3 training workload in priority order:
  1. BPTT-stability retrain: multifam train_single 1200 epochs with
     --grad_clip + chair-sliced best-ckpt selection (next-#2).
  2. Multi-seed replication (seeds 1,2; round-3 runs are seed 0) of the
     decisive fixed-pose cells: multifam ts pair, single-family ts pair,
     noise-trained pair, clean-trained pair (next-#1).
  3. Equal-budget AUE-3dmfv chamfer rerun, full 300 epochs (next-#6).

Scheduling rules (agent memory: stagger-tpu-compiles,
single-core-host-contention): at most TWO jobs share the chip; a new job
is launched only after the previously launched one has written its first
metrics.jsonl line (i.e. it is past jit compile and into steady-state
dispatch). Jobs whose done-marker exists are skipped, so the queue is
resumable.

Usage: python scripts/r4_queue.py [--dry]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "runs", "r4")
DP_CHAIR = "runs/dpdist_chair_r2/ckpt_best"
DP_MULTI = "runs/dpdist_multi_r2/ckpt_best"

CANON = ("--num_point 64 --max_loops 8 --out_features 1024 "
         "--families chair --n_templates 128 --max_rotate_deg 45 "
         "--sparse 1 --s_rand_points 1.0 --centroid_sub 0 "
         "--batch_size 16 --learning_rate 1e-4 "
         "--max_epoch 600 --batches_per_epoch 32 --data_parallel 1")
MF = ("--num_point 64 --max_loops 8 --out_features 1024 "
      "--families chair sphere box cylinder torus --n_templates 125 "
      "--max_rotate_deg 45 --sparse 1 --s_rand_points 1.0 --centroid_sub 0 "
      "--batch_size 16 --learning_rate 1e-4 "
      "--max_epoch 600 --batches_per_epoch 32 --data_parallel 1")

TRAIN = [sys.executable, "-m", "dpdist_tpu.cli.train_pcrnet"]


def pcr(name, loss, common, *extra, seed=0):
    d = os.path.join(OUT, name)
    cmd = TRAIN + ["--loss_type", loss, "--log_dir", d,
                   "--seed", str(seed)] + common.split() + list(extra)
    if loss == "dpdist":
        ckpt = DP_MULTI if "sphere" in common else DP_CHAIR
        cmd += ["--dpdist_ckpt", ckpt]
    return {"dir": d, "cmd": cmd, "done": "pcrnet_ckpt_final.json"}


def jobs():
    J = []
    # 1) BPTT-stability retrain (VERDICT #2): 1200 epochs, grad clipping,
    #    chair-sliced selection with enough eval cases per family.
    J.append(pcr("mf_ts1200clip_dpdist", "dpdist",
                 MF.replace("--max_epoch 600", "--max_epoch 1200"),
                 "--train_single", "--grad_clip", "1.0",
                 "--select_family", "chair", "--eval_cases", "160"))
    # 2) seed replication, decisive cells first
    for s in (1, 2):
        for loss in ("chamfer", "dpdist"):
            J.append(pcr(f"mf_ts_s{s}_{loss}", loss, MF,
                         "--train_single", seed=s))
    for s in (1, 2):
        for loss in ("chamfer", "dpdist"):
            J.append(pcr(f"ts_s{s}_{loss}", loss, CANON,
                         "--train_single", seed=s))
    for s in (1, 2):
        for loss in ("chamfer", "dpdist"):
            J.append(pcr(f"noise_s{s}_{loss}", loss, CANON,
                         "--noise_prob", "1.0", seed=s))
    for s in (1, 2):
        for loss in ("chamfer", "dpdist"):
            J.append(pcr(f"clean_s{s}_{loss}", loss, CANON, seed=s))
    # 3) equal-budget AUE-3dmfv chamfer (VERDICT #6)
    d = os.path.join(OUT, "aue_3dmfv_chamfer_full")
    J.append({"dir": d, "done": "aue_ckpt_best.json",
              "cmd": [sys.executable, "-m", "dpdist_tpu.cli.train_aue",
                      "--dpdist_ckpt", DP_CHAIR, "--encoder_aue", "3dmfv",
                      "--opt_type", "chamfer", "--max_epoch_aue", "300",
                      "--log_dir", d]})
    return J


def run_queue(all_jobs, dry=False):
    queue = []
    for j in all_jobs:
        final = os.path.join(j["dir"], j["done"])
        if os.path.exists(final):
            print(f"[queue] skip (done): {j['dir']}", flush=True)
        else:
            queue.append(j)
    if dry:
        for j in queue:
            print(" ".join(j["cmd"]))
        return
    lanes = []
    while queue or lanes:
        for L in lanes[:]:
            if L["proc"].poll() is not None:
                rc = L["proc"].returncode
                dt = (time.time() - L["t0"]) / 60
                print(f"[queue] done rc={rc} {dt:.0f}min: {L['dir']}",
                      flush=True)
                lanes.remove(L)
        if queue and len(lanes) < 2:
            j = queue.pop(0)
            os.makedirs(j["dir"], exist_ok=True)
            out = open(os.path.join(j["dir"], "stdout.log"), "w")
            p = subprocess.Popen(j["cmd"], stdout=out,
                                 stderr=subprocess.STDOUT, cwd=ROOT)
            lanes.append({"proc": p, "dir": j["dir"], "t0": time.time()})
            print(f"[queue] start pid={p.pid}: {j['dir']}", flush=True)
            # Stagger: block further launches until this job is past
            # compile (first metrics line) or dead; 40 min guard.
            mf = os.path.join(j["dir"], "metrics.jsonl")
            t0 = time.time()
            while time.time() - t0 < 2400:
                if p.poll() is not None:
                    break
                if os.path.exists(mf) and os.path.getsize(mf) > 0:
                    print(f"[queue] past compile ({time.time()-t0:.0f}s): "
                          f"{j['dir']}", flush=True)
                    break
                time.sleep(10)
        else:
            time.sleep(20)
    print("[queue] ALL DONE", flush=True)


def main():
    run_queue(jobs(), dry="--dry" in sys.argv)


if __name__ == "__main__":
    main()
