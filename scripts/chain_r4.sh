#!/bin/bash
# Round-4 orchestration chain (resilient to builder-session restarts):
#   1. wait for the phase-1 training queue to drain
#   2. run the full fixed-pose eval battery (groups A, B, C)
#   3. aggregate the seed spread
#   4. run queue phase 2 (grad-clipped flagship, seeds 1-2)
#   5. eval the phase-2 checkpoints (8 + 50 iterations)
# Each stage is skipped if its completion marker already exists.
set -u
cd "$(dirname "$0")/.."

log() { echo "[chain $(date +%H:%M:%S)] $*"; }

# 1. wait for queue1
until grep -q "ALL DONE" runs/r4_queue.log 2>/dev/null; do sleep 60; done
log "queue1 done"

# 2. eval battery
if [ ! -f results/eval50_r4/summary.txt ]; then
  bash scripts/eval_r4_matrices.sh all > runs/eval_r4_battery.log 2>&1
  log "eval battery done rc=$?"
else
  log "eval battery already done"
fi

# 3. seed spread
python scripts/summarize_seeds.py > results/seed_spread.md 2>&1 || true
log "seed spread written"

# 4. queue2
if [ ! -f runs/r4/mf_ts1200clip_s2_dpdist/pcrnet_ckpt_final.json ]; then
  python scripts/r4_queue2.py >> runs/r4_queue2.log 2>&1
  log "queue2 done"
else
  log "queue2 already done"
fi

# 5. eval phase-2 checkpoints: 8-iter (best+final) and 50-iter no-stop
MF="--n_templates 125 --families chair sphere box cylinder torus \
  --sparse 1 --s_rand_points 1.0 --centroid_sub 0 --seed 777 \
  --pose_file default"
CK=""
for s in 1 2; do
  b="runs/r4/mf_ts1200clip_s${s}_dpdist/pcrnet_ckpt_best"
  f="runs/r4/mf_ts1200clip_s${s}_dpdist/pcrnet_ckpt_final"
  [ -f "$b.json" ] && CK="$CK clip_s${s}=$b"
  [ -f "$f.json" ] && CK="$CK clip_s${s}_fin=$f"
done
if [ -n "$CK" ] && [ ! -f results/multifam_r4/clip_seeds_done ]; then
  python -m dpdist_tpu.cli.eval_matrix $MF --iterations 8 --ckpts $CK \
    --conditions clean --out_dir runs/eval_r4_clipseeds \
    > runs/eval_r4_clipseeds.log 2>&1
  python -m dpdist_tpu.cli.eval_matrix $MF --iterations 50 \
    --ckpts clip_s1=runs/r4/mf_ts1200clip_s1_dpdist/pcrnet_ckpt_best \
            clip_s2=runs/r4/mf_ts1200clip_s2_dpdist/pcrnet_ckpt_best \
    --conditions clean --out_dir runs/eval50_r4_clipseeds \
    >> runs/eval_r4_clipseeds.log 2>&1
  cp runs/eval_r4_clipseeds/*.json results/multifam_r4/ 2>/dev/null
  cp runs/eval50_r4_clipseeds/*.json results/eval50_r4/ 2>/dev/null
  touch results/multifam_r4/clip_seeds_done
  log "clip-seed evals done"
fi
log "CHAIN COMPLETE"
