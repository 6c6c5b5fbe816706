#!/bin/bash
# Round-5 follow-on lane: seed-replicate the recipe that PASSES the
# 50-iteration no-stop evaluator (mf_tsn1200clip_dpdist — VERDICT r4
# Weak #3 flags the tsn pair as seed-0-only; the r5a chain replicates
# the ts recipe instead). Waits for the given PID (the lane-B noise
# eval) to free a TPU slot, trains tsn seed 1, then evaluates it under
# the same fixed-pose protocol at 8 (clean+noise, best+final) and 50
# (clean) iterations with --skip_existing so it composes with r5a's
# group-D/E outputs.
#
# Usage: scripts/chain_r5b.sh [wait_pid] [train_deadline_epoch_s]
set -u
cd "$(dirname "$0")/.."
LOG=runs/chain_r5b.log
say() { echo "[r5b $(date -u +%H:%M:%S)] $*" >> "$LOG"; }
WAIT_PID=${1:-}
DEADLINE=${2:-}

if [ -n "$WAIT_PID" ]; then
  say "waiting on pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
if [ -n "$DEADLINE" ] && [ "$(date -u +%s)" -ge "$DEADLINE" ]; then
  say "past training deadline — skip"; exit 0
fi

MF1200="--num_point 64 --max_loops 8 --out_features 1024 \
  --families chair sphere box cylinder torus --n_templates 125 \
  --max_rotate_deg 45 --sparse 1 --s_rand_points 1.0 --centroid_sub 0 \
  --batch_size 16 --learning_rate 1e-4 \
  --max_epoch 1200 --batches_per_epoch 32 --data_parallel 1 \
  --train_single --grad_clip 1.0 --select_family chair --eval_cases 160"
DPC=results/dpdist_multi_r4_ckpt_best
NAME=mf_tsn1200clip_s1_dpdist
D="runs/r4/$NAME"

if [ ! -f "results/policy_$NAME.done" ]; then
  say "start train $NAME"
  timeout 9000 python -m dpdist_tpu.cli.train_pcrnet --loss_type dpdist \
    --log_dir "$D" --archive_to "results/policy_$NAME" $MF1200 \
    --dpdist_ckpt "$DPC" --noise_prob 1.0 --seed 1 \
    > "runs/r5b_$NAME.log" 2>&1
  rc=$?
  say "train $NAME rc=$rc"
  if [ $rc -eq 0 ]; then
    touch "results/policy_$NAME.done"
    if [ -f "$D/pcrnet_ckpt_final.npz" ]; then
      cp "$D/pcrnet_ckpt_final.npz" "results/policy_${NAME}_final.npz"
      cp "$D/pcrnet_ckpt_final.json" "results/policy_${NAME}_final.json"
    fi
  fi
fi

MF="--iterations 8 --n_templates 125 --families chair sphere box cylinder torus \
  --sparse 1 --s_rand_points 1.0 --centroid_sub 0 --seed 777 \
  --pose_file default"
CK="$NAME=$D/pcrnet_ckpt_best"
[ -f "$D/pcrnet_ckpt_final.json" ] && CK="$CK ${NAME}_fin=$D/pcrnet_ckpt_final"
if [ -f "$D/pcrnet_ckpt_best.json" ]; then
  say "start eval8 $NAME"
  timeout 5400 python -m dpdist_tpu.cli.eval_matrix --skip_existing $MF \
    --ckpts $CK --conditions clean noise --out_dir runs/eval_r4_mf \
    >> "runs/r5b_eval.log" 2>&1
  say "eval8 rc=$?"
  python scripts/merge_summary.py runs/eval_r4_mf/summary.txt results/multifam_r4/summary.txt 2>/dev/null
  cp runs/eval_r4_mf/*.json results/multifam_r4/ 2>/dev/null
  say "start eval50 $NAME"
  timeout 5400 python -m dpdist_tpu.cli.eval_matrix --skip_existing $MF \
    --iterations 50 --ckpts "$NAME=$D/pcrnet_ckpt_best" --conditions clean \
    --out_dir runs/eval50_r4 >> "runs/r5b_eval.log" 2>&1
  say "eval50 rc=$?"
  python scripts/merge_summary.py runs/eval50_r4/summary.txt results/eval50_r4/summary.txt 2>/dev/null
  cp runs/eval50_r4/*.json results/eval50_r4/ 2>/dev/null
fi
say "DONE"
touch /tmp/chain_r5b.done
