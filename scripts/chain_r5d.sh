#!/bin/bash
# Round-5 lane D: third chamfer-twin seed (n=2 -> n=3 on the
# "dpdist-loss slows the 50-iter drift ~10x" conclusion, NEXT.md #2).
# Waits for the ft16 post-fix battery to free the TPU, then trains
# mf_tsn1200clip_s2_chamfer (same 1200-epoch grad-clipped noise recipe
# as its dpdist twin, seed 2) and evaluates it straight into the
# post-fix px8/px50 pipeline. Reference protocol parity:
# results_itrPCRNet_no_stop.py:331-335 (50-iteration no-stop).
set -u
cd "$(dirname "$0")/.."
LOG=runs/chain_r5d.log
say() { echo "[r5d $(date -u +%H:%M:%S)] $*" >> "$LOG"; }

# wait (up to 2h) for the ft16 eval battery
for _ in $(seq 1 240); do
  [ -f /tmp/px_ft16.done ] && break
  sleep 30
done
say "px_ft16 done=$([ -f /tmp/px_ft16.done ] && echo yes || echo no)"

MF1200="--num_point 64 --max_loops 8 --out_features 1024 \
  --families chair sphere box cylinder torus --n_templates 125 \
  --max_rotate_deg 45 --sparse 1 --s_rand_points 1.0 --centroid_sub 0 \
  --batch_size 16 --learning_rate 1e-4 \
  --max_epoch 1200 --batches_per_epoch 32 --data_parallel 1 \
  --train_single --grad_clip 1.0 --select_family chair --eval_cases 160"
MF="--n_templates 125 --families chair sphere box cylinder torus \
  --sparse 1 --s_rand_points 1.0 --centroid_sub 0 --seed 777 \
  --pose_file default"
NAME=mf_tsn1200clip_s2_chamfer
D=runs/r4/$NAME

if [ ! -f "results/policy_$NAME.done" ]; then
  say "start train $NAME"
  timeout 9000 python -m dpdist_tpu.cli.train_pcrnet --loss_type chamfer \
    --log_dir "$D" --archive_to "results/policy_$NAME" $MF1200 \
    --noise_prob 1.0 --seed 2 > "runs/r5d_$NAME.log" 2>&1
  rc=$?
  say "train $NAME rc=$rc"
  if [ $rc -eq 0 ]; then
    touch "results/policy_$NAME.done"
    if [ -f "$D/pcrnet_ckpt_final.npz" ]; then
      cp "$D/pcrnet_ckpt_final.npz" "results/policy_${NAME}_final.npz"
      cp "$D/pcrnet_ckpt_final.json" "results/policy_${NAME}_final.json"
    fi
  fi
elif [ -f "results/policy_$NAME.npz" ] && [ ! -f "$D/pcrnet_ckpt_best.npz" ]; then
  mkdir -p "$D"
  cp "results/policy_$NAME.npz" "$D/pcrnet_ckpt_best.npz"
  cp "results/policy_$NAME.json" "$D/pcrnet_ckpt_best.json"
fi

if [ -f "$D/pcrnet_ckpt_best.json" ]; then
  CK="$NAME=$D/pcrnet_ckpt_best"
  say "start px8 $NAME"
  timeout 5400 python -m dpdist_tpu.cli.eval_matrix --skip_existing \
    --iterations 8 $MF --ckpts $CK --conditions clean \
    --out_dir runs/eval_px8 >> runs/r5d_eval.log 2>&1
  say "px8 rc=$?"
  say "start px50 $NAME"
  timeout 5400 python -m dpdist_tpu.cli.eval_matrix --skip_existing \
    --iterations 50 $MF --ckpts $CK --conditions clean \
    --out_dir runs/eval_px50 >> runs/r5d_eval.log 2>&1
  say "px50 rc=$?"
  python scripts/analyze_postfix.py >> "$LOG" 2>&1 && say "postfix analysis"
fi
say "ALL DONE"
touch /tmp/chain_r5d.done
