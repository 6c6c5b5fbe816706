#!/bin/bash
# Round-5 lane E: fixed-point-conditioning experiments (--fp_reg), the
# one untested objective from the drift post-mortem (NEXT.md open #3).
# Every horizon/action-reg candidate failed because none of them ever
# trains AT the converged state the reference's no-stop 50-iteration
# evaluator (results_itrPCRNet_no_stop.py:331-335) dwells in; fp_reg
# rolls the policy from the GT-aligned source (noise + sparse-split
# asymmetry preserved) and L1-penalizes every emitted action.
#
# Cells:
#   mf_tsn_fp1_dpdist    fine-tune from the tsn1200clip anchor, lambda=1.0
#   mf_tsn_fp03_dpdist   same, lambda=0.3 (in case 1.0 taxes @8 accuracy)
#   mf_tsnfp1200_dpdist  full 1200-epoch recipe from scratch, lambda=1.0
# then px8 / px50 / px50stop evals into the post-fix pipeline.
set -u
cd "$(dirname "$0")/.."
LOG=runs/chain_r5e.log
say() { echo "[r5e $(date -u +%H:%M:%S)] $*" >> "$LOG"; }

DPC=results/dpdist_multi_r4_ckpt_best
ANCHOR=results/policy_mf_tsn1200clip_dpdist
MF1200="--num_point 64 --max_loops 8 --out_features 1024 \
  --families chair sphere box cylinder torus --n_templates 125 \
  --max_rotate_deg 45 --sparse 1 --s_rand_points 1.0 --centroid_sub 0 \
  --batch_size 16 --batches_per_epoch 32 --data_parallel 1 \
  --train_single --grad_clip 1.0 --select_family chair --eval_cases 160 \
  --noise_prob 1.0 --seed 0"
MF="--n_templates 125 --families chair sphere box cylinder torus \
  --sparse 1 --s_rand_points 1.0 --centroid_sub 0 --seed 777 \
  --pose_file default"

train_one() {  # train_one <name> <timeout_s> <extra...>
  local d="runs/r5/$1" arch="results/policy_$1"
  if [ -f "results/policy_$1.done" ]; then
    if [ -f "$arch.npz" ] && [ ! -f "$d/pcrnet_ckpt_best.npz" ]; then
      mkdir -p "$d"
      cp "$arch.npz" "$d/pcrnet_ckpt_best.npz"
      cp "$arch.json" "$d/pcrnet_ckpt_best.json"
    fi
    say "skip $1 (done)"; return 0
  fi
  say "start train $1"
  timeout "$2" python -m dpdist_tpu.cli.train_pcrnet --loss_type dpdist \
    --dpdist_ckpt "$DPC" --log_dir "$d" --archive_to "$arch" \
    $MF1200 "${@:3}" > "runs/r5e_$1.log" 2>&1
  local rc=$?
  say "train $1 rc=$rc"
  if [ $rc -eq 0 ]; then
    touch "results/policy_$1.done"
    if [ -f "$d/pcrnet_ckpt_final.npz" ]; then
      cp "$d/pcrnet_ckpt_final.npz" "results/policy_$1_final.npz"
      cp "$d/pcrnet_ckpt_final.json" "results/policy_$1_final.json"
    fi
  fi
  return $rc
}

train_one mf_tsn_fp1_dpdist 3600 --resume "$ANCHOR" \
  --learning_rate 2e-5 --max_epoch 300 --fp_reg 1.0 --fp_steps 4
train_one mf_tsn_fp03_dpdist 3600 --resume "$ANCHOR" \
  --learning_rate 2e-5 --max_epoch 300 --fp_reg 0.3 --fp_steps 4
train_one mf_tsnfp1200_dpdist 7200 \
  --learning_rate 1e-4 --max_epoch 1200 --fp_reg 1.0 --fp_steps 4

CKS=""
for n in mf_tsn_fp1_dpdist mf_tsn_fp03_dpdist mf_tsnfp1200_dpdist; do
  d="runs/r5/$n"
  [ -f "$d/pcrnet_ckpt_best.json" ] && CKS="$CKS $n=$d/pcrnet_ckpt_best"
done
if [ -n "$CKS" ]; then
  say "start px8:$CKS"
  timeout 5400 python -m dpdist_tpu.cli.eval_matrix --skip_existing \
    --iterations 8 $MF --ckpts $CKS --conditions clean \
    --out_dir runs/eval_px8 >> runs/r5e_eval.log 2>&1
  say "px8 rc=$?"
  say "start px50"
  timeout 5400 python -m dpdist_tpu.cli.eval_matrix --skip_existing \
    --iterations 50 $MF --ckpts $CKS --conditions clean \
    --out_dir runs/eval_px50 >> runs/r5e_eval.log 2>&1
  say "px50 rc=$?"
  say "start px50stop"
  timeout 5400 python -m dpdist_tpu.cli.eval_matrix --skip_existing \
    --iterations 50 $MF --ckpts $CKS --conditions clean \
    --stop_threshold 1e-3 --stop_period 2 --stop_select period0 \
    --out_dir runs/eval_px50stop >> runs/r5e_eval.log 2>&1
  say "px50stop rc=$?"
  python scripts/analyze_postfix.py >> "$LOG" 2>&1 && say "postfix analysis"
fi
say "ALL DONE"
touch /tmp/chain_r5e.done
