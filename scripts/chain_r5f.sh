#!/bin/bash
# Round-5 lane F: per-family-specialization hypothesis test (NEXT.md
# open #4). Before building family-conditioned heads, measure the
# ceiling: can a DEDICATED single-family policy beat the multifam
# policy's weak D2-family slices (box 34.7% sym-acc, sphere ~5%)?
# If a specialist can't, heads won't either.
#
# Trains box-only and sphere-only twins of the tsn1200clip recipe
# (same hyperparams, 25 templates = the per-family share of the 125),
# then evaluates them on the SAME 5-family fixed-pose protocol as the
# px pipeline — only their own family slice is meaningful, and it is
# case-identical to the multifam policy's slice.
set -u
cd "$(dirname "$0")/.."
LOG=runs/chain_r5f.log
say() { echo "[r5f $(date -u +%H:%M:%S)] $*" >> "$LOG"; }

DPC=results/dpdist_multi_r4_ckpt_best
BASE="--num_point 64 --max_loops 8 --out_features 1024 \
  --n_templates 25 --max_rotate_deg 45 --sparse 1 --s_rand_points 1.0 \
  --centroid_sub 0 --batch_size 16 --learning_rate 1e-4 \
  --max_epoch 1200 --batches_per_epoch 32 --data_parallel 1 \
  --train_single --grad_clip 1.0 --eval_cases 160 \
  --noise_prob 1.0 --seed 0"
MF="--n_templates 125 --families chair sphere box cylinder torus \
  --sparse 1 --s_rand_points 1.0 --centroid_sub 0 --seed 777 \
  --pose_file default"

train_one() {  # train_one <name> <family> <timeout_s>
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
  timeout "$3" python -m dpdist_tpu.cli.train_pcrnet --loss_type dpdist \
    --dpdist_ckpt "$DPC" --log_dir "$d" --archive_to "$arch" \
    $BASE --families "$2" --select_family "$2" \
    > "runs/r5f_$1.log" 2>&1
  local rc=$?
  say "train $1 rc=$rc"
  [ $rc -eq 0 ] && touch "results/policy_$1.done"
  return $rc
}

train_one spec_box_dpdist box 7200
train_one spec_sphere_dpdist sphere 7200

CKS=""
for n in spec_box_dpdist spec_sphere_dpdist; do
  d="runs/r5/$n"
  [ -f "$d/pcrnet_ckpt_best.json" ] && CKS="$CKS $n=$d/pcrnet_ckpt_best"
done
if [ -n "$CKS" ]; then
  say "start px8 specialists"
  timeout 5400 python -m dpdist_tpu.cli.eval_matrix --skip_existing \
    --iterations 8 $MF --ckpts $CKS --conditions clean \
    --out_dir runs/eval_px8 >> runs/r5f_eval.log 2>&1
  say "px8 rc=$?"
fi
say "ALL DONE"
touch /tmp/chain_r5f.done
