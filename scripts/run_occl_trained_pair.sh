#!/bin/bash
# Occlusion-augmented training at the canonical protocol (the reference
# bash's OCCLUSIONS knob), chamfer vs dpdist, then a single-process
# 3-condition eval via eval_matrix.
set -e
cd "$(dirname "$0")/.."
DPDIST_CKPT=${DPDIST_CKPT:-runs/dpdist_chair_r2/ckpt_best}
EPOCHS=${EPOCHS:-600}
OUT=${OUT:-runs/canonical_occl}
COMMON="--num_point 64 --max_loops 8 --out_features 1024 \
  --families chair --n_templates 128 --max_rotate_deg 45 \
  --sparse 1 --s_rand_points 1.0 --centroid_sub 0 \
  --batch_size 16 --learning_rate 1e-4 --occlusion_fraction 0.25 \
  --max_epoch $EPOCHS --batches_per_epoch 32 --data_parallel 1"
mkdir -p "$OUT"
python -m dpdist_tpu.cli.train_pcrnet --loss_type chamfer \
  --log_dir "$OUT/pcr_chamfer" $COMMON 2>&1 | tail -1 &
CH=$!
python -m dpdist_tpu.cli.train_pcrnet --loss_type dpdist \
  --dpdist_ckpt "$DPDIST_CKPT" --log_dir "$OUT/pcr_dpdist" $COMMON 2>&1 | tail -1
wait $CH
CKPTS=""
for loss in chamfer dpdist; do
  ckpt="$OUT/pcr_$loss/pcrnet_ckpt_best"
  [ -f "$ckpt.json" ] || ckpt="$OUT/pcr_$loss/pcrnet_ckpt_final"
  CKPTS="$CKPTS $loss=$ckpt"
done
python -m dpdist_tpu.cli.eval_matrix --ckpts $CKPTS \
  --conditions clean noise occl --num_cases 512 --n_templates 64 \
  --families chair --sparse 1 --s_rand_points 1.0 --centroid_sub 0 \
  --iterations 8 --seed 777 --out_dir "$OUT/eval"
echo "occl-trained pair done"
