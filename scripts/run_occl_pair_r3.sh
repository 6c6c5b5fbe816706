#!/bin/bash
# Round-3 occlusion experiment (VERDICT #5): PCRNet pair trained with
# 25% occlusion augmentation, dpdist side using the occlusion-ROBUST
# frozen DPDist (runs/dpdist_chair_occl_r3 — encoder saw kNN-ball
# occluded/duplicate-refilled conditioning clouds). Sequential trainings
# (simultaneous starts can wedge a remote compile on the 1-core host).
set -e
cd "$(dirname "$0")/.."
DPDIST_CKPT=${DPDIST_CKPT:-runs/dpdist_chair_occl_r3/ckpt_best}
EPOCHS=${EPOCHS:-600}
OUT=${OUT:-runs/canonical_occl_r3}
COMMON="--num_point 64 --max_loops 8 --out_features 1024 \
  --families chair --n_templates 128 --max_rotate_deg 45 \
  --sparse 1 --s_rand_points 1.0 --centroid_sub 0 \
  --batch_size 16 --learning_rate 1e-4 --occlusion_fraction 0.25 \
  --max_epoch $EPOCHS --batches_per_epoch 32 --data_parallel 1"
mkdir -p "$OUT"
python -m dpdist_tpu.cli.train_pcrnet --loss_type dpdist \
  --dpdist_ckpt "$DPDIST_CKPT" --log_dir "$OUT/pcr_dpdist" $COMMON 2>&1 | tail -1
python -m dpdist_tpu.cli.train_pcrnet --loss_type chamfer \
  --log_dir "$OUT/pcr_chamfer" $COMMON 2>&1 | tail -1
echo "occl-r3 pair done"
