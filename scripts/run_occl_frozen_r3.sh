#!/bin/bash
# Round-3 (VERDICT #5): occlusion-robust FROZEN DPDist — train the
# learned distance with kNN-ball-occluded/duplicate-refilled conditioning
# clouds (labels stay vs the true surface), then retrain the occl-trained
# PCRNet pair against it and re-run the occluded eval.
set -e
cd "$(dirname "$0")/.."
OUT=${OUT:-runs/dpdist_chair_occl_r3}
python -m dpdist_tpu.cli.train_dpdist --data_root data/synthetic \
  --category chair --log_dir "$OUT" --batch_size 16 --learning_rate 1e-4 \
  --max_epoch 3000 --encoder_occlusion 0.25 --encoder_occlusion_prob 0.5 \
  2>&1 | tail -2
echo "occl frozen dpdist done"
