#!/bin/bash
# Round-3: bf16 mixed-precision TRAINING quality check — same chair
# config as runs/dpdist_chair_r2 (f32, 3000 epochs) but with
# --dtype bfloat16 (f32 master weights, bf16 table+decoder compute).
# Compare eval-loss trajectories epoch-for-epoch against the r2 run's
# metrics.jsonl.
set -e
cd "$(dirname "$0")/.."
python -m dpdist_tpu.cli.train_dpdist --data_root data/synthetic \
  --category chair --log_dir runs/dpdist_chair_bf16_r3 --batch_size 16 \
  --learning_rate 1e-4 --max_epoch 3000 --dtype bfloat16 2>&1 | tail -2
echo "bf16 quality train done"
