#!/bin/bash
# Round-3: multi-family registration with the round-2 levers applied
# (VERDICT next-#1): train_single full-BPTT + noise-augmented training +
# best-ckpt selection, canonical protocol, 5 families, equal budgets.
# Trains 4 models (2 at a time share the chip): {chamfer,dpdist} x
# {train_single+noise, train_single clean}.
set -e
cd "$(dirname "$0")/.."
DPDIST_CKPT=${DPDIST_CKPT:-runs/dpdist_multi_r2/ckpt_best}
EPOCHS=${EPOCHS:-600}
OUT=${OUT:-runs/multifam_r3}
COMMON="--num_point 64 --max_loops 8 --out_features 1024 \
  --families chair sphere box cylinder torus --n_templates 125 \
  --max_rotate_deg 45 --sparse 1 --s_rand_points 1.0 --centroid_sub 0 \
  --batch_size 16 --learning_rate 1e-4 --train_single \
  --max_epoch $EPOCHS --batches_per_epoch 32 --data_parallel 1"
mkdir -p "$OUT"

# pair 1: train_single + noise
python -m dpdist_tpu.cli.train_pcrnet --loss_type chamfer --noise_prob 1.0 \
  --log_dir "$OUT/pcr_chamfer_tsn" $COMMON 2>&1 | tail -1 &
CH=$!
python -m dpdist_tpu.cli.train_pcrnet --loss_type dpdist --noise_prob 1.0 \
  --dpdist_ckpt "$DPDIST_CKPT" --log_dir "$OUT/pcr_dpdist_tsn" $COMMON 2>&1 | tail -1
wait $CH

# pair 2: train_single, clean
python -m dpdist_tpu.cli.train_pcrnet --loss_type chamfer \
  --log_dir "$OUT/pcr_chamfer_ts" $COMMON 2>&1 | tail -1 &
CH=$!
python -m dpdist_tpu.cli.train_pcrnet --loss_type dpdist \
  --dpdist_ckpt "$DPDIST_CKPT" --log_dir "$OUT/pcr_dpdist_ts" $COMMON 2>&1 | tail -1
wait $CH
echo "multifam_r3 trainings done"
