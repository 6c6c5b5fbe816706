#!/bin/bash
# Sequential continuation: the parallel pair launch wedged the second
# process in remote-compile under contention; run the remaining three
# multifam trainings one at a time after the live dpdist_tsn (pid $1).
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

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

python -m dpdist_tpu.cli.train_pcrnet --loss_type chamfer --noise_prob 1.0 \
  --log_dir "$OUT/pcr_chamfer_tsn" $COMMON 2>&1 | tail -1
python -m dpdist_tpu.cli.train_pcrnet --loss_type chamfer \
  --log_dir "$OUT/pcr_chamfer_ts" $COMMON 2>&1 | tail -1
python -m dpdist_tpu.cli.train_pcrnet --loss_type dpdist \
  --dpdist_ckpt "$DPDIST_CKPT" --log_dir "$OUT/pcr_dpdist_ts" $COMMON 2>&1 | tail -1
echo "multifam_r3 rest done"
