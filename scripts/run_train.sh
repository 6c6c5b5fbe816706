#!/usr/bin/env bash
# Reference parity: run_train.bash — canonical single-category DPDist
# training (3DmFV encoder, 512 Gaussians, K=5, np=64, chair).
set -euo pipefail
DATA_ROOT=${DATA_ROOT:-data/synthetic}
LOG_DIR=${LOG_DIR:-runs/dpdist_chair}

if [ ! -d "$DATA_ROOT" ]; then
  python -m dpdist_tpu.cli.gen_data --out "$DATA_ROOT" --families chair \
      --n_train 64 --n_test 16
fi

python -m dpdist_tpu.cli.train_dpdist \
    --data_root "$DATA_ROOT" --log_dir "$LOG_DIR" \
    --category chair --num_point 64 --batch_size 16 \
    --learning_rate 0.0001 --K 5 --embedding_size 512 \
    "$@"
