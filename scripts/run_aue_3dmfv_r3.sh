#!/bin/bash
# Round-3 (VERDICT #7): train the AUE 3dmfv variant to a result, both
# supervision types, with the BN-parity-fixed decoder.
set -e
cd "$(dirname "$0")/.."
DPDIST_CKPT=${DPDIST_CKPT:-runs/dpdist_chair_r2/ckpt_best}
python -m dpdist_tpu.cli.train_aue --dpdist_ckpt "$DPDIST_CKPT" \
  --encoder_aue 3dmfv --opt_type ours --max_epoch_aue 300 \
  --log_dir runs/aue_3dmfv_ours_r3 2>&1 | tail -1
python -m dpdist_tpu.cli.train_aue --dpdist_ckpt "$DPDIST_CKPT" \
  --encoder_aue 3dmfv --opt_type chamfer --max_epoch_aue 300 \
  --log_dir runs/aue_3dmfv_chamfer_r3 2>&1 | tail -1
echo "aue 3dmfv r3 done"
