#!/usr/bin/env bash
# Reference parity: pcrnet-registration/run_train_and_eval_PCRNet.bash —
# the full experiment matrix: train iterative PCRNet with EMD, chamfer,
# and frozen-DPDist losses, then evaluate all three with the fixed
# 50-iteration no-early-stop protocol.
set -euo pipefail
DPDIST_CKPT=${DPDIST_CKPT:?set DPDIST_CKPT to a trained DPDist checkpoint base path}
OUT=${OUT:-runs}
EPOCHS=${EPOCHS:-150}

for LOSS in emd chamfer dpdist; do
  EXTRA=()
  if [ "$LOSS" = dpdist ]; then EXTRA=(--dpdist_ckpt "$DPDIST_CKPT"); fi
  python -m dpdist_tpu.cli.train_pcrnet \
      --loss_type "$LOSS" --log_dir "$OUT/pcrnet_$LOSS" \
      --max_epoch "$EPOCHS" --batch_size 32 --learning_rate 0.001 \
      "${EXTRA[@]}" &
done
wait   # the reference also trains the three variants concurrently (&)

for LOSS in emd chamfer dpdist; do
  python -m dpdist_tpu.cli.eval_registration \
      --ckpt "$OUT/pcrnet_$LOSS/pcrnet_ckpt_final" \
      --iterations 50 --num_cases 512 \
      --report_dir "$OUT/pcrnet_$LOSS/eval"
done
