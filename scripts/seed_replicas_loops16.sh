#!/bin/bash
# Seed replicas of the round-5 top candidate (mf_loops16_dpdist) —
# VERDICT r4 #4: single-seed cells at decision-critical spots. Run ONLY
# after chain_r5a's evals finish AND only if the wall clock leaves the
# chip idle for the driver's end-of-round bench (pass the launch
# deadline as epoch seconds; each 600-epoch training takes ~36 min on
# the idle chip, evals excluded here — the quick chair-slice eval is a
# separate follow-up).
#
# Usage: scripts/seed_replicas_loops16.sh <no_new_training_after_epoch_s>
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:?pass the no-new-training deadline (epoch seconds)}
LOG=runs/seed_replicas_loops16.log
say() { echo "[replicas $(date -u +%H:%M:%S)] $*" >> "$LOG"; }

MF="--num_point 64 --max_loops 16 --out_features 1024 \
  --families chair sphere box cylinder torus --n_templates 125 \
  --max_rotate_deg 45 --sparse 1 --s_rand_points 1.0 --centroid_sub 0 \
  --batch_size 16 --learning_rate 1e-4 --max_epoch 600 \
  --batches_per_epoch 32 --data_parallel 1 --train_single \
  --grad_clip 1.0 --select_family chair --eval_cases 160 \
  --noise_prob 1.0"

for s in 1 2; do
  if [ "$(date -u +%s)" -ge "$DEADLINE" ]; then
    say "skip seed $s (past deadline)"; break
  fi
  name="mf_loops16_s${s}_dpdist"
  [ -f "results/policy_${name}.done" ] && { say "skip $name (done)"; continue; }
  say "start $name"
  timeout 3600 python -m dpdist_tpu.cli.train_pcrnet --loss_type dpdist \
    --dpdist_ckpt results/dpdist_multi_r4_ckpt_best \
    --log_dir "runs/r4/$name" --archive_to "results/policy_${name}" \
    $MF --seed "$s" >> "runs/r5a_${name}.log" 2>&1
  rc=$?
  say "done $name rc=$rc"
  [ $rc -eq 0 ] && touch "results/policy_${name}.done"
done
say "ALL DONE"
