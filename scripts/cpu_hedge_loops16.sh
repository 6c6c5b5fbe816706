#!/bin/bash
# CPU hedge for the 16-loop BPTT horizon fix (the round-4 group-C
# finding: every 8-iteration-trained multifam recipe accumulates
# translation drift under the reference's no-stop 50-iteration
# protocol, because the policy's converged-state output is a constant
# small translation an 8-step horizon never penalizes; doubling the
# horizon is the direct trained fix). The TPU relay has been down for
# >12 h — if it stays down this run answers the question on CPU;
# if it comes back, chain_r4l lane 1 trains the canonical TPU version
# and this hedge self-terminates (watchdog below).
#
# Separate out dir (runs/r4/mf_loops16_dpdist_cpu) so the TPU lane's
# runs/r4/mf_loops16_dpdist is never touched. Eval cells get their own
# mf_loops16cpu_dpdist key.
set -u
cd "$(dirname "$0")/.."
LOG=runs/cpu_hedge_loops16.log
OUT=runs/r4/mf_loops16_dpdist_cpu
DEADLINE=${DEADLINE:-1787077500}   # 18:25 UTC Aug 18: keep the single host core free for the driver's bench
say() { echo "[hedge $(date -u +%H:%M:%S)] $*" >> "$LOG"; }

if [ -f /tmp/relay_healthy ]; then
  say "relay already healthy - TPU lane will train loops16; exiting"
  exit 0
fi

say "start pid=$$"

# Budget-matched recipe: 16 loops at 600 epochs = 2x FLOPs/rollout at
# the standard epoch count (identical to chain_r4l lane1's
# mf_loops16_dpdist). EPOCHS can be overridden for a shorter first look.
EPOCHS=${EPOCHS:-600}
DPDIST_PLATFORM=cpu python -m dpdist_tpu.cli.train_pcrnet \
  --loss_type dpdist --dpdist_ckpt runs/dpdist_multi_r2/ckpt_best \
  --log_dir "$OUT" \
  --num_point 64 --max_loops 16 --out_features 1024 \
  --families chair sphere box cylinder torus --n_templates 125 \
  --max_rotate_deg 45 --sparse 1 --s_rand_points 1.0 --centroid_sub 0 \
  --batch_size 16 --learning_rate 1e-4 \
  --max_epoch "$EPOCHS" --batches_per_epoch 32 --data_parallel 1 \
  --train_single --grad_clip 1.0 --noise_prob 1.0 --seed 0 \
  --select_family chair --eval_cases 160 \
  >> "$OUT.stdout.log" 2>&1 &
TRAIN_PID=$!
echo $TRAIN_PID > /tmp/cpu_hedge_train.pid
say "training pid=$TRAIN_PID (EPOCHS=$EPOCHS)"

# watchdog: kill the CPU training if the relay comes back (the TPU lane
# takes over AND the single host core must serve the TPU jobs' host
# work) or at the deadline
while kill -0 $TRAIN_PID 2>/dev/null; do
  if [ -f /tmp/relay_healthy ]; then
    say "relay back - stopping CPU hedge (best-ckpt-so-far kept at $OUT)"
    kill $TRAIN_PID 2>/dev/null
    exit 0
  fi
  if [ "$(date -u +%s)" -ge "$DEADLINE" ]; then
    say "deadline - stopping CPU hedge (best-ckpt-so-far kept)"
    kill $TRAIN_PID 2>/dev/null
    exit 0
  fi
  sleep 60
done
say "training done rc=$?"

# Evals: 8-iter anchor + 50-iter no-stop, full committed 5,070-pose
# multifam protocol (comparable with results/multifam_r4 + eval50_r4).
MF="--iterations 8 --n_templates 125 --families chair sphere box cylinder torus \
  --sparse 1 --s_rand_points 1.0 --centroid_sub 0 --seed 777 \
  --pose_file default"
CK="mf_loops16cpu_dpdist=$OUT/pcrnet_ckpt_best"
[ -f "$OUT/pcrnet_ckpt_final.npz" ] && CK="$CK mf_loops16cpu_fin_dpdist=$OUT/pcrnet_ckpt_final"
python -m dpdist_tpu.cli.eval_matrix --skip_existing $MF --ckpts $CK \
  --conditions clean --out_dir runs/eval_r4_mf >> "$LOG" 2>&1
python -m dpdist_tpu.cli.eval_matrix --skip_existing $MF --iterations 50 \
  --ckpts $CK --conditions clean --out_dir runs/eval50_r4 >> "$LOG" 2>&1
cp runs/eval_r4_mf/mf_loops16cpu_*_clean.json results/multifam_r4/ 2>/dev/null
cp runs/eval50_r4/mf_loops16cpu_*_clean.json results/eval50_r4/ 2>/dev/null
say "evals done"
touch /tmp/cpu_hedge.done
