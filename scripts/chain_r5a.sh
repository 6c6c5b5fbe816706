#!/bin/bash
# Round-5 regeneration chain. The 12:56 Aug 18 container replacement
# wiped runs/ (all trained ckpts); the frozen nets now live in results/
# (see NEXT.md). This chain re-creates the lane-1 training stack of
# chain_r4l.sh against the committed frozen nets, copying each best
# policy checkpoint into results/ the moment a training finishes so a
# future wipe can never orphan the stack again. Eval groups B/C/F of
# r4l are NOT here: they evaluated the lost ckpts and their outputs are
# already committed (results/multifam_r4, eval50_r4, postfix_r4).
#
# Usage: scripts/chain_r5a.sh [T_KILL_ALL_epoch_seconds]
# Optional arg 1: hard deadline (epoch seconds) after which no new job
# starts and running jobs are killed, so the driver's bench gets an
# idle chip. Default: none.
set -u
cd "$(dirname "$0")/.."
LOG=runs/chain_r5a.log
mkdir -p runs
T_KILL_ALL=${1:-}
PIDDIR=/tmp/r5a_pids
mkdir -p "$PIDDIR"
say() { echo "[chain $(date -u +%H:%M:%S)] $*" >> "$LOG"; }

past_deadline() {
  [ -n "$T_KILL_ALL" ] && [ "$(date -u +%s)" -ge "$T_KILL_ALL" ]
}

if [ -n "$T_KILL_ALL" ]; then
  ( while ! past_deadline; do sleep 30; done
    say "KILL_ALL deadline"
    for p in "$PIDDIR"/*.pid; do
      [ -f "$p" ] && kill "$(cat "$p")" 2>/dev/null
    done ) &
fi

runjob() {  # runjob <name> <cmd...>
  if past_deadline; then say "skip $1 (past deadline)"; return 1; fi
  say "start $1"
  "${@:2}" >> "runs/r5a_$1.log" 2>&1 &
  echo $! > "$PIDDIR/$1.pid"
  wait "$!"
  local rc=$?
  rm -f "$PIDDIR/$1.pid"
  say "done $1 rc=$rc"
  return $rc
}

# 0) dataset + frozen multifam net (resume-extends the committed ckpt
#    if the local run dir is gone; skips when eval L1 is already good)
if [ ! -d data/synthetic_multi ]; then
  runjob gen_data python -m dpdist_tpu.cli.gen_data \
    --out data/synthetic_multi \
    --families chair sphere box cylinder torus --n_train 64 --n_test 16 \
    --seed 0
fi
if [ ! -f runs/dpdist_multi_r4/ckpt_best.npz ]; then
  mkdir -p runs/dpdist_multi_r4
  cp results/dpdist_multi_r4_ckpt_best.npz runs/dpdist_multi_r4/ckpt_best.npz
  cp results/dpdist_multi_r4_ckpt_best.json runs/dpdist_multi_r4/ckpt_best.json
fi
# extend the frozen net toward the r2-grade eval L1 (~0.011); bounded
runjob dpdist_multi timeout 2400 python -m dpdist_tpu.cli.train_dpdist \
  --data_root data/synthetic_multi --category all \
  --log_dir runs/dpdist_multi_r4 --max_epoch 3000 --eval_every 5 \
  --seed 0 --resume
cp runs/dpdist_multi_r4/ckpt_best.npz results/dpdist_multi_r4_ckpt_best.npz
cp runs/dpdist_multi_r4/ckpt_best.json results/dpdist_multi_r4_ckpt_best.json

DPC=results/dpdist_multi_r4_ckpt_best
DPC_CHAIR=results/ckpt_best_r2   # surviving r2 chair frozen net

MF1200="--num_point 64 --max_loops 8 --out_features 1024 \
  --families chair sphere box cylinder torus --n_templates 125 \
  --max_rotate_deg 45 --sparse 1 --s_rand_points 1.0 --centroid_sub 0 \
  --batch_size 16 --learning_rate 1e-4 \
  --max_epoch 1200 --batches_per_epoch 32 --data_parallel 1 \
  --train_single --grad_clip 1.0 --select_family chair --eval_cases 160"

train_one() {  # train_one <name> <loss> <extra...>
  local d="runs/r4/$1"
  if [ -f "$d/pcrnet_ckpt_final.json" ] || \
     [ -f "results/policy_$1.npz" ]; then
    say "skip $1 (done)"; return 0
  fi
  local ck=""
  [ "$2" = dpdist ] && ck="--dpdist_ckpt $DPC"
  runjob "$1" python -m dpdist_tpu.cli.train_pcrnet --loss_type "$2" \
    --log_dir "$d" $MF1200 $ck "${@:3}"
  # archive whatever best ckpt exists, even from a deadline-killed run
  if [ -f "$d/pcrnet_ckpt_best.npz" ]; then
    cp "$d/pcrnet_ckpt_best.npz" "results/policy_$1.npz"
    cp "$d/pcrnet_ckpt_best.json" "results/policy_$1.json"
    say "archived results/policy_$1"
  fi
}

# 1) trainings, in the r4l priority order (16-loop horizon fix first)
train_one mf_loops16_dpdist dpdist --noise_prob 1.0 --seed 0 \
  --max_loops 16 --max_epoch 600
train_one mf_ar_dpdist dpdist --noise_prob 1.0 --seed 0 \
  --action_reg 0.1 --max_epoch 600
train_one mf_loops16_chamfer chamfer --noise_prob 1.0 --seed 0 \
  --max_loops 16 --max_epoch 600
train_one mf_tsn1200clip_dpdist dpdist --noise_prob 1.0 --seed 0
train_one mf_tsn1200clip_chamfer chamfer --noise_prob 1.0 --seed 0
train_one mf_ts1200clip_s1_dpdist dpdist --seed 1
train_one mf_ts1200clip_s2_dpdist dpdist --seed 2

# 2) AUE equal-budget from scratch (the ep80 resume ckpt is lost);
#    needs the chair dataset (also wiped)
if [ ! -d data/synthetic ]; then
  runjob gen_chair python -m dpdist_tpu.cli.gen_data --out data/synthetic \
    --families chair --n_train 64 --n_test 16 --seed 0
fi
if [ ! -f /tmp/aue_r5_done ]; then
  runjob aue python -m dpdist_tpu.cli.train_aue \
    --dpdist_ckpt "$DPC_CHAIR" --encoder_aue 3dmfv \
    --opt_type chamfer --max_epoch_aue 300 \
    --log_dir runs/r4/aue_3dmfv_chamfer_full \
    && touch /tmp/aue_r5_done
  python scripts/aue_r4_result.py >> "$LOG" 2>&1 && say "aue result"
fi

# 3) eval the retrained candidates at 8 and 50 iterations
runjob evalD bash scripts/eval_r4_matrices.sh D || true
runjob evalE bash scripts/eval_r4_matrices.sh E || true
python scripts/analyze_50iter.py >> "$LOG" 2>&1 && say "50-iter analysis"
say "ALL DONE"
touch /tmp/chain_r5a.done
