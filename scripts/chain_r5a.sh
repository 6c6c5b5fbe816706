#!/bin/bash
# Round-5 regeneration chain. The 12:56 Aug 18 container replacement
# wiped runs/ (all trained ckpts); the frozen nets now live in results/
# (see NEXT.md). This chain re-creates the lane-1 training stack of
# chain_r4l.sh against the committed frozen nets. Wipe-resilience is now
# STRUCTURAL (round-4 VERDICT #7): every training passes --archive_to,
# so the trainer itself copies each best ckpt into results/ the moment
# it improves, with the selection metric recorded in the archive json so
# a resumed run can never clobber the archive with a worse checkpoint.
#
# Advisor r4 fixes applied here:
#  - medium #1: the frozen-net resume seeds runs/ with ckpt_<step>.* so
#    trainer.restore()'s latest_checkpoint() regex actually finds it,
#    and the archive's own eval L1 is measured+recorded first
#    (scripts/eval_dpdist_ckpt.py --record) so fit() initializes its
#    best-bar from it — no unconditional cp-back remains.
#  - medium #2: skipping a done training restores the archived policy
#    into runs/r4/<name>/ so eval groups D/E can see it after a wipe.
#  - low #3: the AUE best ckpt is archived via --archive_to and the
#    completion marker lives in results/, not /tmp.
#  - low #4: PIDDIR is a fresh mktemp dir per invocation and the
#    deadline watcher is reaped on exit.
#
# Usage: scripts/chain_r5a.sh [T_KILL_TRAIN_epoch_seconds]
# Optional arg 1: hard deadline (epoch seconds) after which no new
# TRAINING starts and running trainings are killed. The eval groups
# (D/E) still run afterwards — they produce the round's done-criterion
# measurement — bounded by their own timeouts, so pick the deadline
# ~2.5 h before the driver needs an idle chip.
set -u
cd "$(dirname "$0")/.."
LOG=runs/chain_r5a.log
mkdir -p runs results
T_KILL_ALL=${1:-}
PIDDIR=$(mktemp -d /tmp/r5a_pids.XXXXXX)
WATCHER=""
trap '[ -n "$WATCHER" ] && kill "$WATCHER" 2>/dev/null' EXIT
say() { echo "[chain $(date -u +%H:%M:%S)] $*" >> "$LOG"; }

past_deadline() {
  [ -n "$T_KILL_ALL" ] && [ "$(date -u +%s)" -ge "$T_KILL_ALL" ]
}

if [ -n "$T_KILL_ALL" ]; then
  ( while ! past_deadline; do sleep 30; done
    echo "[chain watcher] KILL_ALL deadline" >> "$LOG"
    for p in "$PIDDIR"/*.pid; do
      [ -f "$p" ] && kill "$(cat "$p")" 2>/dev/null
    done ) &
  WATCHER=$!
fi

runjob() {  # runjob <name> <cmd...>  (deadline-governed: trainings)
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

evaljob() {  # evaljob <name> <cmd...>  (NOT deadline-governed)
  say "start $1 (eval)"
  "${@:2}" >> "runs/r5a_$1.log" 2>&1
  say "done $1 rc=$?"
}

# 0) datasets (the launcher normally pre-generates these; the guard is
#    for a fresh container — note gen_data creates the dir up-front, so
#    only run the chain once any EXTERNAL generation has finished)
if [ ! -d data/synthetic_multi ]; then
  runjob gen_data python -m dpdist_tpu.cli.gen_data \
    --out data/synthetic_multi \
    --families chair sphere box cylinder torus --n_train 64 --n_test 16 \
    --seed 0
fi
if [ ! -d data/synthetic ]; then
  runjob gen_chair python -m dpdist_tpu.cli.gen_data --out data/synthetic \
    --families chair --n_train 64 --n_test 16 --seed 0
fi

DPC=results/dpdist_multi_r4_ckpt_best
DPC_CHAIR=results/ckpt_best_r2   # surviving r2 chair frozen net

# 0b) frozen multifam net: qualify the committed archive (record its
#     eval L1 in the json), seed runs/ so --resume can find it, then
#     extend toward the lost r2 net's 0.0127. The trainer only touches
#     the archive on strict improvement.
if ! python -c "
from dpdist_tpu.train.checkpoint import archived_metric
import sys
sys.exit(0 if archived_metric('$DPC', 'eval_l1') is not None else 1)"; then
  runjob qualify python scripts/eval_dpdist_ckpt.py --ckpt "$DPC" \
    --data_root data/synthetic_multi --category all --record
fi
if [ ! -f runs/dpdist_multi_r4/ckpt_best.npz ]; then
  mkdir -p runs/dpdist_multi_r4
  STEP=$(python -c "import json; print(json.load(open('$DPC.json'))['step'])")
  for ext in npz json; do
    cp "$DPC.$ext" "runs/dpdist_multi_r4/ckpt_$STEP.$ext"
    cp "$DPC.$ext" "runs/dpdist_multi_r4/ckpt_best.$ext"
  done
fi
runjob dpdist_multi timeout 2400 python -m dpdist_tpu.cli.train_dpdist \
  --data_root data/synthetic_multi --category all \
  --log_dir runs/dpdist_multi_r4 --max_epoch 3000 --eval_every 5 \
  --seed 0 --resume --archive_to "$DPC"

MF1200="--num_point 64 --max_loops 8 --out_features 1024 \
  --families chair sphere box cylinder torus --n_templates 125 \
  --max_rotate_deg 45 --sparse 1 --s_rand_points 1.0 --centroid_sub 0 \
  --batch_size 16 --learning_rate 1e-4 \
  --max_epoch 1200 --batches_per_epoch 32 --data_parallel 1 \
  --train_single --grad_clip 1.0 --select_family chair --eval_cases 160"

train_one() {  # train_one <name> <loss> <timeout_s> <extra...>
  local d="runs/r4/$1" arch="results/policy_$1"
  if [ -f "results/policy_$1.done" ]; then
    # completed earlier; make the archived policy visible to the eval
    # groups after a wipe (advisor r4 medium #2)
    if [ -f "$arch.npz" ] && [ ! -f "$d/pcrnet_ckpt_best.npz" ]; then
      mkdir -p "$d"
      cp "$arch.npz" "$d/pcrnet_ckpt_best.npz"
      cp "$arch.json" "$d/pcrnet_ckpt_best.json"
    fi
    say "skip $1 (done)"; return 0
  fi
  local ck=""
  [ "$2" = dpdist ] && ck="--dpdist_ckpt $DPC"
  runjob "$1" timeout "$3" python -m dpdist_tpu.cli.train_pcrnet \
    --loss_type "$2" --log_dir "$d" --archive_to "$arch" $MF1200 $ck "${@:4}"
  local rc=$?
  if [ $rc -eq 0 ]; then
    touch "results/policy_$1.done"
    # group D also evaluates the FINAL ckpt (stability check)
    if [ -f "$d/pcrnet_ckpt_final.npz" ]; then
      cp "$d/pcrnet_ckpt_final.npz" "results/policy_$1_final.npz"
      cp "$d/pcrnet_ckpt_final.json" "results/policy_$1_final.json"
    fi
  fi
  return $rc
}

# 1) trainings, two lanes (two TPU processes serialize on-chip but
#    overlap host-side batch prep + dispatch RTT). Lane A carries the
#    dpdist-loss priority order (16-loop horizon fix first); lane B the
#    chamfer cells + the AUE equal-budget rerun, neither of which needs
#    the multifam frozen net.
(
  train_one mf_loops16_dpdist dpdist 9000 --noise_prob 1.0 --seed 0 \
    --max_loops 16 --max_epoch 600
  train_one mf_ar_dpdist dpdist 7200 --noise_prob 1.0 --seed 0 \
    --action_reg 0.1 --max_epoch 600
  train_one mf_tsn1200clip_dpdist dpdist 7200 --noise_prob 1.0 --seed 0
  train_one mf_ts1200clip_s1_dpdist dpdist 7200 --seed 1
  train_one mf_ts1200clip_s2_dpdist dpdist 7200 --seed 2
  say "lane A done"
) &
LANE_A=$!
(
  train_one mf_loops16_chamfer chamfer 9000 --noise_prob 1.0 --seed 0 \
    --max_loops 16 --max_epoch 600
  train_one mf_tsn1200clip_chamfer chamfer 7200 --noise_prob 1.0 --seed 0
  # 2) AUE equal-budget from scratch (the ep80 resume ckpt is lost);
  #    completion marker + best ckpt both live in results/ now
  if [ ! -f results/aue_r5.done ]; then
    runjob aue timeout 10800 python -m dpdist_tpu.cli.train_aue \
      --dpdist_ckpt "$DPC_CHAIR" --encoder_aue 3dmfv \
      --opt_type chamfer --max_epoch_aue 300 \
      --log_dir runs/r4/aue_3dmfv_chamfer_full \
      --archive_to results/aue_3dmfv_chamfer_full_best \
      && touch results/aue_r5.done
    python scripts/aue_r4_result.py >> "$LOG" 2>&1 && say "aue result"
  fi
  say "lane B done"
) &
LANE_B=$!
wait "$LANE_A" "$LANE_B"

# 3) eval the retrained candidates at 8 and 50 iterations (these produce
#    the round's done-criterion measurement, so they run even past the
#    training deadline, bounded by their own timeouts)
evaljob evalD timeout 5400 bash scripts/eval_r4_matrices.sh D
evaljob evalE timeout 9000 bash scripts/eval_r4_matrices.sh E
python scripts/analyze_50iter.py >> "$LOG" 2>&1 && say "50-iter analysis"
say "ALL DONE"
touch /tmp/chain_r5a.done
