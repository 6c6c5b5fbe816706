#!/bin/bash
# Round-5 lane C: finish the seed story on the no-stop headline.
#   1) mf_tsn1200clip_s2_dpdist  — third seed of the recipe that PASSES
#      the 50-iteration no-stop evaluator (n=2 -> n=3).
#   2) mf_tsn1200clip_s1_chamfer — second seed of the chamfer twin, the
#      single-seed cell behind the "dpdist-loss is what makes it
#      stable" conclusion (RESULTS.md round-5 conclusion 3).
# Each training is followed by the fixed-pose eval at 8 iterations
# (clean+noise, best+final ckpt) and 50 iterations no-stop (clean),
# then the seed/50-iter analyses re-run. Same recipe/budget as
# chain_r5a/r5b (1200 epochs, grad_clip 1.0, noise_prob 1.0).
#
# Usage: scripts/chain_r5c.sh [train_deadline_epoch_s]
set -u
cd "$(dirname "$0")/.."
LOG=runs/chain_r5c.log
say() { echo "[r5c $(date -u +%H:%M:%S)] $*" >> "$LOG"; }
DEADLINE=${1:-}

MF1200="--num_point 64 --max_loops 8 --out_features 1024 \
  --families chair sphere box cylinder torus --n_templates 125 \
  --max_rotate_deg 45 --sparse 1 --s_rand_points 1.0 --centroid_sub 0 \
  --batch_size 16 --learning_rate 1e-4 \
  --max_epoch 1200 --batches_per_epoch 32 --data_parallel 1 \
  --train_single --grad_clip 1.0 --select_family chair --eval_cases 160"
DPC=results/dpdist_multi_r4_ckpt_best
MF="--iterations 8 --n_templates 125 --families chair sphere box cylinder torus \
  --sparse 1 --s_rand_points 1.0 --centroid_sub 0 --seed 777 \
  --pose_file default"

run_cell() {  # run_cell <name> <loss> <seed>
  local NAME=$1 LOSS=$2 SEED=$3 D="runs/r4/$1" rc=0
  if [ -n "$DEADLINE" ] && [ "$(date -u +%s)" -ge "$DEADLINE" ] \
     && [ ! -f "results/policy_$NAME.done" ]; then
    say "past training deadline — skip $NAME"; return 0
  fi
  if [ ! -f "results/policy_$NAME.done" ]; then
    local ck=""
    [ "$LOSS" = dpdist ] && ck="--dpdist_ckpt $DPC"
    say "start train $NAME"
    timeout 9000 python -m dpdist_tpu.cli.train_pcrnet --loss_type "$LOSS" \
      --log_dir "$D" --archive_to "results/policy_$NAME" $MF1200 $ck \
      --noise_prob 1.0 --seed "$SEED" > "runs/r5c_$NAME.log" 2>&1
    rc=$?
    say "train $NAME rc=$rc"
    if [ $rc -eq 0 ]; then
      touch "results/policy_$NAME.done"
      if [ -f "$D/pcrnet_ckpt_final.npz" ]; then
        cp "$D/pcrnet_ckpt_final.npz" "results/policy_${NAME}_final.npz"
        cp "$D/pcrnet_ckpt_final.json" "results/policy_${NAME}_final.json"
      fi
    fi
  elif [ -f "results/policy_$NAME.npz" ] && [ ! -f "$D/pcrnet_ckpt_best.npz" ]; then
    mkdir -p "$D"  # wipe recovery: restore archive for the evals
    cp "results/policy_$NAME.npz" "$D/pcrnet_ckpt_best.npz"
    cp "results/policy_$NAME.json" "$D/pcrnet_ckpt_best.json"
  fi
  if [ -f "$D/pcrnet_ckpt_best.json" ]; then
    local CK="$NAME=$D/pcrnet_ckpt_best"
    [ -f "$D/pcrnet_ckpt_final.json" ] && CK="$CK ${NAME}_fin=$D/pcrnet_ckpt_final"
    say "start eval8 $NAME"
    timeout 5400 python -m dpdist_tpu.cli.eval_matrix --skip_existing $MF \
      --ckpts $CK --conditions clean noise --out_dir runs/eval_r4_mf \
      >> "runs/r5c_eval.log" 2>&1
    say "eval8 rc=$?"
    python scripts/merge_summary.py runs/eval_r4_mf/summary.txt results/multifam_r4/summary.txt 2>/dev/null
    cp runs/eval_r4_mf/*.json results/multifam_r4/ 2>/dev/null
    say "start eval50 $NAME"
    timeout 5400 python -m dpdist_tpu.cli.eval_matrix --skip_existing $MF \
      --iterations 50 --ckpts "$NAME=$D/pcrnet_ckpt_best" --conditions clean \
      --out_dir runs/eval50_r4 >> "runs/r5c_eval.log" 2>&1
    say "eval50 rc=$?"
    python scripts/merge_summary.py runs/eval50_r4/summary.txt results/eval50_r4/summary.txt 2>/dev/null
    cp runs/eval50_r4/*.json results/eval50_r4/ 2>/dev/null
  fi
}

run_cell mf_tsn1200clip_s2_dpdist dpdist 2
run_cell mf_tsn1200clip_s1_chamfer chamfer 1
python scripts/summarize_seeds.py >> "$LOG" 2>&1 && say "seed analysis"
python scripts/analyze_50iter.py >> "$LOG" 2>&1 && say "50-iter analysis"
say "ALL DONE"
touch /tmp/chain_r5c.done
