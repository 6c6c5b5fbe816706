#!/bin/bash
# The reference's canonical registration experiment matrix
# (run_train_and_eval_PCRNet.bash:17-45,65-97), TPU edition:
#   NUM_P=64 points, SPARSE=1 + SAMPLES=1.0 (template/source are DISJOINT
#   random 64-point subsets of the same surface), centroid_sub=0,
#   8 refinement iterations, out_features=1024, poses +-45deg / +-0.01;
#   train EMD, Chamfer and DPDist variants at EQUAL budget with
#   best-checkpoint keeping, then evaluate each with TEST_ITR=8.
# Differences from round-1's experiments (which used 1024-point clouds and
# same-point sampling — a regime where chamfer supervision is nearly
# perfect): this is the paper's actual protocol.
set -e
cd "$(dirname "$0")/.."

DPDIST_CKPT=${DPDIST_CKPT:-runs/dpdist_chair_r2/ckpt_best}
EPOCHS=${EPOCHS:-600}
BPE=${BPE:-32}
NT=${NT:-128}
EVAL_CASES=${EVAL_CASES:-512}
OUT=${OUT:-runs/canonical}

COMMON="--num_point 64 --max_loops 8 --out_features 1024 \
  --families chair --n_templates $NT --max_rotate_deg 45 \
  --sparse 1 --s_rand_points 1.0 --centroid_sub 0 \
  --batch_size 16 --learning_rate 1e-4 \
  --max_epoch $EPOCHS --batches_per_epoch $BPE --data_parallel 1"

mkdir -p "$OUT"

train () {  # $1 = loss type, extra args after
  local loss=$1; shift
  python -m dpdist_tpu.cli.train_pcrnet --loss_type "$loss" \
    --log_dir "$OUT/pcr_$loss" $COMMON "$@" \
    2>&1 | tail -2
}

# two trainings share the chip (reference runs all three with & on 2 GPUs)
train chamfer &
CH_PID=$!
train emd
wait $CH_PID
train dpdist --dpdist_ckpt "$DPDIST_CKPT"

for loss in chamfer emd dpdist; do
  ckpt="$OUT/pcr_$loss/pcrnet_ckpt_best"
  [ -f "$ckpt.json" ] || ckpt="$OUT/pcr_$loss/pcrnet_ckpt_final"
  # clean (canonical protocol), 8 iterations like the reference TEST_ITR
  python -m dpdist_tpu.cli.eval_registration --ckpt "$ckpt" \
    --iterations 8 --num_cases $EVAL_CASES --n_templates 64 \
    --families chair --sparse 1 --s_rand_points 1.0 --centroid_sub 0 \
    --seed 777 --report_dir "$OUT/eval_${loss}_clean" > "$OUT/${loss}_clean.json"
  # corruption: per-point noise
  python -m dpdist_tpu.cli.eval_registration --ckpt "$ckpt" \
    --iterations 8 --num_cases $EVAL_CASES --n_templates 64 \
    --families chair --sparse 1 --s_rand_points 1.0 --centroid_sub 0 \
    --seed 777 --use_noise_data --report_dir "$OUT/eval_${loss}_noise" \
    > "$OUT/${loss}_noise.json"
  # corruption: 25% occlusion
  python -m dpdist_tpu.cli.eval_registration --ckpt "$ckpt" \
    --iterations 8 --num_cases $EVAL_CASES --n_templates 64 \
    --families chair --sparse 1 --s_rand_points 1.0 --centroid_sub 0 \
    --seed 777 --add_occlusions 0.25 --report_dir "$OUT/eval_${loss}_occl" \
    > "$OUT/${loss}_occl.json"
done

echo "=== canonical matrix summary ==="
python - <<'EOF'
import json, glob, os
out = os.environ.get("OUT", "runs/canonical")
for f in sorted(glob.glob(f"{out}/*_*.json")):
    try:
        r = json.load(open(f))
        print(f"{os.path.basename(f):24s} rot {r['rot_err_mean_deg']:7.2f}  "
              f"trans {r['trans_err_mean']:.4f}  "
              f"acc2.5 {r['acc_rot2.5_trans0.05']:.3f}  "
              f"acc5 {r['acc_rot5.0_trans0.05']:.3f}  "
              f"acc10 {r['acc_rot10.0_trans0.1']:.3f}  "
              f"acc20 {r['acc_rot20.0_trans0.2']:.3f}")
    except Exception as e:
        print(f, "ERR", e)
EOF
