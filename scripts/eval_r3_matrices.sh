#!/bin/bash
# Round-3 evaluation battery, all under the FIXED 5,070-pose protocol
# (dpdist_tpu/assets/eval_poses_45deg_5070.csv) so every number is
# comparable across models and rounds (VERDICT r2 #3 + weak #6).
# One eval_matrix process per group shares the compiled program.
set -e
cd "$(dirname "$0")/.."
CANON="--iterations 8 --n_templates 64 --families chair \
  --sparse 1 --s_rand_points 1.0 --centroid_sub 0 --seed 777 \
  --pose_file default"

# 1) canonical chair matrix re-run at 5,070 fixed poses: round-2's
#    clean/noise/occl-trained checkpoints
mkdir -p results/canonical_fixed results/multifam_r3 results/occl_r3
python -m dpdist_tpu.cli.eval_matrix $CANON \
  --ckpts chamfer=runs/canonical/pcr_chamfer/pcrnet_ckpt_best \
          dpdist=runs/canonical/pcr_dpdist/pcrnet_ckpt_best \
          emd=runs/canonical/pcr_emd/pcrnet_ckpt_best \
          chamfer_n=runs/canonical_noise/pcr_chamfer/pcrnet_ckpt_best \
          dpdist_n=runs/canonical_noise/pcr_dpdist/pcrnet_ckpt_best \
          chamfer_ts=runs/ts_chamfer/pcrnet_ckpt_best \
          dpdist_ts=runs/ts_dpdist/pcrnet_ckpt_best \
  --conditions clean noise occl --out_dir runs/eval_canonical_fixed
cp runs/eval_canonical_fixed/summary.txt results/canonical_fixed/
cp runs/eval_canonical_fixed/*.json results/canonical_fixed/ 2>/dev/null || true

# 2) multi-family round-3 models (train_single x {noise, clean}) +
#    round-2 multifam models, with per-family breakdown
MF="--iterations 8 --n_templates 125 --families chair sphere box cylinder torus \
  --sparse 1 --s_rand_points 1.0 --centroid_sub 0 --seed 777 \
  --pose_file default"
CK="mf_r2_chamfer=runs/multifam/pcr_chamfer/pcrnet_ckpt_best \
    mf_r2_dpdist=runs/multifam/pcr_dpdist/pcrnet_ckpt_best"
# pooled rot-err best-ckpt selection is diluted by the 3 rotationally
# symmetric families, so evaluate BOTH best and final checkpoints and
# report per-family slices for each.
for m in chamfer_tsn dpdist_tsn chamfer_ts dpdist_ts; do
  b="runs/multifam_r3/pcr_$m/pcrnet_ckpt_best"
  f="runs/multifam_r3/pcr_$m/pcrnet_ckpt_final"
  [ -f "$b.json" ] && CK="$CK mf_$m=$b"
  [ -f "$f.json" ] && CK="$CK mf_${m}_fin=$f"
done
python -m dpdist_tpu.cli.eval_matrix $MF --ckpts $CK \
  --conditions clean noise --out_dir runs/eval_multifam_r3
cp runs/eval_multifam_r3/summary.txt results/multifam_r3/
cp runs/eval_multifam_r3/*.json results/multifam_r3/ 2>/dev/null || true
echo "eval battery done"

# 3) occlusion experiment: r3 pair (occl-robust frozen dpdist) vs the
#    r2 occl-trained pair, fixed poses, clean/noise/occl conditions
OCK=""
for spec in "occl3_dpdist=runs/canonical_occl_r3/pcr_dpdist" \
            "occl3_chamfer=runs/canonical_occl_r3/pcr_chamfer" \
            "occl2_dpdist=runs/canonical_occl/pcr_dpdist" \
            "occl2_chamfer=runs/canonical_occl/pcr_chamfer"; do
  n="${spec%%=*}"; d="${spec#*=}"
  b="$d/pcrnet_ckpt_best"; [ -f "$b.json" ] || b="$d/pcrnet_ckpt_final"
  [ -f "$b.json" ] && OCK="$OCK $n=$b"
done
python -m dpdist_tpu.cli.eval_matrix $CANON --ckpts $OCK \
  --conditions clean noise occl --out_dir runs/eval_occl_r3
cp runs/eval_occl_r3/summary.txt results/occl_r3/
cp runs/eval_occl_r3/*.json results/occl_r3/ 2>/dev/null || true
echo "occl eval done"
