#!/bin/bash
# Post-fix re-baseline: every table cell whose committed number predates
# f1b56d7 ("Fix per-process template nondeterminism") was measured on an
# UNREPRODUCIBLE per-process template draw (synthetic_surface seeded with
# Python's salted hash()). Re-evaluate every such checkpoint on the now-
# stable templates so all round-4 tables are draw-consistent. Within-table
# (same-process) comparisons were always fair; cross-process deltas of
# ~±2 deg mean rot on the chair slice were template-draw variance.
#
# All cells share the fixed 5,070-pose CSV; --skip_existing makes this
# idempotent and lets the recovery chain re-use cached cells.
set -e
cd "$(dirname "$0")/.."
mkdir -p results/postfix_r4

CANON="--iterations 8 --n_templates 64 --families chair \
  --sparse 1 --s_rand_points 1.0 --centroid_sub 0 --seed 777 \
  --pose_file default"
MF="--iterations 8 --n_templates 125 --families chair sphere box cylinder torus \
  --sparse 1 --s_rand_points 1.0 --centroid_sub 0 --seed 777 \
  --pose_file default"

# 1) multifam table (accumulates into the post-fix group-B dir)
MCK="mf_r2_chamfer=runs/multifam/pcr_chamfer/pcrnet_ckpt_best \
     mf_r2_dpdist=runs/multifam/pcr_dpdist/pcrnet_ckpt_best \
     mf_chamfer_ts=runs/multifam_r3/pcr_chamfer_ts/pcrnet_ckpt_best \
     mf_dpdist_ts=runs/multifam_r3/pcr_dpdist_ts/pcrnet_ckpt_best \
     mf_chamfer_tsn=runs/multifam_r3/pcr_chamfer_tsn/pcrnet_ckpt_best \
     mf_dpdist_tsn=runs/multifam_r3/pcr_dpdist_tsn/pcrnet_ckpt_best"
python -m dpdist_tpu.cli.eval_matrix --skip_existing $MF --ckpts $MCK \
  --conditions clean noise --out_dir runs/eval_r4_mf
cp runs/eval_r4_mf/summary.txt results/multifam_r4/
cp runs/eval_r4_mf/*.json results/multifam_r4/ 2>/dev/null || true

# 2) 50-iter no-stop for the r3 train_single pair (the drifting flagship
#    itself was never in the post-fix group-C run)
C50="mf_dpdist_ts=runs/multifam_r3/pcr_dpdist_ts/pcrnet_ckpt_best \
     mf_chamfer_ts=runs/multifam_r3/pcr_chamfer_ts/pcrnet_ckpt_best"
python -m dpdist_tpu.cli.eval_matrix --skip_existing $MF --iterations 50 \
  --ckpts $C50 --conditions clean --out_dir runs/eval50_r4
cp runs/eval50_r4/summary.txt results/eval50_r4/
cp runs/eval50_r4/*.json results/eval50_r4/ 2>/dev/null || true

# 3) single-family chair 50-iter no-stop (re-baselines the "tsn is
#    stable over the 50-iter horizon" control claim)
S50="dpdist_ts=runs/ts_dpdist/pcrnet_ckpt_best \
     chamfer_ts=runs/ts_chamfer/pcrnet_ckpt_best \
     dpdist_tsn=runs/ts_noise/pcr_dpdist/pcrnet_ckpt_best \
     chamfer_tsn=runs/ts_noise/pcr_chamfer/pcrnet_ckpt_best"
python -m dpdist_tpu.cli.eval_matrix --skip_existing $CANON --iterations 50 \
  --ckpts $S50 --conditions clean --out_dir runs/eval50_canon_postfix
cp runs/eval50_canon_postfix/summary.txt results/postfix_r4/summary_eval50_canon.txt
for j in runs/eval50_canon_postfix/*.json; do
  cp "$j" "results/postfix_r4/eval50_canon_$(basename "$j")"
done

# 4) canonical chair matrix: ALL seed-0 cells + the r4 seed replicas in
#    ONE process (replaces both the r3 canonical table and group A)
CCK="chamfer=runs/canonical/pcr_chamfer/pcrnet_ckpt_best \
     dpdist=runs/canonical/pcr_dpdist/pcrnet_ckpt_best \
     emd=runs/canonical/pcr_emd/pcrnet_ckpt_best \
     chamfer_n=runs/canonical_noise/pcr_chamfer/pcrnet_ckpt_best \
     dpdist_n=runs/canonical_noise/pcr_dpdist/pcrnet_ckpt_best \
     chamfer_ts=runs/ts_chamfer/pcrnet_ckpt_best \
     dpdist_ts=runs/ts_dpdist/pcrnet_ckpt_best \
     chamfer_tsn=runs/ts_noise/pcr_chamfer/pcrnet_ckpt_best \
     dpdist_tsn=runs/ts_noise/pcr_dpdist/pcrnet_ckpt_best \
     occl2_chamfer=runs/canonical_occl/pcr_chamfer/pcrnet_ckpt_best \
     occl2_dpdist=runs/canonical_occl/pcr_dpdist/pcrnet_ckpt_best \
     occl3_chamfer=runs/canonical_occl_r3/pcr_chamfer/pcrnet_ckpt_best \
     occl3_dpdist=runs/canonical_occl_r3/pcr_dpdist/pcrnet_ckpt_best"
for cell in ts_s1_chamfer ts_s1_dpdist ts_s2_chamfer ts_s2_dpdist \
            noise_s1_chamfer noise_s1_dpdist noise_s2_chamfer noise_s2_dpdist \
            clean_s1_chamfer clean_s1_dpdist clean_s2_chamfer clean_s2_dpdist; do
  b="runs/r4/$cell/pcrnet_ckpt_best"
  [ -f "$b.json" ] && CCK="$CCK $cell=$b"
done
python -m dpdist_tpu.cli.eval_matrix --skip_existing $CANON --ckpts $CCK \
  --conditions clean noise occl --out_dir runs/eval_canonical_postfix
cp runs/eval_canonical_postfix/summary.txt results/postfix_r4/summary_canonical.txt
for j in runs/eval_canonical_postfix/*.json; do
  cp "$j" "results/postfix_r4/canonical_$(basename "$j")"
done

echo "rebaseline done"
