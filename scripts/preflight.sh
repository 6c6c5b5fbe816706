#!/bin/bash
# Session-start preflight (round-4 VERDICT #7): verify the environment
# survived any container replacement — pip install, frozen nets, data —
# and repair what can be repaired automatically. Safe to run repeatedly.
#
# Usage: bash scripts/preflight.sh [--gen_data]
#   --gen_data: also regenerate missing datasets (25 min CPU for the
#               5-family set); otherwise just report them missing.
set -u
cd "$(dirname "$0")/.."
rc=0

# 1) editable install present outside the repo root?
if ! (cd /tmp && python -c "import dpdist_tpu" 2>/dev/null); then
  echo "[preflight] pip install missing -> reinstalling"
  pip install -e . --no-build-isolation -q || rc=1
else
  echo "[preflight] pip install ok"
fi

# 2) committed frozen nets present and loadable?
for ck in results/ckpt_best results/ckpt_best_r2 \
          results/dpdist_multi_r4_ckpt_best; do
  if [ -f "$ck.npz" ] && [ -f "$ck.json" ]; then
    python - "$ck" <<'EOF' || rc=1
import sys
from dpdist_tpu.cli.train_aue import load_dpdist_checkpoint
cfg, p, s = load_dpdist_checkpoint(sys.argv[1])
print(f"[preflight] frozen net ok: {sys.argv[1]} (num_point={cfg.num_point})")
EOF
  else
    echo "[preflight] MISSING frozen net: $ck"; rc=1
  fi
done

# 3) datasets (gitignored -> wiped on container replacement)
for d in "data/synthetic_multi:--families chair sphere box cylinder torus" \
         "data/synthetic:--families chair"; do
  dir="${d%%:*}"; fams="${d#*:}"
  if [ -d "$dir" ]; then
    echo "[preflight] dataset ok: $dir"
  elif [ "${1:-}" = "--gen_data" ]; then
    echo "[preflight] regenerating $dir"
    python -m dpdist_tpu.cli.gen_data --out "$dir" $fams \
      --n_train 64 --n_test 16 --seed 0 || rc=1
  else
    echo "[preflight] dataset MISSING (rerun with --gen_data): $dir"
  fi
done

# 4) archived policies restorable into runs/ for the eval scripts
mkdir -p runs/r4
n=0
for f in results/policy_*.npz; do
  [ -f "$f" ] || continue
  name=$(basename "$f" .npz); name=${name#policy_}
  tag=best
  case "$name" in
    *_final) tag=final; name=${name%_final} ;;
  esac
  d="runs/r4/$name"
  if [ ! -f "$d/pcrnet_ckpt_$tag.npz" ]; then
    mkdir -p "$d"
    cp "$f" "$d/pcrnet_ckpt_$tag.npz"
    cp "${f%.npz}.json" "$d/pcrnet_ckpt_$tag.json"
    n=$((n + 1))
  fi
done
echo "[preflight] restored $n archived policies into runs/r4/"

[ $rc -eq 0 ] && echo "[preflight] OK" || echo "[preflight] FAILURES (rc=$rc)"
exit $rc
