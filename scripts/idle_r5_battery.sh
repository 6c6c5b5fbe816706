#!/bin/bash
# Round-5 idle-chip measurement battery. Run ONLY when the chain's
# trainings+evals are done (chip otherwise idle) — every number here is
# an absolute headline measurement.
#   1. bench.py           -> results/bench_idle_r5.json (same capture the
#                            driver makes at round end, kept for the repo)
#   2. probe_mfv_fused    -> absolute table-vs-mfv A/B (RESULTS roofline)
#   3. profile_bptt       -> the VERDICT #5 stage table (dpdist+chamfer)
#   4. profile_forward    -> per-stage forward breakdown for the revised
#                            roofline section
set -u
cd "$(dirname "$0")/.."
OUT=results/idle_r5
mkdir -p "$OUT"
say() { echo "[idle_r5 $(date -u +%H:%M:%S)] $*"; }

say "bench.py"
timeout 2400 python bench.py > "$OUT/bench_idle_r5.json" 2> "$OUT/bench_idle_r5.err" \
  && cp "$OUT/bench_idle_r5.json" results/bench_idle_r5.json
say "probe_mfv_fused"
timeout 1200 python scripts/probe_mfv_fused.py > "$OUT/probe_mfv_idle.jsonl" 2>/dev/null
say "profile_bptt dpdist"
timeout 1200 python scripts/profile_bptt.py --loss dpdist > "$OUT/profile_bptt_dpdist.jsonl" 2>/dev/null
say "profile_bptt chamfer"
timeout 1200 python scripts/profile_bptt.py --loss chamfer > "$OUT/profile_bptt_chamfer.jsonl" 2>/dev/null
say "profile_forward"
timeout 1200 python scripts/profile_forward.py > "$OUT/profile_forward_idle.jsonl" 2>/dev/null
say "done"
touch "$OUT/.done"
