#!/bin/bash
# Round-4 recovery chain: wait for the axon TPU relay to come back, then
# run the remaining round-4 TPU work sequentially with staggered
# compiles (see agent memory: stagger-tpu-compiles):
#   1. resume the equal-budget AUE-3dmfv training (VERDICT r3 #6)
#   2. once it is past compile, eval battery group B (multifam seeds)
#   3. then group C (50-iteration no-stop)
# Log: runs/chain_r4b.log
cd "$(dirname "$0")/.."
LOG=runs/chain_r4b.log
AUE_DIR=runs/r4/aue_3dmfv_chamfer_full
say() { echo "[chain $(date +%H:%M:%S)] $*" >> "$LOG"; }

say "start pid=$$"

# 1) wait for the relay: a tiny dispatch must complete end-to-end
while true; do
  if timeout 90 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp, numpy as np
np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
EOF
  then say "relay healthy"; break
  else say "relay still down, sleeping 180s"; sleep 180
  fi
done

# 2) AUE resume (epochs 80->300, ~3h)
MARK=$(wc -l < "$AUE_DIR/metrics.jsonl")
nohup python -m dpdist_tpu.cli.train_aue \
  --dpdist_ckpt runs/dpdist_chair_r2/ckpt_best --encoder_aue 3dmfv \
  --opt_type chamfer --max_epoch_aue 300 --start_epoch 80 \
  --resume "$AUE_DIR/aue_ckpt_best_ep80" --log_dir "$AUE_DIR" \
  >> "$AUE_DIR/stdout.log" 2>&1 &
AUE_PID=$!
echo $AUE_PID > /tmp/aue_r4.pid
say "aue restarted pid=$AUE_PID"

# 3) wait until AUE is past compile (new metrics lines), then group B
for i in $(seq 1 120); do
  sleep 30
  if ! kill -0 $AUE_PID 2>/dev/null; then say "AUE DIED early rc=?"; break; fi
  NOW=$(wc -l < "$AUE_DIR/metrics.jsonl")
  [ "$NOW" -gt "$MARK" ] && { say "aue past compile after $((i*30))s"; break; }
done

say "starting eval group B"
bash scripts/eval_r4_matrices.sh B >> "$LOG" 2>&1
say "group B rc=$?"

say "starting eval group C"
bash scripts/eval_r4_matrices.sh C >> "$LOG" 2>&1
say "group C rc=$?"

# 4) wait for AUE to finish
wait $AUE_PID
say "aue done rc=$?"
say "ALL DONE"
