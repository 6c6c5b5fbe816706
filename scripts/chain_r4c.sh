#!/bin/bash
# Round-4 recovery chain, deadline-aware rewrite of chain_r4b.sh.
#
# The relay outage has eaten most of the round; the priorities with the
# time that remains (nominal round end ~00:29 UTC) are, in order:
#   1. eval group B (multifam seed replication, VERDICT r3 #1) — cells
#      are ~1-2 min each with the cached compile, 13 of 20 left
#   2. eval group C (50-iteration no-stop, VERDICT r3 #3)
#   3. AUE equal-budget resume (VERDICT r3 #6) — only started if the
#      relay is back before 23:10 (any progress past ep110 helps; the
#      trainer saves ckpt_best as it goes)
# Hard deadline 00:00 UTC: kill every TPU job so the driver's
# end-of-round bench.py runs on an IDLE chip (contended numbers are
# +-50% noisy and would read as a perf regression vs BENCH_r03).
cd "$(dirname "$0")/.."
LOG=runs/chain_r4c.log
AUE_DIR=runs/r4/aue_3dmfv_chamfer_full
T_AUE_CUTOFF=1787008200   # 23:10:00 UTC — too late to bother starting AUE
T_PROBE_GIVEUP=1787010600 # 23:50:00 UTC — stop waiting for the relay
T_KILL_ALL=1787011200     # 00:00:00 UTC — idle the chip for the driver bench
say() { echo "[chain $(date -u +%H:%M:%S)] $*" >> "$LOG"; }

say "start pid=$$"

# deadline guard (background): kill AUE + any eval_matrix we started
guard() {
  while [ "$(date -u +%s)" -lt "$T_KILL_ALL" ]; do sleep 20; done
  say "KILL_ALL deadline: idling the chip"
  [ -f /tmp/aue_r4.pid ] && kill "$(cat /tmp/aue_r4.pid)" 2>/dev/null
  [ -f /tmp/evalB_r4.pid ] && kill "$(cat /tmp/evalB_r4.pid)" 2>/dev/null
  [ -f /tmp/evalC_r4.pid ] && kill "$(cat /tmp/evalC_r4.pid)" 2>/dev/null
  say "KILL_ALL done"
}
guard &
GUARD_PID=$!

# 1) wait for the relay: a tiny dispatch must complete end-to-end
HEALTHY=0
while [ "$(date -u +%s)" -lt "$T_PROBE_GIVEUP" ]; do
  if timeout 90 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp, numpy as np
np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
EOF
  then say "relay healthy"; HEALTHY=1; break
  else say "relay still down, sleeping 180s"; sleep 180
  fi
done
if [ "$HEALTHY" = 0 ]; then
  say "gave up waiting for the relay; nothing run"
  kill $GUARD_PID 2>/dev/null
  touch /tmp/chain_r4c.done
  exit 0
fi

# 2) AUE resume (bg, cached compile) if there is enough time left
if [ "$(date -u +%s)" -lt "$T_AUE_CUTOFF" ]; then
  nohup python -m dpdist_tpu.cli.train_aue \
    --dpdist_ckpt runs/dpdist_chair_r2/ckpt_best --encoder_aue 3dmfv \
    --opt_type chamfer --max_epoch_aue 300 --start_epoch 80 \
    --resume "$AUE_DIR/aue_ckpt_best_ep80" --log_dir "$AUE_DIR" \
    >> "$AUE_DIR/stdout.log" 2>&1 &
  echo $! > /tmp/aue_r4.pid
  say "aue restarted pid=$(cat /tmp/aue_r4.pid)"
  sleep 90   # stagger: let the (cached) AUE compile clear first
else
  say "past AUE cutoff; skipping the AUE resume"
fi

# 3) eval group B then C (serialize with AUE on-chip; compiles cached)
say "starting eval group B"
bash scripts/eval_r4_matrices.sh B >> "$LOG" 2>&1 &
echo $! > /tmp/evalB_r4.pid
wait "$(cat /tmp/evalB_r4.pid)"; say "group B rc=$?"

if [ "$(date -u +%s)" -lt "$T_KILL_ALL" ]; then
  say "starting eval group C"
  bash scripts/eval_r4_matrices.sh C >> "$LOG" 2>&1 &
  echo $! > /tmp/evalC_r4.pid
  wait "$(cat /tmp/evalC_r4.pid)"; say "group C rc=$?"
fi

# 4) wind down: make sure the chip is idle before the driver bench
[ -f /tmp/aue_r4.pid ] && kill "$(cat /tmp/aue_r4.pid)" 2>/dev/null
say "ALL DONE (aue killed if still running)"
touch /tmp/chain_r4c.done
