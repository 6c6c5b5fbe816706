#!/bin/bash
# Round-4 recovery chain, take 4: the session got a fresh ~12h horizon
# (ends ~11:15 UTC Aug 18), so the 00:00 deadlines in chain_r4c are
# obsolete.  Priorities once the relay is back:
#   0. Mosaic probe battery v3 (bisect the transposed-bwd compile crash
#      — unblocks the frozen-grad kernel work)
#   1. AUE equal-budget resume (ep80 -> 300, ~13 s/epoch => ~50 min)
#      in the background (two TPU procs serialize on-chip fine)
#   2. eval group B (multifam seeds, --skip_existing)
#   3. eval group C (50-iter no-stop)
#   4. summaries (CPU) + done markers
# Hard deadline 10:30 UTC: kill every TPU job so the driver's
# end-of-round bench.py gets an IDLE chip.
cd "$(dirname "$0")/.."
LOG=runs/chain_r4d.log
AUE_DIR=runs/r4/aue_3dmfv_chamfer_full
T_AUE_CUTOFF=1787040000   # 08:00 UTC Aug 18 — too late to start AUE
T_PROBE_GIVEUP=1787045400 # 09:30 UTC Aug 18 — stop waiting for the relay
T_KILL_ALL=1787049000     # 10:30 UTC Aug 18 — idle the chip for the bench
say() { echo "[chain $(date -u +%H:%M:%S)] $*" >> "$LOG"; }

say "start pid=$$"

guard() {
  while [ "$(date -u +%s)" -lt "$T_KILL_ALL" ]; do sleep 30; done
  say "KILL_ALL deadline: idling the chip"
  for p in /tmp/aue_r4.pid /tmp/evalB_r4.pid /tmp/evalC_r4.pid; do
    [ -f "$p" ] && kill "$(cat "$p")" 2>/dev/null
  done
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
  touch /tmp/chain_r4d.done
  exit 0
fi
touch /tmp/relay_healthy

# 2) Mosaic probe battery (foreground, bounded; small compiles)
say "probe battery v3 starting"
timeout 2400 python scripts/probe_mosaic_v3.py > runs/probe_mosaic_v3.log 2>&1
say "probe battery rc=$? (see runs/probe_mosaic_v3.log)"

# 3) AUE resume (bg, cached compile) if there is enough time left
if [ "$(date -u +%s)" -lt "$T_AUE_CUTOFF" ]; then
  nohup python -m dpdist_tpu.cli.train_aue \
    --dpdist_ckpt runs/dpdist_chair_r2/ckpt_best --encoder_aue 3dmfv \
    --opt_type chamfer --max_epoch_aue 300 --start_epoch 80 \
    --resume "$AUE_DIR/aue_ckpt_best_ep80" --log_dir "$AUE_DIR" \
    >> "$AUE_DIR/stdout.log" 2>&1 &
  echo $! > /tmp/aue_r4.pid
  say "aue restarted pid=$(cat /tmp/aue_r4.pid)"
  sleep 120   # stagger: let the (cached) AUE compile clear first
else
  say "past AUE cutoff; skipping the AUE resume"
fi

# 4) eval group B then C (compiles cached; AUE serializes on-chip)
say "starting eval group B"
bash scripts/eval_r4_matrices.sh B >> "$LOG" 2>&1 &
echo $! > /tmp/evalB_r4.pid
wait "$(cat /tmp/evalB_r4.pid)"; say "group B rc=$?"
python scripts/summarize_seeds.py >> "$LOG" 2>&1 && say "seed summary done"
touch /tmp/groupB.done

if [ "$(date -u +%s)" -lt "$T_KILL_ALL" ]; then
  say "starting eval group C"
  bash scripts/eval_r4_matrices.sh C >> "$LOG" 2>&1 &
  echo $! > /tmp/evalC_r4.pid
  wait "$(cat /tmp/evalC_r4.pid)"; say "group C rc=$?"
  python scripts/analyze_50iter.py >> "$LOG" 2>&1 && say "50-iter analysis done"
  touch /tmp/groupC.done
fi

# 5) wait for AUE to finish (stops itself at ep300), then assemble
if [ -f /tmp/aue_r4.pid ]; then
  AUE_PID=$(cat /tmp/aue_r4.pid)
  while kill -0 "$AUE_PID" 2>/dev/null; do
    [ "$(date -u +%s)" -ge "$T_KILL_ALL" ] && break
    sleep 60
  done
  say "aue finished/killed"
  python scripts/aue_r4_result.py >> "$LOG" 2>&1 && say "aue result assembled"
fi

say "ALL DONE"
touch /tmp/chain_r4d.done
