#!/bin/bash
# Round-5 lock demo, attempt 6 (VERDICT #3): v_kl=4 — the converged-lock
# configuration the lock2 result points to. lock2 (v_kl=2) proved the
# controller sustains beta>0 to the END of training (ep39 beta=0.134,
# beta_mean 0.139) but its unwind rate |ki|*err ~= 2e-4/step kept beta
# saturated ~26 epochs, so the cosine LR died before KL could recover to
# the setpoint (final KL ~0: regulation without convergence). At v_kl=4
# the unwind runs 2x faster (beta leaves saturation ~ep13 with LR still
# live) and the free trajectory (KL 14-18 unregulated) presses KL back UP
# toward the setpoint from below, so the loop can close: beta mid-range,
# KL == v_kl at end. Same instrumented pre-refactor driver as r5c/r5d
# (/tmp/lock8_driver) for per-epoch beta_mean/beta_max. Reference
# capability: modules/mage_model.py:394-434 + config/mage+_caterv2.yaml.
set -u
cd /root/repo
mkdir -p runs/logs
LOCK=runs/logs/queue_r5e.pid
if [ -e "$LOCK" ] && kill -0 "$(cat "$LOCK")" 2>/dev/null; then
  echo "r5e already running (pid $(cat "$LOCK"))" >&2
  exit 1
fi
echo $$ > "$LOCK"
exec >> runs/logs/queue.log 2>&1
echo "$(date -Is) QUEUE r5e start (converged lock demo v_kl=4)"

# wait for r5d (lock2 eval tail) to release its chip share — check-only
while [ -e runs/logs/queue_r5d.pid ] && kill -0 "$(cat runs/logs/queue_r5d.pid)" 2>/dev/null; do
  sleep 120
done

# no new training past the round's train cutoff
if [ "$(date +%s)" -ge "$(date -d '2026-08-20 03:00Z' +%s)" ]; then
  echo "$(date -Is) r5e skipped (past train cutoff)"
  rm -f "$LOCK"; exit 0
fi

if [ ! -d runs/cater_kl_lock4/klae ]; then
  mkdir -p runs/cater_kl_lock4 && cp -r runs/cater_kl_e2e/klae runs/cater_kl_lock4/klae
fi
if [ ! -e runs/logs/caterkl_lock4.done ]; then
  echo "$(date -Is) START caterkl_lock4"
  PYTHONPATH=/root/repo:/root/.axon_site timeout 14400 \
    python /tmp/lock8_driver/train_cater_kl_e2e.py \
    --out runs/cater_kl_lock4 --skip-ae --v-kl 4 --stage2-epochs 40 \
    > runs/logs/caterkl_lock4.log 2>&1
  rc=$?
  echo "$(date -Is) END caterkl_lock4 rc=$rc"
  [ $rc -eq 0 ] && touch runs/logs/caterkl_lock4.done
fi
rm -f "$LOCK"
echo "$(date -Is) QUEUE r5e COMPLETE"
