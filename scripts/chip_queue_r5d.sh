#!/bin/bash
# Round-5 lock demo, attempt 5 (VERDICT #3/#4): v_kl=2 — far BELOW the
# end-of-run free KL at 3k/40ep (every recorded trajectory stays above
# ~4 after the warmup transient: lock8's crushed tail 3.9-6.6, lock12's
# lightly-regulated tail 7-11, lock3k's free tail 5.8-17.9), so the
# integral term must stay wound up and beta must remain >0 through the
# END of training: a sustained lock with KL pinned at the setpoint, not
# just the warmup-transient engagement lock8 demonstrated. Uses the same
# instrumented pre-refactor driver copy as r5c (/tmp/lock8_driver) so
# beta_mean/beta_max are logged per epoch. Waits for the r5c lock8 run
# to release its chip share first.
set -u
cd /root/repo
mkdir -p runs/logs
LOCK=runs/logs/queue_r5d.pid
if [ -e "$LOCK" ] && kill -0 "$(cat "$LOCK")" 2>/dev/null; then
  echo "r5d already running (pid $(cat "$LOCK"))" >&2
  exit 1
fi
echo $$ > "$LOCK"
exec >> runs/logs/queue.log 2>&1
echo "$(date -Is) QUEUE r5d start (sustained lock demo v_kl=2)"

# wait for r5c (lock8) to finish — check-only, never pattern-kill
while [ -e runs/logs/queue_r5c.pid ] && kill -0 "$(cat runs/logs/queue_r5c.pid)" 2>/dev/null; do
  sleep 120
done

# no new training past the round's train cutoff
if [ "$(date +%s)" -ge "$(date -d '2026-08-20 03:00Z' +%s)" ]; then
  echo "$(date -Is) r5d skipped (past train cutoff)"
  rm -f "$LOCK"; exit 0
fi

if [ ! -d runs/cater_kl_lock2/klae ]; then
  mkdir -p runs/cater_kl_lock2 && cp -r runs/cater_kl_e2e/klae runs/cater_kl_lock2/klae
fi
if [ ! -e runs/logs/caterkl_lock2.done ]; then
  echo "$(date -Is) START caterkl_lock2"
  PYTHONPATH=/root/repo:/root/.axon_site timeout 14400 \
    python /tmp/lock8_driver/train_cater_kl_e2e.py \
    --out runs/cater_kl_lock2 --skip-ae --v-kl 2 --stage2-epochs 40 \
    > runs/logs/caterkl_lock2.log 2>&1
  rc=$?
  echo "$(date -Is) END caterkl_lock2 rc=$rc"
  [ $rc -eq 0 ] && touch runs/logs/caterkl_lock2.done
fi
rm -f "$LOCK"
echo "$(date -Is) QUEUE r5d COMPLETE"
