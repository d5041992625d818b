#!/bin/bash
# Round-5 lock demo, attempt 4 (VERDICT #3/#4): v_kl=8, BELOW the observed
# unregulated drift floor at 3k/40ep (lock3k free trajectory 14-18 nats
# after warmup; lock12's lightly-regulated one 7-11), so the controller
# must engage persistently: expect beta>0 sustained and KL converging to
# ~8. The driver copy in /tmp/lock8_driver is the PROVEN lock12 combo
# (pre-refactor kl driver + on-chip-proven train_cater_e2e) plus
# beta_mean/beta_max per-epoch logging so engagement is visible between
# the 5-epoch samples. Coexists with the caterkl_ss trainer (precedent:
# lock12 beside mnist2_m).
set -u
cd /root/repo
mkdir -p runs/logs
LOCK=runs/logs/queue_r5c.pid
if [ -e "$LOCK" ] && kill -0 "$(cat "$LOCK")" 2>/dev/null; then
  echo "r5c already running (pid $(cat "$LOCK"))" >&2
  exit 1
fi
echo $$ > "$LOCK"
exec >> runs/logs/queue.log 2>&1
echo "$(date -Is) QUEUE r5c start (lock demo v_kl=8, instrumented beta)"
if [ ! -d runs/cater_kl_lock8/klae ]; then
  mkdir -p runs/cater_kl_lock8 && cp -r runs/cater_kl_e2e/klae runs/cater_kl_lock8/klae
fi
if [ ! -e runs/logs/caterkl_lock8.done ]; then
  echo "$(date -Is) START caterkl_lock8"
  PYTHONPATH=/root/repo:/root/.axon_site timeout 14400 \
    python /tmp/lock8_driver/train_cater_kl_e2e.py \
    --out runs/cater_kl_lock8 --skip-ae --v-kl 8 --stage2-epochs 40 \
    > runs/logs/caterkl_lock8.log 2>&1
  rc=$?
  echo "$(date -Is) END caterkl_lock8 rc=$rc"
  [ $rc -eq 0 ] && touch runs/logs/caterkl_lock8.done
fi
rm -f "$LOCK"
echo "$(date -Is) QUEUE r5c COMPLETE"
