#!/bin/bash
# Round-5 follower queue: the PID lock demo, attempt 3 (VERDICT #3/#4).
#
# caterkl_lock3k (v_kl=20, 40 ep) measured the unregularized KL band at
# 3k/40-epoch scale: 5.8-17.9 nats (runs/logs/caterkl_lock3k.log) — the
# setpoint was ABOVE the band yet again, so beta=0 stayed the controller's
# correct output. v_kl=12 sits inside the measured band (crossed ~epoch 8,
# leaving 30+ epochs of regulation). This runs in the idle window while
# the main r5 queue waits for the mnist2_m trainer, same coexistence
# precedent as caterkl_v50 || mnist2_u.
set -u
cd /root/repo
mkdir -p runs/logs

LOCK=runs/logs/queue_r5b.pid
if [ -e "$LOCK" ] && kill -0 "$(cat "$LOCK")" 2>/dev/null; then
  echo "r5b already running (pid $(cat "$LOCK"))" >&2
  exit 1
fi
echo $$ > "$LOCK"
exec >> runs/logs/queue.log 2>&1
echo "$(date -Is) QUEUE r5b start (lock demo v_kl=12)"

# wait for the lock3k phase (training + eval tail) to fully finish
while [ ! -e runs/logs/caterkl_lock3k.done ]; do sleep 60; done

probe() {
  until timeout 240 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" >/dev/null 2>&1; do
    echo "$(date -Is) TPU unavailable (r5b); retry in 120s"
    sleep 120
  done
}

phase() {
  local name=$1; shift
  if [ -e "runs/logs/$name.done" ]; then echo "$(date -Is) skip $name (done)"; return 0; fi
  probe
  echo "$(date -Is) START $name: $*"
  "$@" > "runs/logs/$name.log" 2>&1
  local rc=$?
  echo "$(date -Is) END $name rc=$rc"
  [ $rc -eq 0 ] && touch "runs/logs/$name.done"
  return 0
}

if [ ! -d runs/cater_kl_lock12/klae ]; then
  mkdir -p runs/cater_kl_lock12 && cp -r runs/cater_kl_e2e/klae runs/cater_kl_lock12/klae
fi
phase caterkl_lock12 timeout 14400 python train_cater_kl_e2e.py \
  --out runs/cater_kl_lock12 --skip-ae --v-kl 12 --stage2-epochs 40

rm -f "$LOCK"
echo "$(date -Is) QUEUE r5b COMPLETE"
