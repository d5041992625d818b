#!/bin/bash
# Round-5 follower: re-run the converged-PID-lock demo (VERDICT #3,
# attempt 6). caterkl_lock4 (v_kl=4) was killed at epoch ~5 by the session
# cutover (queue.log 00:35Z rc=143); the trajectory design is recorded in
# ROUND_STATUS.md — lock2 proved sustained engagement but over-crushed KL
# to ~0; v_kl=4 doubles the PID unwind rate so the free trajectory presses
# KL back up to the setpoint from below -> converged lock expected by
# ep25-35. Stage-2 autoresume picks up whatever "last" checkpoint the
# killed attempt saved. Runs concurrent with queue r5g (the chip
# timeshares two programs; ~1.5x slowdown each, measured in r5b-e).
set -u
cd /root/repo
mkdir -p runs/logs
LOCK=runs/logs/queue_r5h.pid
if [ -e "$LOCK" ] && kill -0 "$(cat "$LOCK")" 2>/dev/null; then
  echo "r5h already running (pid $(cat "$LOCK"))" >&2
  exit 1
fi
echo $$ > "$LOCK"
exec >> runs/logs/queue.log 2>&1
echo "$(date -Is) QUEUE r5h start (lock4 rerun)"

export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/r5g_driver
git show e20c321:train_cater_kl_e2e.py > /tmp/r5g_driver/train_cater_kl_e2e.py

TRAIN_CUTOFF=$(date -d '2026-08-20 08:30Z' +%s)
HARD_END=$(date -d '2026-08-20 11:30Z' +%s)

until timeout 240 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" >/dev/null 2>&1; do
  echo "$(date -Is) r5h TPU unavailable; retry in 120s"
  sleep 120
done

if [ ! -e runs/logs/caterkl_lock4.done ] && [ "$(date +%s)" -lt "$TRAIN_CUTOFF" ]; then
  if [ ! -d runs/cater_kl_lock4/klae ]; then
    mkdir -p runs/cater_kl_lock4 && cp -r runs/cater_kl_e2e/klae runs/cater_kl_lock4/klae
  fi
  cap=$(( HARD_END - $(date +%s) )); [ "$cap" -gt 14400 ] && cap=14400
  echo "$(date -Is) START caterkl_lock4 (cap ${cap}s)"
  timeout "$cap" python /tmp/r5g_driver/train_cater_kl_e2e.py \
    --out runs/cater_kl_lock4 --skip-ae --v-kl 4 --stage2-epochs 40 \
    > runs/logs/caterkl_lock4.log 2>&1
  rc=$?
  echo "$(date -Is) END caterkl_lock4 rc=$rc"
  [ $rc -eq 0 ] && touch runs/logs/caterkl_lock4.done
fi

rm -f "$LOCK"
echo "$(date -Is) QUEUE r5h COMPLETE"
