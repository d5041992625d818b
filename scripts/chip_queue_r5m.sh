#!/bin/bash
# Round-5 session-5 chip queue: the converged PID lock (VERDICT r4 #3,
# final attempt). lock4 (v_kl=4) measured the post-transient free band
# topping out at ~3.7-3.9 nats at 3k-scene scale — the setpoint 4 run
# released beta and settled JUST UNDER its setpoint. v_kl=3 is strictly
# inside the band: the controller must hold a NONZERO equilibrium beta
# to pin KL at 3. Reuses lock4's trained klae (klae autoresume restores
# at epoch 40 and skips the loop) so only moments + stage-2 run
# (~40 min). Stage-2 appends beta/train_kl per epoch-row, so even a
# cut-short run records the equilibrium trajectory.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p runs/logs
exec >> runs/logs/queue.log 2>&1
echo "$(date -Is) QUEUE r5m start (lock3 stage-2 on lock4's klae)"

HARD_END=$(date -d '2026-08-20 10:05Z' +%s)

while kill -0 2794 2>/dev/null; do
  if [ $(date +%s) -ge $HARD_END ]; then
    echo "$(date -Is) r5m ABORT: r5k never drained"; exit 1
  fi
  sleep 20
done
echo "$(date -Is) r5k drained"

if [ ! -e runs/logs/caterkl_lock3.done ]; then
  mkdir -p runs/cater_kl_lock3
  [ -d runs/cater_kl_lock3/klae ] || cp -r runs/cater_kl_lock4/klae runs/cater_kl_lock3/klae
  cap=$(( HARD_END - $(date +%s) ))
  echo "$(date -Is) START caterkl_lock3 (cap ${cap}s)"
  timeout "$cap" python train_cater_kl_e2e.py \
    --out runs/cater_kl_lock3 --v-kl 3 --stage2-epochs 40 \
    > runs/logs/caterkl_lock3.log 2>&1
  rc=$?
  echo "$(date -Is) END caterkl_lock3 rc=$rc"
  [ $rc -eq 0 ] && touch runs/logs/caterkl_lock3.done
fi
echo "$(date -Is) QUEUE r5m COMPLETE"
