#!/bin/bash
# Round-5 session-4 recovery queue (post-VM-reset, 06:57Z Aug 20).
# The reset wiped runs/ (all checkpoints + the r5g/r5h/r5i/r5j queues).
# TPU is back. Only self-contained chip work is still possible in the
# remaining window; the one VERDICT item that needs the chip and carries
# its own stage-1 is the converged PID lock demo (VERDICT r4 #3):
# v_kl=4 sits INSIDE the measured post-transient free band (~4-7 nats),
# the only setpoint on the r5 ladder (v20/v12/v8/v2) where the
# controller must hold a NONZERO equilibrium beta. Full chain from
# scratch: klae (~15 s/ep x 40) + moments (~2 min) + stage2 (~85 s/ep).
# Stage-2 metrics (beta, train_kl) append per-epoch to e2e_metrics.json,
# so even a cut-short run records the trajectory.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p runs/logs
exec >> runs/logs/queue.log 2>&1
echo "$(date -Is) QUEUE r5k start (lock4 from-scratch, post-reset)"

HARD_END=$(date -d '2026-08-20 09:05Z' +%s)

if [ ! -e runs/logs/caterkl_lock4.done ]; then
  cap=$(( HARD_END - $(date +%s) ))
  echo "$(date -Is) START caterkl_lock4 full chain (cap ${cap}s)"
  timeout "$cap" python train_cater_kl_e2e.py \
    --out runs/cater_kl_lock4 --v-kl 4 --stage2-epochs 40 \
    > runs/logs/caterkl_lock4.log 2>&1
  rc=$?
  echo "$(date -Is) END caterkl_lock4 rc=$rc"
  [ $rc -eq 0 ] && touch runs/logs/caterkl_lock4.done
fi

echo "$(date -Is) QUEUE r5k COMPLETE"
