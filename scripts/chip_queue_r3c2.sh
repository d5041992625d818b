#!/bin/bash
# Follow-up queue: the first cater_kl attempt trained both stages to
# completion (checkpoints saved) but its eval died on a transient relay
# error ("response body closed before all bytes were read") during a
# remote compile. The primary queue's bench tail was skipped via
# pre-created .done markers so this queue can run the recovery eval
# FIRST (it completes BASELINE config 5), then the bench sweeps.
# Waits for the primary queue to finish before touching the chip.
set -u
cd /root/repo
mkdir -p runs/logs
exec >> runs/logs/queue2.log 2>&1

until grep -q "QUEUE COMPLETE" runs/logs/queue.log 2>/dev/null; do sleep 60; done

probe() {
  until timeout 240 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" >/dev/null 2>&1; do
    echo "$(date -Is) TPU unavailable; retry in 120s"
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

# retry the eval twice — the failure mode is a transient relay hiccup
phase cater_kl_eval timeout 7200 python train_cater_kl_e2e.py --out runs/cater_kl_e2e --eval-only
if [ ! -e runs/logs/cater_kl_eval.done ]; then
  phase cater_kl_eval_retry timeout 7200 python train_cater_kl_e2e.py --out runs/cater_kl_e2e --eval-only
fi
phase q2_bench_magep timeout 5400 env BENCH_MODEL=mage+ python bench.py
phase q2_bench_magep_gnconv timeout 5400 env BENCH_MODEL=mage+ MAGE_KL_FUSED=gnconv python bench.py
phase q2_bench_kvq8 timeout 4800 env MAGE_KV_QUANT=int8 python bench.py
phase q2_bench_kvq4 timeout 4800 env MAGE_KV_QUANT=int4 python bench.py
echo "$(date -Is) QUEUE2 COMPLETE"
