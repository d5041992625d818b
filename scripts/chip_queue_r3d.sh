#!/bin/bash
# Round-3 session-3 chip queue (2026-08-18 12:3x, after the SECOND VM
# reset wiped runs/ again — the 08-18 morning queue had trained cater_kl
# to completion but nothing under runs/ survives a reset).
#
# Reordered vs chip_queue_r3c.sh: the short bench sweeps run FIRST so a
# ~1h session (or another reset) still lands committed perf rows; the
# multi-hour trainings follow, value-first. Idempotent via
# runs/logs/<name>.done markers; detached (setsid) to survive session
# restarts; bounded TPU probe before every phase.
set -u
cd /root/repo
mkdir -p runs/logs
exec >> runs/logs/queue.log 2>&1

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

# --- short perf phases (minutes each once compiled) ---
phase bench_headline timeout 4800 python bench.py
phase bench_magep timeout 5400 env BENCH_MODEL=mage+ python bench.py
phase bench_magep_gnconv timeout 5400 env BENCH_MODEL=mage+ MAGE_KL_FUSED=gnconv python bench.py
phase bench_kvq8 timeout 4800 env MAGE_KV_QUANT=int8 python bench.py
phase bench_kvq4 timeout 4800 env MAGE_KV_QUANT=int4 python bench.py

# --- long trainings (hours; survive past the session via setsid) ---
phase cater_kl timeout 18000 python train_cater_kl_e2e.py --out runs/cater_kl_e2e
if [ ! -e runs/logs/cater_kl_eval.done ] && [ -e runs/logs/cater_kl.done ]; then
  # belt-and-braces eval rerun: the 08-18a queue's only cater_kl failure
  # mode was a transient relay error during the eval's remote compile
  phase cater_kl_eval timeout 7200 python train_cater_kl_e2e.py --out runs/cater_kl_e2e --eval-only
fi
phase mnist2_u timeout 14400 python train_mnist2_e2e.py --out runs/mnist2_ab_u \
  --num-train 8000 --num-val 2000 --stage2-epochs 40 --bf16
if [ -e runs/logs/mnist2_u.done ] && [ ! -d runs/mnist2_ab_m/vqvae ]; then
  mkdir -p runs/mnist2_ab_m && cp -r runs/mnist2_ab_u/vqvae runs/mnist2_ab_m/vqvae
fi
phase mnist2_m timeout 14400 python train_mnist2_e2e.py --out runs/mnist2_ab_m \
  --num-train 8000 --num-val 2000 --stage2-epochs 40 --bf16 \
  --skip-stage1 --motion-loss-weight 4.0
echo "$(date -Is) QUEUE COMPLETE"
