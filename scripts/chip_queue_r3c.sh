#!/bin/bash
# Round-3 continuation chip queue (2026-08-18, post VM reset).
#
# The 08-17 VM reset wiped runs/ (all trained checkpoints) and the JAX
# compile cache; the TPU backend is back. This queue re-derives the two
# highest-value missing results and the bench sweeps, value-first so an
# outage truncates the least important tail:
#   1. fresh discrete headline bench (also warms the driver's bench cache)
#   2. MAGE+ CATER-GEN-v2 full chain (BASELINE config 5 — the only recipe
#      whose stage-2 never got past epoch 0 before the backend outage)
#   3. Modified-Double MNIST motion-loss A/B at matched reduced scale
#      (8k clips, 40 epochs, same seed/data/batches; arm M sets
#      motion_loss_weight=4 to attack the measured copy-frame hedge)
#   4. MAGE+ bench with/without the fused GN->silu->conv kernel
#   5. KV-quant decode bench (int8/int4)
#
# Detached (setsid) so it survives session restarts; phases are
# idempotent via runs/logs/<name>.done markers; each phase waits for the
# TPU backend with a bounded probe (the backend disappeared for hours on
# 08-17 — a hang here must not wedge the queue).
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

phase bench_headline timeout 4800 python bench.py
phase cater_kl timeout 18000 python train_cater_kl_e2e.py --out runs/cater_kl_e2e
phase mnist2_u timeout 14400 python train_mnist2_e2e.py --out runs/mnist2_ab_u \
  --num-train 8000 --num-val 2000 --stage2-epochs 40 --bf16
if [ -e runs/logs/mnist2_u.done ] && [ ! -d runs/mnist2_ab_m/vqvae ]; then
  mkdir -p runs/mnist2_ab_m && cp -r runs/mnist2_ab_u/vqvae runs/mnist2_ab_m/vqvae
fi
phase mnist2_m timeout 14400 python train_mnist2_e2e.py --out runs/mnist2_ab_m \
  --num-train 8000 --num-val 2000 --stage2-epochs 40 --bf16 \
  --skip-stage1 --motion-loss-weight 4.0
phase bench_magep timeout 5400 env BENCH_MODEL=mage+ python bench.py
phase bench_magep_gnconv timeout 5400 env BENCH_MODEL=mage+ MAGE_KL_FUSED=gnconv python bench.py
phase bench_kvq8 timeout 4800 env MAGE_KV_QUANT=int8 python bench.py
phase bench_kvq4 timeout 4800 env MAGE_KV_QUANT=int4 python bench.py
echo "$(date -Is) QUEUE COMPLETE"
