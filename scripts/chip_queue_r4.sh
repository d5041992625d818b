#!/bin/bash
# Round-4 chip queue — the VERDICT r3 agenda, value-ordered so an outage
# truncates the least important tail. runs/ was wiped again at the round
# boundary (VM reset), so every chain retrains from scratch with this
# round's fixes in:
#   1. fresh headline bench (warms the compile cache + driver number)
#   2. FLAGSHIP discrete CATER chain at reference-scale stage-1
#      (200 epochs + --codebook-restart; VERDICT #1: the 37/512-code
#      collapse bounded the whole chain at 18.9 dB) + longer stage-2
#   3. MAGE+ CATER chain with the FIXED PID anti-windup (VERDICT #2:
#      beta sat at 0 for entire runs) + longer stage-2
#   4. Modified-Double MNIST motion-loss A/B at matched scale
#      (VERDICT #4; arm M gated on arm U per ADVICE r3)
#   5. kernel smoke matrix — every Pallas kernel x env knob on the real
#      chip (VERDICT #3; gn_conv Mosaic fix validated here e2e)
#   6. MAGE+ gnconv bench pair (keep/retire decision, VERDICT #3)
#   7. KV-quant long-L regime search (L=64; VERDICT #8)
#   8. single-MNIST early-loss sign-binding arms (VERDICT #7)
#
# Detached (setsid) so it survives session restarts; phases are
# idempotent via runs/logs/<name>.done markers; each phase waits for the
# TPU backend with a bounded probe.
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

# stage-1 completed before the 02:22 VM reset (391/512 codes, 39.5 dB);
# stage-2 died at epoch 35/120 and the e2e script has no mid-stage resume,
# so reuse the saved stage-1 and rerun stage-2 from scratch.
if [ -d runs/cater_e2e/vqvae/best ]; then
  phase cater timeout 21600 python train_cater_e2e.py --out runs/cater_e2e \
    --stage1-epochs 200 --codebook-restart --stage2-epochs 120 --bf16 \
    --skip-stage1
else
  phase cater timeout 21600 python train_cater_e2e.py --out runs/cater_e2e \
    --stage1-epochs 200 --codebook-restart --stage2-epochs 120 --bf16
fi

phase cater_kl timeout 21600 python train_cater_kl_e2e.py \
  --out runs/cater_kl_e2e --stage2-epochs 80

phase mnist2_u timeout 18000 python train_mnist2_e2e.py --out runs/mnist2_ab_u \
  --num-train 8000 --num-val 2000 --stage2-epochs 60 --bf16
# arm M reuses arm U's stage-1 for clean attribution — gate BOTH the copy
# and the phase on arm U having finished (ADVICE r3: an unguarded arm M
# burned its multi-hour slot against a missing vqvae dir)
if [ -e runs/logs/mnist2_u.done ]; then
  if [ ! -d runs/mnist2_ab_m/vqvae ]; then
    mkdir -p runs/mnist2_ab_m && cp -r runs/mnist2_ab_u/vqvae runs/mnist2_ab_m/vqvae
  fi
  phase mnist2_m timeout 18000 python train_mnist2_e2e.py --out runs/mnist2_ab_m \
    --num-train 8000 --num-val 2000 --stage2-epochs 60 --bf16 \
    --skip-stage1 --motion-loss-weight 4.0
else
  echo "$(date -Is) SKIP mnist2_m (mnist2_u did not finish)"
fi

phase smoke timeout 14400 python scripts/kernel_smoke.py

phase bench_magep timeout 5400 env BENCH_MODEL=mage+ python bench.py
phase bench_magep_gnconv timeout 5400 env BENCH_MODEL=mage+ MAGE_KL_FUSED=gnconv python bench.py

phase bench_l64_base timeout 5400 env BENCH_FRAMES=64 BENCH_BATCH=8 python bench.py
phase bench_l64_kvq8 timeout 5400 env BENCH_FRAMES=64 BENCH_BATCH=8 MAGE_KV_QUANT=int8 python bench.py
phase bench_l64_kvq4 timeout 5400 env BENCH_FRAMES=64 BENCH_BATCH=8 MAGE_KV_QUANT=int4 python bench.py

phase mnist_sign_e timeout 21600 python train_mnist_e2e.py --out runs/mnist_sign_e \
  --num-train 8000 --num-val 2000 --stage1-epochs 120 --stage2-epochs 100 \
  --early-loss-weight 4.0 --early-loss-frames 3 --bf16
# uniform control at matched scale (may be cut by round end; arm E alone
# is interpretable against the 100% gated-probe ceiling)
if [ -e runs/logs/mnist_sign_e.done ]; then
  if [ ! -d runs/mnist_sign_u/vqvae ]; then
    mkdir -p runs/mnist_sign_u && cp -r runs/mnist_sign_e/vqvae runs/mnist_sign_u/vqvae
  fi
  phase mnist_sign_u timeout 21600 python train_mnist_e2e.py --out runs/mnist_sign_u \
    --num-train 8000 --num-val 2000 --stage1-epochs 120 --stage2-epochs 100 \
    --skip-stage1 --bf16
fi
echo "$(date -Is) QUEUE COMPLETE"
