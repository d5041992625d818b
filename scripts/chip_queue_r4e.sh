#!/bin/bash
# Round-4 chip queue, take 5 — replaces the r4c tail after the nested-vmap
# GT-corruption fix landed (see tests/test_device_data.py + kernel_smoke
# case nested_vmap_compose). Every recorded generation eval so far compared
# generated frames against CORRUPTED ground truth (XLA:TPU miscompiles the
# nested-vmap gather+compose the evals used; gen PSNR / recon bound /
# precision ceilings / FVD-GT side all understated). Value order:
#   1. flagship discrete CATER re-eval on fixed GT        [headline quality]
#   2. MAGE+ CATER re-eval on fixed GT                    [VERDICT #2/#5]
#   3. on-chip nested-vmap canary (proves the bug + the fix on hardware)
#   4. MAGE+ bench pair -> gnconv keep/retire             [VERDICT #3/#10]
#   5. MNIST FVD-extractor twin (trains on FIXED flat composition)
#   6. KV-quant long-L regime search (L=64)               [VERDICT #8]
#   7. Modified-Double MNIST motion-loss A/B              [VERDICT #4]
#   8. single-MNIST early-loss sign-binding arms          [VERDICT #7]
# All chains auto-resume mid-stage (training/autoresume.py); tail phases
# cut at round end carry progress into round 5.
set -u
cd /root/repo
mkdir -p runs/logs

LOCK=runs/logs/queue_r4e.pid
if [ -e "$LOCK" ] && kill -0 "$(cat "$LOCK")" 2>/dev/null; then
  echo "queue already running (pid $(cat "$LOCK"))" >&2
  exit 1
fi
echo $$ > "$LOCK"
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

# 1+2: re-evals against FIXED ground truth (checkpoints already trained)
phase cater_reeval_gtfix timeout 7200 python train_cater_e2e.py \
  --out runs/cater_e2e --eval-only --bf16
phase caterkl_reeval_gtfix timeout 7200 python train_cater_kl_e2e.py \
  --out runs/cater_kl_e2e --eval-only

# 3: prove the miscompile + the flat form's exactness on the real chip
phase smoke_nested timeout 1800 python scripts/kernel_smoke.py \
  --case nested_vmap_compose

# 4: MAGE+ bench pair (skipped if r4c already finished them)
phase bench_magep timeout 5400 env BENCH_MODEL=mage+ python bench.py
phase bench_magep_gnconv timeout 5400 env BENCH_MODEL=mage+ MAGE_KL_FUSED=gnconv python bench.py

# 5: MNIST FVD-extractor twin (clips_at now uses the flat composition)
phase fvdx_mnist timeout 7200 python train_fvd_extractor.py \
  --dataset mnist --out runs/fvd_extractor_mnist

# 6: KV-quant long-L regime search
phase bench_l64_base timeout 5400 env BENCH_FRAMES=64 BENCH_BATCH=8 python bench.py
phase bench_l64_kvq8 timeout 5400 env BENCH_FRAMES=64 BENCH_BATCH=8 MAGE_KV_QUANT=int8 python bench.py
phase bench_l64_kvq4 timeout 5400 env BENCH_FRAMES=64 BENCH_BATCH=8 MAGE_KV_QUANT=int4 python bench.py

# 7: Modified-Double MNIST motion-loss A/B (evals now on fixed GT)
phase mnist2_u timeout 18000 python train_mnist2_e2e.py --out runs/mnist2_ab_u \
  --num-train 8000 --num-val 2000 --stage2-epochs 60 --bf16
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

# 8: single-MNIST early-loss sign-binding arms
phase mnist_sign_e timeout 21600 python train_mnist_e2e.py --out runs/mnist_sign_e \
  --num-train 8000 --num-val 2000 --stage1-epochs 120 --stage2-epochs 100 \
  --early-loss-weight 4.0 --early-loss-frames 3 --bf16
if [ -e runs/logs/mnist_sign_e.done ]; then
  if [ ! -d runs/mnist_sign_u/vqvae ]; then
    mkdir -p runs/mnist_sign_u && cp -r runs/mnist_sign_e/vqvae runs/mnist_sign_u/vqvae
  fi
  phase mnist_sign_u timeout 21600 python train_mnist_e2e.py --out runs/mnist_sign_u \
    --num-train 8000 --num-val 2000 --stage1-epochs 120 --stage2-epochs 100 \
    --skip-stage1 --bf16
fi
rm -f "$LOCK"
echo "$(date -Is) QUEUE r4e COMPLETE"
