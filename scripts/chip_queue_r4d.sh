#!/bin/bash
# Round-4 chip queue, take 4 — take 3 plus the MNIST-trained FVD
# extractor twin. Take 3 added the action-trained FVD
# extractor phase (VERDICT missing #3) and a flagship FVD re-eval on
# it. Inherited from take 2:
#   * the original queue survived the outage as a ZOMBIE and resumed next
#     to its relaunch, double-training cater stage-2 onto the same
#     checkpoint dirs — this version writes its PGID to runs/logs/
#     queue_r4d.pid and refuses to start if a live previous instance holds
#     the lock;
#   * every training chain now AUTO-RESUMES mid-stage from <out>/*/last
#     (training/autoresume.py), so a reset/outage costs <=10 epochs, and
#     tail phases cut at round end carry their progress into round 5;
#   * short, VERDICT-critical phases (kernel smoke matrix, gnconv
#     keep/retire bench, KV-quant long-L study) moved AHEAD of the
#     multi-hour MNIST arms so they cannot be starved by the tail again.
#
# Value order:
#   1. FLAGSHIP discrete CATER chain stage-2 (stage-1 done pre-outage:
#      391/512 codes, 39.5 dB) + generation eval        [VERDICT #1]
#   2. MAGE+ CATER chain with the fixed PID anti-windup [VERDICT #2/#5]
#   3. kernel smoke matrix (all Pallas kernels x knobs) [VERDICT #3]
#   4. MAGE+ bench pair -> gnconv keep/retire           [VERDICT #3/#10]
#   5. KV-quant long-L regime search (L=64)             [VERDICT #8]
#   6. Modified-Double MNIST motion-loss A/B            [VERDICT #4]
#   7. single-MNIST early-loss sign-binding arms        [VERDICT #7]
set -u
cd /root/repo
mkdir -p runs/logs

LOCK=runs/logs/queue_r4d.pid
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

phase bench_headline timeout 4800 python bench.py

# stage-1 completed pre-outage; stage-2 restarts clean (the double-trained
# mage/ dir was removed) and auto-resumes from mage/last on any new outage
phase cater timeout 21600 python train_cater_e2e.py --out runs/cater_e2e \
  --stage1-epochs 200 --codebook-restart --stage2-epochs 120 --bf16 \
  --skip-stage1

# action-trained FVD extractor (VERDICT missing #3): trains on generator
# seed 1000 (no eval leakage), exports Mixed_4f features; all later FVD
# evals auto-discover it via evals/fvd.py::resolve_extractor
phase fvdx timeout 7200 python train_fvd_extractor.py --out runs/fvd_extractor

# re-run the flagship's generation eval so its FVD rides the trained
# extractor (the in-run eval predates it)
if [ -e runs/logs/cater.done ] && [ -e runs/logs/fvdx.done ]; then
  phase cater_fvd_reeval timeout 7200 python train_cater_e2e.py \
    --out runs/cater_e2e --eval-only --bf16
fi

# MNIST twin of the extractor (digit/axis/sign labels): makes the MNIST
# chains' FVD meaningful and adds a direction-sensitive feature space
phase fvdx_mnist timeout 7200 python train_fvd_extractor.py \
  --dataset mnist --out runs/fvd_extractor_mnist

phase cater_kl timeout 21600 python train_cater_kl_e2e.py \
  --out runs/cater_kl_e2e --stage2-epochs 80

phase smoke timeout 14400 python scripts/kernel_smoke.py

phase bench_magep timeout 5400 env BENCH_MODEL=mage+ python bench.py
phase bench_magep_gnconv timeout 5400 env BENCH_MODEL=mage+ MAGE_KL_FUSED=gnconv python bench.py

phase bench_l64_base timeout 5400 env BENCH_FRAMES=64 BENCH_BATCH=8 python bench.py
phase bench_l64_kvq8 timeout 5400 env BENCH_FRAMES=64 BENCH_BATCH=8 MAGE_KV_QUANT=int8 python bench.py
phase bench_l64_kvq4 timeout 5400 env BENCH_FRAMES=64 BENCH_BATCH=8 MAGE_KV_QUANT=int4 python bench.py

phase mnist2_u timeout 18000 python train_mnist2_e2e.py --out runs/mnist2_ab_u \
  --num-train 8000 --num-val 2000 --stage2-epochs 60 --bf16
# arm M reuses arm U's stage-1 for clean attribution — gate BOTH the copy
# and the phase on arm U having finished (ADVICE r3)
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
echo "$(date -Is) QUEUE COMPLETE"
