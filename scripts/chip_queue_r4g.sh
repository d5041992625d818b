#!/bin/bash
# Round-4 chip queue, take 7 — session-4 takeover of r4f's tail after
# caterkl_v50 landed (rc=0, 12:16Z). What v50 showed: KL drifts 15-49 at
# 3k-synthetic scale, so the v_kl=50 setpoint is STILL never crossed and
# beta=0 stays the controller's correct output; action precision is
# unchanged at 0.344 and prior draws are again semantically identical
# (pairwise MSE 5e-5). Combined with the AR-drift diagnostic (moving-token
# accuracy is 26% TEACHER-FORCED -> the gap is generalization over scene
# dynamics, not exposure bias), both remaining quality levers point the
# same way: MORE SCENES + a CROSSABLE setpoint. New order:
#   1. bench_l64 trio [VERDICT #8] — kept from r4f (base landed 3115 f/s
#      rc=0 after the video_posterior fix; kvq8/kvq4 skip if done).
#   2. caterkl_9k [VERDICT #2 + #5]: MAGE+ stage-2 at 3x data (9000
#      scenes) AND v_kl=25 (inside the observed 15-49 drift band, so the
#      controller has something to do: a demonstrated lock on the
#      flagship chain). 40 epochs at 9k = 1.5x the sample passes of
#      v50's 80 at 3k.
#   3. cater9k [VERDICT #1]: discrete stage-2 at 3x data, unchanged from
#      r4f (val CE plateaued 0.435 vs train 0.25 on 3k — overfit; data
#      is the lever for action 0.583 -> >=0.65).
#   4. mnist2_m [VERDICT #4] treatment arm (control u arm finished at 60
#      epochs under the stray r4e child; its eval re-runs as mnist2_u).
#   5. mnist2_u eval + mnist_sign arms — autoresume carries into r5.
set -u
cd /root/repo
mkdir -p runs/logs

LOCK=runs/logs/queue_r4g.pid
if [ -e "$LOCK" ] && kill -0 "$(cat "$LOCK")" 2>/dev/null; then
  echo "queue already running (pid $(cat "$LOCK"))" >&2
  exit 1
fi
echo $$ > "$LOCK"
exec >> runs/logs/queue.log 2>&1
echo "$(date -Is) QUEUE r4g takeover"

probe() {
  until timeout 240 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" >/dev/null 2>&1; do
    echo "$(date -Is) TPU unavailable; retry in 120s"
    sleep 120
  done
}

# Wait for any phase child of the killed r4f loop to release the chip
# before starting (benches must run uncontended; cater trainers must not
# double-run). The stray r4e mnist2_u trainer is deliberately NOT waited
# on: it finishes ~13:40Z and MAGE+ training coexists with it (caterkl_v50
# ran alongside it rc=0). Check-only pgrep — never pattern-kill.
while pgrep -f 'python (bench\.py|train_cater|train_fvd)' >/dev/null 2>&1; do
  echo "$(date -Is) r4g waiting for prior chip job to exit"
  sleep 120
done

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

# 1: KV-quant long-L regime search (base landed 3115 f/s; these skip if done)
phase bench_l64_base timeout 5400 env BENCH_FRAMES=64 BENCH_BATCH=8 python bench.py
phase bench_l64_kvq8 timeout 5400 env BENCH_FRAMES=64 BENCH_BATCH=8 MAGE_KV_QUANT=int8 python bench.py
phase bench_l64_kvq4 timeout 5400 env BENCH_FRAMES=64 BENCH_BATCH=8 MAGE_KV_QUANT=int4 python bench.py

# 2: MAGE+ flagship at 3x data with a crossable PID setpoint (klae is a
# per-frame autoencoder trained on the same procedural distribution; reuse)
if [ ! -d runs/cater_kl_9k/klae ]; then
  mkdir -p runs/cater_kl_9k && cp -r runs/cater_kl_e2e/klae runs/cater_kl_9k/klae
fi
phase caterkl_9k timeout 16200 python train_cater_kl_e2e.py \
  --out runs/cater_kl_9k --skip-ae --v-kl 25 \
  --num-train 9000 --num-val 600 --stage2-epochs 40

# 3: discrete flagship stage-2 at 3x data (stage-1 reused: 39.5 dB recon
# transfers across the same procedural distribution)
if [ ! -d runs/cater9k/vqvae ]; then
  mkdir -p runs/cater9k && cp -r runs/cater_e2e/vqvae runs/cater9k/vqvae
fi
phase cater9k timeout 18000 python train_cater_e2e.py \
  --out runs/cater9k --skip-stage1 --num-train 9000 --num-val 600 \
  --stage2-epochs 80 --bf16

# 4: Modified-Double MNIST motion-loss TREATMENT arm (stage-1 from the u
# dir; control arm already trained to 60 epochs)
if [ ! -d runs/mnist2_ab_m/vqvae ]; then
  mkdir -p runs/mnist2_ab_m && cp -r runs/mnist2_ab_u/vqvae runs/mnist2_ab_m/vqvae
fi
phase mnist2_m timeout 18000 python train_mnist2_e2e.py --out runs/mnist2_ab_m \
  --num-train 8000 --num-val 2000 --stage2-epochs 60 --bf16 \
  --skip-stage1 --motion-loss-weight 4.0

# 5: control-arm eval (autoresume: training is complete, this re-runs the
# eval tail) + sign-binding arms carried into r5
phase mnist2_u timeout 18000 python train_mnist2_e2e.py --out runs/mnist2_ab_u \
  --num-train 8000 --num-val 2000 --stage2-epochs 60 --bf16
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
echo "$(date -Is) QUEUE r4g COMPLETE"
