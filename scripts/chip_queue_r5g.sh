#!/bin/bash
# Round-5 recovery queue (session 2). The TPU tunnel dropped ~23:47Z and
# killed queue r5f mid-flight (ss_evalonly never ran) and left r5 stuck in
# its probe loop with stale 03:00Z cutoffs from session 1's budget. This
# queue re-owns everything still outstanding, cutoffs extended to this
# session's budget:
#   1. ss_evalonly    — flagship eval tail (generation/fvd rows for the
#                       caterkl_ss scheduled-sampling run; VERDICT #2)
#   2. speed_mnist    — MNIST speed-control eval (VERDICT #5)
#   3. ss3k_p9        — prob=0.9 dose-response arm at 3k (VERDICT #2)
#   4. diag_p9        — acceptance metric on that arm
#   5. mnist2cb       — codebook-restart stage-1 arm (VERDICT #8)
#   6. ceilings       — recon-ceiling eval on both mnist2 stage-1 arms
#   7. prewarm        — exact driver bench command; refreshes
#                       BENCH_LASTGOOD + compile cache (VERDICT #1)
# Trainers use the HEAD (pre-refactor, proven) driver snapshot for A/B
# identity with the runs they compare against (same pattern as r5f).
set -u
cd /root/repo
mkdir -p runs/logs
LOCK=runs/logs/queue_r5g.pid
if [ -e "$LOCK" ] && kill -0 "$(cat "$LOCK")" 2>/dev/null; then
  echo "r5g already running (pid $(cat "$LOCK"))" >&2
  exit 1
fi
echo $$ > "$LOCK"
exec >> runs/logs/queue.log 2>&1
echo "$(date -Is) QUEUE r5g start (recovery: ss eval tail, p9 arm, mnist2cb, prewarm)"

export PYTHONPATH=/root/repo:/root/.axon_site

mkdir -p /tmp/r5g_driver
git show e20c321:train_cater_kl_e2e.py > /tmp/r5g_driver/train_cater_kl_e2e.py
git show e20c321:train_mnist2_e2e.py > /tmp/r5g_driver/train_mnist2_e2e.py

TRAIN_CUTOFF=$(date -d '2026-08-20 08:30Z' +%s)
EVAL_CUTOFF=$(date -d '2026-08-20 10:30Z' +%s)
HARD_END=$(date -d '2026-08-20 11:30Z' +%s)   # nothing outlives this

probe() {
  until timeout 240 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" >/dev/null 2>&1; do
    echo "$(date -Is) r5g TPU unavailable; retry in 120s"
    sleep 120
  done
}

phase() {
  local kind=$1 name=$2 cap=$3; shift 3
  if [ -e "runs/logs/$name.done" ]; then echo "$(date -Is) skip $name (done)"; return 0; fi
  local now; now=$(date +%s)
  if [ "$kind" = train ] && [ "$now" -ge "$TRAIN_CUTOFF" ]; then
    echo "$(date -Is) skip $name (past train cutoff)"; return 0
  fi
  if [ "$kind" = eval ] && [ "$now" -ge "$EVAL_CUTOFF" ]; then
    echo "$(date -Is) skip $name (past eval cutoff)"; return 0
  fi
  local left=$((HARD_END - now))
  [ "$left" -lt "$cap" ] && cap=$left
  [ "$cap" -le 60 ] && { echo "$(date -Is) skip $name (past hard end)"; return 0; }
  probe
  echo "$(date -Is) START $name (cap ${cap}s): $*"
  timeout "$cap" "$@" > "runs/logs/$name.log" 2>&1
  local rc=$?
  echo "$(date -Is) END $name rc=$rc"
  [ $rc -eq 0 ] && touch "runs/logs/$name.done"
  return 0
}

# 1: flagship eval tail (wedged on a lost relay RPC at 23:28Z, rc=143)
phase eval ss_evalonly 5400 python /tmp/r5g_driver/train_cater_kl_e2e.py \
  --out runs/cater_kl_ss --skip-ae --v-kl 25 \
  --num-train 9000 --num-val 600 --static-context-prob 0.5 \
  --eval-only --eval-ckpt final

# 2: MNIST speed-control eval (VERDICT #5, CATER half already landed)
phase eval speed_mnist 7200 python eval_speed_control.py \
  --run runs/mnist_e2e_full --videos 16

# 3: prob=0.9 dose arm at 3k (VERDICT #2 dose-response curve)
if [ ! -d runs/cater_kl_ss3k_p9/klae ]; then
  mkdir -p runs/cater_kl_ss3k_p9 && cp -r runs/cater_kl_e2e/klae runs/cater_kl_ss3k_p9/klae
fi
phase train ss3k_p9 12600 python /tmp/r5g_driver/train_cater_kl_e2e.py \
  --out runs/cater_kl_ss3k_p9 --skip-ae --v-kl 25 --stage2-epochs 40 \
  --static-context-prob 0.9

# 4: acceptance diag on the p9 arm (3k prob=0 baseline: 0.0046)
phase eval diag_p9 7200 python scripts/diag_magep_semantic.py \
  --out runs/cater_kl_ss3k_p9 --num-train 3000 --num-val 600 --v-kl 25

# 5: MNIST codebook-restart stage-1 arm (VERDICT #8)
phase train mnist2cb 10800 python /tmp/r5g_driver/train_mnist2_e2e.py \
  --out runs/mnist2_cb --num-train 8000 --num-val 2000 \
  --codebook-restart --skip-stage2 --bf16

# 6: recon-ceiling evals on both stage-1 arms
phase eval mnist2cb_ceiling 3600 python scripts/eval_mnist2_ceiling.py \
  --run runs/mnist2_cb --num-train 8000 --num-val 2000
phase eval mnist2u_ceiling 3600 python scripts/eval_mnist2_ceiling.py \
  --run runs/mnist2_ab_u --num-train 8000 --num-val 2000

# 7: bench prewarm — always runs (compile cache + BENCH_LASTGOOD refresh)
probe
echo "$(date -Is) START prewarm: python bench.py"
timeout 5400 python bench.py > runs/logs/prewarm.log 2>&1
echo "$(date -Is) END prewarm rc=$?"

rm -f "$LOCK"
echo "$(date -Is) QUEUE r5g COMPLETE"
