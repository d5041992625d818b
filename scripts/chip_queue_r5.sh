#!/bin/bash
# Round-5 chip queue — the VERDICT r4 agenda, ordered by what it proves:
#   1. caterkl_lock3k [VERDICT #3 + #4]: PID lock demo. At 3k-synthetic
#      scale the UNREGULARIZED KL drifts 15-49 nats (caterkl_v50's trace),
#      so v_kl=20 sits inside the band and the controller must engage:
#      beta leaves 0, KL converges to ~20. The chain's eval tail then
#      measures diversity on the beta-locked posterior (VERDICT #4).
#      Runs concurrently with the in-flight mnist2_m trainer (precedent:
#      caterkl_v50 coexisted with mnist2_u, both rc=0).
#   2. caterkl_ss [VERDICT #2]: flagship MAGE+ at 9k scenes with
#      scheduled sampling (--static-context-prob 0.5, the landed
#      context_latents path) against the caterkl_9k baseline (identical
#      config, prob=0). Done = gen moving-energy >= 0.3 vs baseline 0.005.
#   3. diag_ss: re-run diag_magep_semantic on the ss checkpoint.
#   4. speed_cater9k / speed_mnist [VERDICT #5]: speed-control evals on
#      the best discrete checkpoints (cater9k: action 0.823).
#   5. mnist2cb [VERDICT #8]: MNIST stage-1 with codebook-restart
#      (CATER's 37->391-code fix) + recon-ceiling eval.
#   6. prewarm [VERDICT #1]: run the exact driver bench command once so
#      the XLA compile cache is hot and the chip idle when the driver's
#      end-of-round bench fires. ALWAYS runs, even past the cutoff.
set -u
cd /root/repo
mkdir -p runs/logs

LOCK=runs/logs/queue_r5.pid
if [ -e "$LOCK" ] && kill -0 "$(cat "$LOCK")" 2>/dev/null; then
  echo "queue already running (pid $(cat "$LOCK"))" >&2
  exit 1
fi
echo $$ > "$LOCK"
exec >> runs/logs/queue.log 2>&1
echo "$(date -Is) QUEUE r5 start"

# Past this wall-clock instant no NEW training phase starts; evals are
# cheap and still allowed until EVAL_CUTOFF; prewarm always runs.
TRAIN_CUTOFF=$(date -d '2026-08-20 03:00Z' +%s)
EVAL_CUTOFF=$(date -d '2026-08-20 04:45Z' +%s)

probe() {
  until timeout 240 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" >/dev/null 2>&1; do
    echo "$(date -Is) TPU unavailable; retry in 120s"
    sleep 120
  done
}

phase() {
  local kind=$1 name=$2; shift 2
  if [ -e "runs/logs/$name.done" ]; then echo "$(date -Is) skip $name (done)"; return 0; fi
  local now; now=$(date +%s)
  if [ "$kind" = train ] && [ "$now" -ge "$TRAIN_CUTOFF" ]; then
    echo "$(date -Is) skip $name (past train cutoff)"; return 0
  fi
  if [ "$kind" = eval ] && [ "$now" -ge "$EVAL_CUTOFF" ]; then
    echo "$(date -Is) skip $name (past eval cutoff)"; return 0
  fi
  probe
  echo "$(date -Is) START $name: $*"
  "$@" > "runs/logs/$name.log" 2>&1
  local rc=$?
  echo "$(date -Is) END $name rc=$rc"
  [ $rc -eq 0 ] && touch "runs/logs/$name.done"
  return 0
}

# 1: PID lock demo (concurrent with the in-flight mnist2_m trainer)
if [ ! -d runs/cater_kl_lock3k/klae ]; then
  mkdir -p runs/cater_kl_lock3k && cp -r runs/cater_kl_e2e/klae runs/cater_kl_lock3k/klae
fi
phase train caterkl_lock3k timeout 14400 python train_cater_kl_e2e.py \
  --out runs/cater_kl_lock3k --skip-ae --v-kl 20 --stage2-epochs 40

# Wait for the r4 mnist2_m child to release its share of the chip before
# the 9k-scale run (check-only pgrep — never pattern-kill).
while pgrep -f 'python train_mnist2_e2e.py --out runs/mnist2_ab_m' >/dev/null 2>&1; do
  echo "$(date -Is) r5 waiting for mnist2_m to finish"
  sleep 180
done

# 2: scheduled-sampling flagship (A/B vs caterkl_9k: one variable added)
if [ ! -d runs/cater_kl_ss/klae ]; then
  mkdir -p runs/cater_kl_ss && cp -r runs/cater_kl_e2e/klae runs/cater_kl_ss/klae
fi
phase train caterkl_ss timeout 16200 python train_cater_kl_e2e.py \
  --out runs/cater_kl_ss --skip-ae --v-kl 25 \
  --num-train 9000 --num-val 600 --stage2-epochs 40 \
  --static-context-prob 0.5

# 3: semantic diagnostic on the ss checkpoint (motion energy is the
# VERDICT #2 acceptance metric)
phase eval diag_ss timeout 7200 python scripts/diag_magep_semantic.py \
  --out runs/cater_kl_ss --num-train 9000 --num-val 600 --v-kl 25

# 4: speed-control evals on the best discrete checkpoints
phase eval speed_cater9k timeout 7200 python eval_speed_control_cater.py \
  --run runs/cater9k --num-train 9000 --num-val 600 --videos 12
phase eval speed_mnist timeout 7200 python eval_speed_control.py \
  --run runs/mnist_e2e_full --videos 16

# 5: MNIST codebook-restart stage-1 arm + ceiling eval (needs the
# --codebook-restart flag landed in train_mnist2_e2e.py before it starts)
phase train mnist2cb timeout 10800 python train_mnist2_e2e.py \
  --out runs/mnist2_cb --num-train 8000 --num-val 2000 \
  --codebook-restart --skip-stage2 --bf16
phase eval mnist2cb_ceiling timeout 3600 python scripts/eval_mnist2_ceiling.py \
  --run runs/mnist2_cb --num-train 8000 --num-val 2000
phase eval mnist2u_ceiling timeout 3600 python scripts/eval_mnist2_ceiling.py \
  --run runs/mnist2_ab_u --num-train 8000 --num-val 2000

# 6: bench prewarm — the exact driver command, so its programs are in the
# persistent compile cache and a last-good result is recorded. Always runs.
probe
echo "$(date -Is) START prewarm: python bench.py"
timeout 5400 python bench.py > runs/logs/prewarm.log 2>&1
echo "$(date -Is) END prewarm rc=$?"
grep -o '{.*}' runs/logs/prewarm.log | tail -1 > BENCH_LASTGOOD.json || true

rm -f "$LOCK"
echo "$(date -Is) QUEUE r5 COMPLETE"
