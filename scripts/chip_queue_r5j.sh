#!/bin/bash
# Round-5 late-window sweeper (session 3). r5g/r5h/r5i captured their
# cutoffs (train 08:30Z / eval 10:30Z / hard 11:30Z) at launch, sized for
# session 2's budget. The TPU tunnel has been down since ~23:47Z; if it
# returns late, those queues will skip their train phases even though
# session 3 runs well past noon. This sweeper waits for all three to
# exit, then re-attempts every phase that has no .done marker with
# extended cutoffs. Phase bodies are copied verbatim from r5g/r5h/r5i
# (same driver snapshot e20c321 for A/B identity); .done markers make
# the re-attempt idempotent.
set -u
cd /root/repo
mkdir -p runs/logs
LOCK=runs/logs/queue_r5j.pid
if [ -e "$LOCK" ] && kill -0 "$(cat "$LOCK")" 2>/dev/null; then
  echo "r5j already running (pid $(cat "$LOCK"))" >&2
  exit 1
fi
echo $$ > "$LOCK"
exec >> runs/logs/queue.log 2>&1
echo "$(date -Is) QUEUE r5j start (late-window sweeper)"

export PYTHONPATH=/root/repo:/root/.axon_site

mkdir -p /tmp/r5g_driver
git show e20c321:train_cater_kl_e2e.py > /tmp/r5g_driver/train_cater_kl_e2e.py
git show e20c321:train_mnist2_e2e.py > /tmp/r5g_driver/train_mnist2_e2e.py

TRAIN_CUTOFF=$(date -d '2026-08-20 12:30Z' +%s)
EVAL_CUTOFF=$(date -d '2026-08-20 14:00Z' +%s)
HARD_END=$(date -d '2026-08-20 14:30Z' +%s)   # leave the chip to the driver

# wait for the session-2 queues to release their phases
for q in queue_r5g queue_r5h queue_r5i; do
  while [ -e "runs/logs/$q.pid" ] && kill -0 "$(cat runs/logs/$q.pid)" 2>/dev/null; do
    sleep 120
  done
done
echo "$(date -Is) r5j: earlier queues drained"

probe() {
  until timeout 240 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" >/dev/null 2>&1; do
    echo "$(date -Is) r5j TPU unavailable; retry in 120s"
    sleep 120
  done
}

phase() {
  local kind=$1 name=$2 cap=$3; shift 3
  if [ -e "runs/logs/$name.done" ]; then echo "$(date -Is) r5j skip $name (done)"; return 0; fi
  local now; now=$(date +%s)
  if [ "$kind" = train ] && [ "$now" -ge "$TRAIN_CUTOFF" ]; then
    echo "$(date -Is) r5j skip $name (past train cutoff)"; return 0
  fi
  if [ "$kind" = eval ] && [ "$now" -ge "$EVAL_CUTOFF" ]; then
    echo "$(date -Is) r5j skip $name (past eval cutoff)"; return 0
  fi
  local left=$((HARD_END - now))
  [ "$left" -lt "$cap" ] && cap=$left
  [ "$cap" -le 60 ] && { echo "$(date -Is) r5j skip $name (past hard end)"; return 0; }
  probe
  echo "$(date -Is) r5j START $name (cap ${cap}s): $*"
  timeout "$cap" "$@" > "runs/logs/$name.log" 2>&1
  local rc=$?
  echo "$(date -Is) r5j END $name rc=$rc"
  [ $rc -eq 0 ] && touch "runs/logs/$name.done"
  return 0
}

# ---- r5g leftovers (same order: flagship eval tail first) ----
phase eval ss_evalonly 5400 python /tmp/r5g_driver/train_cater_kl_e2e.py \
  --out runs/cater_kl_ss --skip-ae --v-kl 25 \
  --num-train 9000 --num-val 600 --static-context-prob 0.5 \
  --eval-only --eval-ckpt final

phase eval speed_mnist 7200 python eval_speed_control.py \
  --run runs/mnist_e2e_full --videos 16

if [ ! -d runs/cater_kl_ss3k_p9/klae ]; then
  mkdir -p runs/cater_kl_ss3k_p9 && cp -r runs/cater_kl_e2e/klae runs/cater_kl_ss3k_p9/klae
fi
phase train ss3k_p9 12600 python /tmp/r5g_driver/train_cater_kl_e2e.py \
  --out runs/cater_kl_ss3k_p9 --skip-ae --v-kl 25 --stage2-epochs 40 \
  --static-context-prob 0.9

phase eval diag_p9 7200 python scripts/diag_magep_semantic.py \
  --out runs/cater_kl_ss3k_p9 --num-train 3000 --num-val 600 --v-kl 25

# ---- r5h leftover: converged PID lock at v_kl=4 (autoresume continues) ----
if [ ! -d runs/cater_kl_lock4/klae ]; then
  mkdir -p runs/cater_kl_lock4 && cp -r runs/cater_kl_e2e/klae runs/cater_kl_lock4/klae
fi
phase train caterkl_lock4 14400 python /tmp/r5g_driver/train_cater_kl_e2e.py \
  --out runs/cater_kl_lock4 --skip-ae --v-kl 4 --stage2-epochs 40

# ---- r5g leftovers, lower priority ----
phase train mnist2cb 10800 python /tmp/r5g_driver/train_mnist2_e2e.py \
  --out runs/mnist2_cb --num-train 8000 --num-val 2000 \
  --codebook-restart --skip-stage2 --bf16

phase eval mnist2cb_ceiling 3600 python scripts/eval_mnist2_ceiling.py \
  --run runs/mnist2_cb --num-train 8000 --num-val 2000
phase eval mnist2u_ceiling 3600 python scripts/eval_mnist2_ceiling.py \
  --run runs/mnist2_ab_u --num-train 8000 --num-val 2000

# ---- r5i leftovers: ss + motion-weight stacked arm ----
if [ ! -d runs/cater_kl_ss3k_p9m/klae ]; then
  mkdir -p runs/cater_kl_ss3k_p9m && cp -r runs/cater_kl_e2e/klae runs/cater_kl_ss3k_p9m/klae
fi
phase train ss3k_p9m 12600 python /tmp/r5g_driver/train_cater_kl_e2e.py \
  --out runs/cater_kl_ss3k_p9m --skip-ae --v-kl 25 --stage2-epochs 40 \
  --static-context-prob 0.9 --motion-loss-weight 4.0

phase eval diag_p9m 7200 python scripts/diag_magep_semantic.py \
  --out runs/cater_kl_ss3k_p9m --num-train 3000 --num-val 600 --v-kl 25

# ---- always: bench prewarm (compile cache + BENCH_LASTGOOD refresh) ----
if [ "$(date +%s)" -lt "$HARD_END" ]; then
  probe
  echo "$(date -Is) r5j START prewarm: python bench.py"
  timeout 5400 python bench.py > runs/logs/prewarm_r5j.log 2>&1
  echo "$(date -Is) r5j END prewarm rc=$?"
fi

rm -f "$LOCK"
echo "$(date -Is) QUEUE r5j COMPLETE"
