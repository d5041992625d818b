#!/bin/bash
# Round-5 follow-ups to diag_ss (VERDICT #2):
#   1. ss eval-only — the caterkl_ss eval tail wedged on a lost relay RPC
#      after diversity_val and was killed (queue.log 23:28 rc=143); re-run
#      the eval suite on its saved final checkpoint to record
#      generation_val (action precision) + fvd_val for the flagship.
#   2. ss3k_p9 — dose-response arm: diag_ss measured gen moving-energy
#      0.0046 -> 0.0356 (7.7x) going prob 0 -> 0.5 at 9k, still short of
#      the >=0.3 target; this trains prob=0.9 at 3k scale (fast, and the
#      3k prob=0 diag baseline exists: docs/results/diag_magep_semantic
#      0.0046) to measure the curve's next point.
#   3. diag_p9 — the acceptance metric on that arm.
# Uses the HEAD (pre-refactor, proven) driver snapshot for A/B identity
# with the ss run. Waits for r5e (lock4) to release its chip share.
set -u
cd /root/repo
mkdir -p runs/logs
LOCK=runs/logs/queue_r5f.pid
if [ -e "$LOCK" ] && kill -0 "$(cat "$LOCK")" 2>/dev/null; then
  echo "r5f already running (pid $(cat "$LOCK"))" >&2
  exit 1
fi
echo $$ > "$LOCK"
exec >> runs/logs/queue.log 2>&1
echo "$(date -Is) QUEUE r5f start (ss eval-only + prob=0.9 dose arm)"

mkdir -p /tmp/r5f_driver
git show HEAD:train_cater_kl_e2e.py > /tmp/r5f_driver/train_cater_kl_e2e.py
git show HEAD:scripts/diag_magep_semantic.py > /tmp/r5f_driver/diag_magep_semantic.py

# wait for r5e (lock4) — check-only
while [ -e runs/logs/queue_r5e.pid ] && kill -0 "$(cat runs/logs/queue_r5e.pid)" 2>/dev/null; do
  sleep 120
done

TRAIN_CUTOFF=$(date -d '2026-08-20 03:00Z' +%s)
EVAL_CUTOFF=$(date -d '2026-08-20 04:45Z' +%s)

# 1: flagship eval tail rerun (eval — cheap, cutoff-gated)
if [ ! -e runs/logs/ss_evalonly.done ] && [ "$(date +%s)" -lt "$EVAL_CUTOFF" ]; then
  echo "$(date -Is) START ss_evalonly"
  PYTHONPATH=/root/repo:/root/.axon_site timeout 5400 \
    python /tmp/r5f_driver/train_cater_kl_e2e.py \
    --out runs/cater_kl_ss --skip-ae --v-kl 25 \
    --num-train 9000 --num-val 600 --static-context-prob 0.5 \
    --eval-only --eval-ckpt final \
    > runs/logs/ss_evalonly.log 2>&1
  rc=$?
  echo "$(date -Is) END ss_evalonly rc=$rc"
  [ $rc -eq 0 ] && touch runs/logs/ss_evalonly.done
fi

# 2: prob=0.9 dose arm at 3k (train — cutoff-gated)
if [ "$(date +%s)" -ge "$TRAIN_CUTOFF" ]; then
  echo "$(date -Is) r5f p9 skipped (past train cutoff)"
  rm -f "$LOCK"; exit 0
fi
if [ ! -d runs/cater_kl_ss3k_p9/klae ]; then
  mkdir -p runs/cater_kl_ss3k_p9 && cp -r runs/cater_kl_e2e/klae runs/cater_kl_ss3k_p9/klae
fi
if [ ! -e runs/logs/ss3k_p9.done ]; then
  echo "$(date -Is) START ss3k_p9"
  PYTHONPATH=/root/repo:/root/.axon_site timeout 12600 \
    python /tmp/r5f_driver/train_cater_kl_e2e.py \
    --out runs/cater_kl_ss3k_p9 --skip-ae --v-kl 25 --stage2-epochs 40 \
    --static-context-prob 0.9 \
    > runs/logs/ss3k_p9.log 2>&1
  rc=$?
  echo "$(date -Is) END ss3k_p9 rc=$rc"
  [ $rc -eq 0 ] && touch runs/logs/ss3k_p9.done
fi

# 3: acceptance diag on the p9 arm (eval — cutoff-gated)
if [ ! -e runs/logs/diag_p9.done ] && [ "$(date +%s)" -lt "$EVAL_CUTOFF" ]; then
  echo "$(date -Is) START diag_p9"
  PYTHONPATH=/root/repo:/root/.axon_site timeout 7200 \
    python /tmp/r5f_driver/diag_magep_semantic.py \
    --out runs/cater_kl_ss3k_p9 --num-train 3000 --num-val 600 --v-kl 25 \
    > runs/logs/diag_p9.log 2>&1
  rc=$?
  echo "$(date -Is) END diag_p9 rc=$rc"
  [ $rc -eq 0 ] && touch runs/logs/diag_p9.done
fi
rm -f "$LOCK"
echo "$(date -Is) QUEUE r5f COMPLETE"
