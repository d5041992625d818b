#!/bin/bash
# Round-5 session-6 chip queue: the prob=0.9 static-context dose arm
# (VERDICT r4 #2 acceptance point — the round's known-unfinished arm;
# queued twice before, lost to the Aug-20 VM reset + 6.7 h tunnel
# outage). Dose-response curve so far (diag_magep_semantic, gen
# moving-energy): prob=0 -> 0.0046, prob=0.5 -> 0.0356 (both at 9k
# scenes, v_kl=25). This arm runs prob=0.9 at 3k scenes (the only
# surviving post-reset stage-1 is lock4's 3k klae — scale caveat
# recorded) with a shortened 20-epoch stage-2 and a trimmed eval tail
# to fit the final session window. Acceptance metric = the CPU diag's
# gen_moving_energy, written to docs/results/ (git-tracked).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p runs/logs
LOCK=runs/logs/queue_r5n.pid
if [ -e "$LOCK" ] && kill -0 "$(cat "$LOCK")" 2>/dev/null; then
  echo "r5n already running (pid $(cat "$LOCK"))" >&2
  exit 1
fi
echo $$ > "$LOCK"
exec >> runs/logs/queue.log 2>&1
echo "$(date -Is) QUEUE r5n start (prob=0.9 dose arm on lock4 klae)"

TRAIN_START_DEADLINE=$(date -d '2026-08-20 10:18Z' +%s)
TRAIN_END=$(date -d '2026-08-20 10:50Z' +%s)

# wait for r5m (lock3 chain) to release the chip
while kill -0 4886 2>/dev/null; do sleep 20; done
echo "$(date -Is) r5m drained"

if [ ! -e runs/logs/p9.done ]; then
  now=$(date +%s)
  if [ "$now" -ge "$TRAIN_START_DEADLINE" ]; then
    echo "$(date -Is) r5n skip p9 (past start deadline)"; rm -f "$LOCK"; exit 0
  fi
  mkdir -p runs/cater_kl_p9
  [ -d runs/cater_kl_p9/klae ] || cp -r runs/cater_kl_lock4/klae runs/cater_kl_p9/klae
  cap=$(( TRAIN_END - now ))
  echo "$(date -Is) START p9 (cap ${cap}s)"
  timeout "$cap" python train_cater_kl_e2e.py \
    --out runs/cater_kl_p9 --v-kl 25 --stage2-epochs 20 \
    --static-context-prob 0.9 \
    --eval-videos 12 --diversity-samples 4 --gifs 0 \
    > runs/logs/p9.log 2>&1
  rc=$?
  echo "$(date -Is) END p9 rc=$rc"
  [ $rc -eq 0 ] && touch runs/logs/p9.done
fi

# acceptance diag (CPU — the script forces jax_platforms=cpu) as soon as
# a stage-2 checkpoint exists; writes docs/results/diag_magep_semantic_
# cater_kl_p9.json
if [ -e runs/cater_kl_p9/mage/final ]; then
  echo "$(date -Is) START diag_p9 (ckpt final, cpu)"
  timeout 3000 nice -n 5 python scripts/diag_magep_semantic.py \
    --out runs/cater_kl_p9 --num-train 3000 --num-val 600 --v-kl 25 \
    > runs/logs/diag_p9.log 2>&1
  rc=$?
  echo "$(date -Is) END diag_p9 rc=$rc"
fi
echo "$(date -Is) QUEUE r5n COMPLETE"
rm -f "$LOCK"
