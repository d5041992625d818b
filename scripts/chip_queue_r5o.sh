#!/bin/bash
# r5o: retry of the p9 dose arm after the first attempt wedged on a lost
# relay RPC in the moments phase (killed at 10:00Z after 16 min of zero
# progress; the tunnel probe confirmed the chip healthy once the wedged
# client was killed — same failure mode and remedy as the r5 ss eval
# tail). Reduced to 18 stage-2 epochs to fit the remaining final-session
# window; the acceptance diag (CPU) runs as soon as the final checkpoint
# exists.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p runs/logs
exec >> runs/logs/queue.log 2>&1
echo "$(date -Is) QUEUE r5o start (p9 retry, 18 ep)"

TRAIN_END=$(date -d '2026-08-20 10:46Z' +%s)
now=$(date +%s)
cap=$(( TRAIN_END - now ))
echo "$(date -Is) START p9retry (cap ${cap}s)"
timeout "$cap" python train_cater_kl_e2e.py \
  --out runs/cater_kl_p9 --v-kl 25 --stage2-epochs 18 \
  --static-context-prob 0.9 \
  --eval-videos 12 --diversity-samples 4 --gifs 0 \
  > runs/logs/p9.log 2>&1
rc=$?
echo "$(date -Is) END p9retry rc=$rc"

if [ -e runs/cater_kl_p9/mage/final ] || [ -d runs/cater_kl_p9/mage/final ]; then
  echo "$(date -Is) START diag_p9 (ckpt final, cpu)"
  timeout 2400 nice -n 5 python scripts/diag_magep_semantic.py \
    --out runs/cater_kl_p9 --num-train 3000 --num-val 600 --v-kl 25 \
    > runs/logs/diag_p9.log 2>&1
  rc=$?
  echo "$(date -Is) END diag_p9 rc=$rc"
fi
echo "$(date -Is) QUEUE r5o COMPLETE"
