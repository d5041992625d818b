#!/bin/bash
# Round-5 session-5 queue: after r5k (lock4) drains, run the FIFTH golden
# e2e diff (cater_kl, VERDICT r4 #7) on the chip — CPU was too slow even
# at the 8-scene tiny config. Pre snapshot = train_cater_kl_e2e.py at
# 7da82bb^ with its tiny constants patched to match the post side's
# (8/8 scenes, 1 klae epoch, batch 4); both sides run the SAME backend
# and the same current mage_tpu library, so the diff isolates the driver
# refactor. Both sides share the XLA compile cache (side 2 is warm).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p runs/logs
exec >> runs/logs/queue.log 2>&1
echo "$(date -Is) QUEUE r5l start (cater_kl golden on chip)"

HARD_END=$(date -d '2026-08-20 10:10Z' +%s)

# gate: wait for r5k to drain (lock4 .done or its pid gone)
while kill -0 "$(cat /tmp/r5k.pid 2>/dev/null)" 2>/dev/null; do
  if [ $(date +%s) -ge $HARD_END ]; then
    echo "$(date -Is) r5l ABORT: r5k never drained"; exit 1
  fi
  sleep 30
done
echo "$(date -Is) r5k drained"

d=train_cater_kl_e2e
mkdir -p /tmp/golden_runs
for side in post pre; do
  marker=runs/logs/golden_caterkl_${side}.done
  [ -e "$marker" ] && continue
  cap=$(( HARD_END - $(date +%s) )); [ $cap -lt 120 ] && { echo "$(date -Is) r5l out of time before $side"; break; }
  [ $cap -gt 2700 ] && cap=2700
  out=/tmp/golden_runs/${d}_chip_${side}
  rm -rf "$out"
  if [ "$side" = pre ]; then script=/tmp/golden_pre/$d.py; else script=$d.py; fi
  echo "$(date -Is) START caterkl golden $side (cap ${cap}s)"
  timeout "$cap" python "$script" --tiny --out "$out" \
    > /tmp/golden_runs/${d}_chip_${side}.log 2>&1
  rc=$?
  echo "$(date -Is) END caterkl golden $side rc=$rc"
  [ $rc -eq 0 ] && touch "$marker"
done

if [ -e runs/logs/golden_caterkl_post.done ] && [ -e runs/logs/golden_caterkl_pre.done ]; then
  python - "$d" <<'PYEOF'
import json, sys
d = sys.argv[1]
VOLATILE = {"time", "sec_per_epoch", "sec"}
def load(side):
    rows = []
    with open(f"/tmp/golden_runs/{d}_chip_{side}/e2e_metrics.json") as fp:
        for line in fp:
            r = json.loads(line)
            rows.append({k: v for k, v in r.items() if k not in VOLATILE})
    return rows
pre, post = load("pre"), load("post")
ok = True
if len(pre) != len(post):
    print(f"MISMATCH {d}: {len(pre)} vs {len(post)} metric rows"); ok = False
for i, (a, b) in enumerate(zip(pre, post)):
    if a != b:
        ok = False
        keys = {k for k in set(a) | set(b) if a.get(k) != b.get(k)}
        print(f"MISMATCH {d} row {i} ({a.get('phase')}): " +
              ", ".join(f"{k}: {a.get(k)!r} vs {b.get(k)!r}" for k in sorted(keys)))
print(("GOLDEN OK " if ok else "GOLDEN FAIL ") + d + " (chip, tiny 8/8)")
PYEOF
fi
echo "$(date -Is) QUEUE r5l COMPLETE"
