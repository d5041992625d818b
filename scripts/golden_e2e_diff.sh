#!/bin/bash
# Golden tiny-run diff: the refactored e2e drivers (working tree, shared
# mage_tpu/training/e2e.py loops) must reproduce the pre-refactor drivers'
# METRIC streams bit-for-bit (minus wall-clock fields). Runs everything on
# CPU (PALLAS_AXON_POOL_IPS cleared at the shell — CLAUDE.md).
# Usage: bash scripts/golden_e2e_diff.sh [driver ...]
set -u
cd /root/repo
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
export PYTHONPATH=/root/repo:/root/.axon_site

DRIVERS=${@:-"train_mnist_e2e train_mnist2_e2e train_cater_e2e train_cater_kl_e2e train_mnist_kl_e2e"}
mkdir -p /tmp/golden_runs
overall=0
for d in $DRIVERS; do
  for side in pre post; do
    out=/tmp/golden_runs/${d}_${side}
    rm -rf "$out"
    if [ "$side" = pre ]; then script=/tmp/golden_pre/$d.py; else script=$d.py; fi
    echo "=== $d $side"
    timeout 2400 python "$script" --tiny --out "$out" \
      > /tmp/golden_runs/${d}_${side}.log 2>&1
    rc=$?
    if [ $rc -ne 0 ]; then echo "FAIL rc=$rc ($d $side)"; tail -5 /tmp/golden_runs/${d}_${side}.log; overall=1; continue 2; fi
  done
  python - "$d" <<'EOF'
import json, sys
d = sys.argv[1]
VOLATILE = {"time", "sec_per_epoch", "sec"}
def load(side):
    rows = []
    with open(f"/tmp/golden_runs/{d}_{side}/e2e_metrics.json") as fp:
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
print(("GOLDEN OK " if ok else "GOLDEN FAIL ") + d)
sys.exit(0 if ok else 1)
EOF
  [ $? -ne 0 ] && overall=1
done
echo "overall rc=$overall"
exit $overall
