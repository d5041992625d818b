#!/bin/bash
# mnist_kl golden diff rerun: the first attempt (golden_e2e_diff.sh) blew
# its 2,400 s/side budget in stage 2 on the contended 1-vCPU host. Tiny
# constants were shrunk identically in BOTH the /tmp/golden_pre snapshot
# and the working tree (16 clips, 2 eval videos) — config only; budget
# raised to 4,500 s/side. Full chain (klae + moments + stage2 + eval),
# unlike the cater_kl variant, so run_klae_stage1 gets golden coverage.
# Waits for golden_cater_kl.sh (nproc==1).
set -u
cd /root/repo
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
export PYTHONPATH=/root/repo:/root/.axon_site
exec > /tmp/golden_runs/mnist_kl_golden.log 2>&1

while pgrep -f 'golden_cater_kl.sh' >/dev/null 2>&1; do sleep 60; done

d=train_mnist_kl_e2e
for side in pre post; do
  out=/tmp/golden_runs/${d}_${side}
  rm -rf "$out"
  if [ "$side" = pre ]; then script=/tmp/golden_pre/$d.py; else script=$d.py; fi
  echo "=== $d $side"
  timeout 4500 python "$script" --tiny --out "$out" \
    > /tmp/golden_runs/${d}_${side}.log 2>&1 || {
      echo "FAIL rc=$? ($d $side)"; tail -5 /tmp/golden_runs/${d}_${side}.log; exit 1; }
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
