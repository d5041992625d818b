#!/bin/bash
# cater_kl golden diff, CPU-feasible variant. The full-chain tiny run blew
# the 2,400 s budget on the klae epoch alone (128^2 KL-AE on 1 vCPU), so:
#   - run_klae_stage1's golden coverage comes from the mnist_kl chain
#     (64^2, same shared loop, different callbacks);
#   - here the klae stage is trained ONCE with the pre-refactor driver and
#     shared by both sides via --skip-ae, so the diff covers the cater_kl
#     driver's moments + stage-2 + eval wiring (which is where its
#     refactor diff actually lives).
# The tiny constants were shrunk identically in BOTH the /tmp/golden_pre
# snapshot and the working tree (8 scenes, 1 klae epoch) — config only.
# Waits for any still-running golden_e2e_diff.sh (nproc==1).
set -u
cd /root/repo
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
export PYTHONPATH=/root/repo:/root/.axon_site
exec > /tmp/golden_runs/cater_kl_golden.log 2>&1

while pgrep -f 'golden_e2e_diff.sh' >/dev/null 2>&1; do sleep 60; done

d=train_cater_kl_e2e
shared=/tmp/golden_runs/${d}_shared
if [ ! -e "$shared/klae/best" ] && [ ! -d "$shared/klae" ]; then
  echo "=== shared klae train (pre driver)"
  rm -rf "$shared"
  timeout 3600 python /tmp/golden_pre/$d.py --tiny --skip-stage2 \
    --out "$shared" || { echo "FAIL shared klae rc=$?"; exit 1; }
fi

for side in pre post; do
  out=/tmp/golden_runs/${d}_${side}
  rm -rf "$out"; mkdir -p "$out"
  cp -r "$shared/klae" "$out/klae"
  if [ "$side" = pre ]; then script=/tmp/golden_pre/$d.py; else script=$d.py; fi
  echo "=== $d $side (skip-ae)"
  timeout 3600 python "$script" --tiny --skip-ae --out "$out" \
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
