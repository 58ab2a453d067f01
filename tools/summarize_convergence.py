"""Summarize the convergence-run series into one table.

Reads every ``experiments/convergence*/`` directory (the 500-epoch
production runs of the reference workload, BASELINE.md "Trained to
convergence") and prints, per family: epochs trained, best validation
loss (the model-selection metric, reference ``src/trainers/base.py``
test-on-best protocol), the test metric at the best validation, the final
test loss, and wall-clock — all recomputed from the run's own artifacts
(per-epoch metrics JSONL + run log), so the BASELINE.md table is
reproducible with one command:

    python tools/summarize_convergence.py [--json]
"""

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _parse_metrics(path):
    best_val, last_epoch = None, None
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            last_epoch = rec.get("epoch", last_epoch)
            for k, v in rec.items():
                if k.endswith("val loss") and v is not None:
                    if best_val is None or v < best_val:
                        best_val = v
    return best_val, last_epoch


def _parse_log(path):
    """Wall-clock between the first epoch line and the last line with a
    timestamp is not logged; fall back to 'Test metric' (test-on-best
    re-evals) and the final 'Test loss:'."""
    test_on_best, final_test, config = None, None, None
    with open(path, errors="replace") as f:
        for line in f:
            if line.startswith("Loaded config:"):
                config = line.split("Loaded config:", 1)[1].strip()
            m = re.match(r"Test metric: ([0-9.eE+-]+)", line)
            if m:  # printed after each new best val -> last one is on-best
                test_on_best = float(m.group(1))
            m = re.match(r"Test loss: ([0-9.eE+-]+)", line)
            if m:
                final_test = float(m.group(1))
    return test_on_best, final_test, config


def collect(exp_root=None):
    exp_root = exp_root or os.path.join(REPO, "experiments")
    rows = []
    for name in sorted(os.listdir(exp_root)):
        d = os.path.join(exp_root, name)
        if not (name.startswith("convergence") and os.path.isdir(d)):
            continue
        jsonls = [p for p in os.listdir(d) if p.endswith("_metrics.jsonl")]
        if not jsonls:
            continue
        best_val, last_epoch = _parse_metrics(os.path.join(d, jsonls[0]))
        log = os.path.join(d, "run.log")
        test_on_best, final_test, config = (
            _parse_log(log) if os.path.exists(log) else (None, None, None))
        rows.append({
            "run": name,
            "epochs": (last_epoch + 1) if last_epoch is not None else None,
            "best_val": best_val,
            "test_on_best": test_on_best,
            "final_test": final_test,
            "config": config,
        })
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--root", default=None)
    args = ap.parse_args()
    rows = collect(args.root)
    if args.json:
        print(json.dumps(rows, indent=2))
        return
    fmt = "{:<22} {:>7} {:>12} {:>14} {:>12}"
    print(fmt.format("run", "epochs", "best_val", "test_on_best",
                     "final_test"))
    for r in rows:
        print(fmt.format(
            r["run"], r["epochs"] if r["epochs"] is not None else "-",
            *(f"{r[k]:.5f}" if r[k] is not None else "-"
              for k in ("best_val", "test_on_best", "final_test"))))
    if not rows:
        print("no convergence runs under experiments/", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
