"""Sweep-result aggregation (reference: scripts/eval_hyperparam_sweep.py).

Scores each sweep run (eval_report.json metrics when present, else the
reference's human-curation proxy: number of surviving validation jpgs),
identifies which hyperparameters varied, and writes per-parameter score
tables (+ scatter plots when matplotlib is available).
"""

from __future__ import annotations

import argparse
import json
import os
from collections import defaultdict


def score_run(run_dir: str) -> float:
    report = os.path.join(run_dir, "eval_report.json")
    if os.path.exists(report):
        data = json.load(open(report))
        if "clip_diversity" in data:
            return float(data.get("image_text_alignment", 0.0)) + float(data["clip_diversity"])
    # fallback proxy: surviving validation image count (reference :10-11)
    return float(len([f for f in os.listdir(run_dir) if f.endswith(".jpg")]))


def find_runs(root: str):
    runs = []
    for entry in sorted(os.listdir(root)):
        full = os.path.join(root, entry)
        args_file = os.path.join(full, "training_args.json")
        if os.path.isdir(full) and os.path.exists(args_file):
            runs.append((full, json.load(open(args_file))))
    return runs


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("sweep_output_root")
    parser.add_argument("--plot", action="store_true")
    args = parser.parse_args()

    runs = find_runs(args.sweep_output_root)
    assert runs, f"no completed runs under {args.sweep_output_root}"

    # which hyperparams varied?
    all_keys = set(runs[0][1].keys())
    varying = [
        k
        for k in sorted(all_keys)
        if k not in ("name", "output_dir", "seed", "start_time", "job_time", "training_attributes")
        and len({json.dumps(cfg.get(k), default=str) for _, cfg in runs}) > 1
    ]

    scores = [(run_dir, cfg, score_run(run_dir)) for run_dir, cfg in runs]
    scores.sort(key=lambda t: -t[2])
    print("== runs by score ==")
    for run_dir, _, s in scores:
        print(f"{s:8.3f}  {run_dir}")

    print("\n== per-hyperparameter mean scores ==")
    table = {}
    for key in varying:
        by_value = defaultdict(list)
        for _, cfg, s in scores:
            by_value[json.dumps(cfg.get(key), default=str)].append(s)
        table[key] = {v: sum(xs) / len(xs) for v, xs in by_value.items()}
        print(f"{key}:")
        for v, mean in sorted(table[key].items()):
            print(f"    {v}: {mean:.3f}")

    out = os.path.join(args.sweep_output_root, "sweep_summary.json")
    json.dump(
        {"runs": [(d, s) for d, _, s in scores], "per_param": table},
        open(out, "w"),
        indent=2,
    )
    print(f"\nwrote {out}")

    if args.plot:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            for key in varying:
                xs, ys = [], []
                for _, cfg, s in scores:
                    try:
                        xs.append(float(cfg.get(key)))
                        ys.append(s)
                    except (TypeError, ValueError):
                        break
                if len(xs) == len(scores):
                    plt.figure()
                    plt.scatter(xs, ys)
                    plt.xlabel(key)
                    plt.ylabel("score")
                    plt.savefig(os.path.join(args.sweep_output_root, f"sweep_{key}.png"))
                    plt.close()
        except ImportError:
            print("matplotlib unavailable; skipping plots")


if __name__ == "__main__":
    main()
