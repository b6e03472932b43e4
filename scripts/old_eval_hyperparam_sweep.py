"""Older sweep-eval variant: per-hyperparameter linear-regression trendlines.

Reference: scripts/old_eval_hyperparam_sweep.py — loops experiment dirs, scores
each by surviving-validation-jpg count, fits a linear model of score vs each
hyperparameter (label-encoding categoricals) and plots jittered scatter +
trendline with an R^2 readout. The newer aggregation lives in
eval_hyperparam_sweep.py; this keeps the regression/R^2 analysis available.

Differences from the reference (which had hardcoded /home/... paths and
sklearn/seaborn deps): paths are CLI args, the regression is a plain
numpy least-squares fit, and plotting degrades gracefully to a printed
table when matplotlib is unavailable.
"""

from __future__ import annotations

import argparse
import json
import os
from collections import defaultdict

import numpy as np

from eval_hyperparam_sweep import find_runs, score_run


def _encode(values):
    """Return (numeric array, labels|None): label-encode non-numeric params."""
    arr = np.asarray(values)
    if arr.dtype.kind in "bifc":
        return arr.astype(np.float64), None
    labels = sorted({str(v) for v in values})
    index = {v: i for i, v in enumerate(labels)}
    return np.asarray([index[str(v)] for v in values], np.float64), labels


def fit_trend(values, scores):
    """Least-squares linear fit; returns (slope, intercept, r_squared)."""
    x = np.asarray(values, np.float64)
    y = np.asarray(scores, np.float64)
    A = np.stack([x, np.ones_like(x)], axis=1)
    (slope, intercept), *_ = np.linalg.lstsq(A, y, rcond=None)
    pred = slope * x + intercept
    ss_res = float(np.sum((y - pred) ** 2))
    ss_tot = float(np.sum((y - np.mean(y)) ** 2))
    r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else 0.0
    return float(slope), float(intercept), r2


def analyze(runs, ignore_threshold_relative: float = 0.0):
    """Per-parameter regression analysis. Returns {param: result dict}."""
    parameters = defaultdict(lambda: {"values": [], "scores": []})
    for run_dir, config in runs:
        score = score_run(run_dir)
        for key, value in config.items():
            if isinstance(value, (dict, list)):
                continue
            parameters[key]["values"].append(value)
            parameters[key]["scores"].append(score)

    results = {}
    for param, data in parameters.items():
        scores = np.asarray(data["scores"], np.float64)
        if len(scores) and ignore_threshold_relative > 0:
            # only an explicit threshold filters; with the default 0.0 every
            # run is kept — zero-score runs (the worst configs) are exactly
            # the most informative datapoints for the regression
            keep = scores > ignore_threshold_relative * scores.max()
        else:
            keep = np.ones(len(scores), bool)
        values = [v for v, k in zip(data["values"], keep) if k]
        scores = scores[keep]
        if len(values) < 2:
            continue
        x, labels = _encode(values)
        if len(np.unique(x)) <= 1:
            continue
        slope, intercept, r2 = fit_trend(x, scores)
        results[param] = {
            "slope": slope,
            "intercept": intercept,
            "r_squared": r2,
            "labels": labels,
            "x": x,
            "scores": scores,
        }
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("sweep_output_root")
    parser.add_argument("--output-dir", default=None)
    parser.add_argument("--ignore-threshold-relative", type=float, default=0.0)
    parser.add_argument("--plot", action="store_true")
    args = parser.parse_args()

    runs = find_runs(args.sweep_output_root)
    assert runs, f"no completed runs under {args.sweep_output_root}"

    # best run(s) — ties are common with the jpg-count proxy
    scored = [(score_run(d), d) for d, _ in runs]
    best = max(s for s, _ in scored)
    for s, d in scored:
        if s == best:
            print(f"Best output_dir: {d} with score {best}")

    results = analyze(runs, args.ignore_threshold_relative)
    for param, res in sorted(results.items(), key=lambda kv: -abs(kv[1]["r_squared"])):
        print(f"{param:40s} slope={res['slope']:+.4g} R^2={res['r_squared']:.3f}")

    if args.plot:
        out_dir = args.output_dir or os.path.join(args.sweep_output_root, "sweep_analysis")
        os.makedirs(out_dir, exist_ok=True)
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            print("matplotlib unavailable; skipping plots")
            return
        rng = np.random.RandomState(0)
        for param, res in results.items():
            x, scores = res["x"], res["scores"]
            jx = x + rng.normal(0, 0.02 * (x.max() - x.min() or 1.0), x.shape)
            jy = scores + rng.normal(0, 0.02 * scores.max(), scores.shape)
            plt.figure(figsize=(6, 4))
            plt.scatter(jx, jy, alpha=0.6)
            order = np.argsort(x)
            plt.plot(
                x[order],
                res["slope"] * x[order] + res["intercept"],
                color="red",
                label=f"R²={res['r_squared']:.2f}",
            )
            if res["labels"] is not None:
                ticks = np.unique(x).astype(int)
                plt.xticks(ticks, [res["labels"][t] for t in ticks], rotation=45, ha="right")
            plt.title(f"Influence of {param} on the score")
            plt.ylabel("Score")
            plt.legend()
            plt.tight_layout()
            plt.savefig(os.path.join(out_dir, f"res_{param}.png"))
            plt.close()
        print(f"Saved plots to {out_dir}")


if __name__ == "__main__":
    main()
