"""Random hyperparameter sweep generator
(reference: scripts/create_hyperparam_sweep.py).

Samples configs from a search space, dedups by minimum Hamming distance over
the varying keys, writes JSON config files plus a shell runner of
`python main.py <config>` calls.
"""

from __future__ import annotations

import argparse
import json
import os
import random


SEARCH_SPACE = {
    "unet_lr": [1e-4, 3e-4, 1e-3],
    "ti_lr": [3e-4, 1e-3, 3e-3],
    "lora_rank": [8, 16, 32],
    "lora_weight_decay": [0.0, 0.004, 0.02],
    "l1_penalty": [0.0, 0.03, 0.1],
    "snr_gamma": [0.0, 5.0],
    "caption_dropout": [0.0, 0.1, 0.3],
    "token_attention_loss_w": [0.0, 3e-7, 1e-6],
}


def hamming(a: dict, b: dict, keys) -> int:
    return sum(a[k] != b[k] for k in keys)


def sample_configs(base: dict, n: int, min_distance: int = 2, seed: int = 0):
    rng = random.Random(seed)
    keys = list(SEARCH_SPACE.keys())
    configs = []
    attempts = 0
    while len(configs) < n and attempts < n * 200:
        attempts += 1
        candidate = dict(base)
        for k in keys:
            candidate[k] = rng.choice(SEARCH_SPACE[k])
        if all(hamming(candidate, c, keys) >= min_distance for c in configs):
            configs.append(candidate)
    return configs


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("base_config", help="base training config JSON")
    parser.add_argument("--n", type=int, default=16)
    parser.add_argument("--min_distance", type=int, default=2)
    parser.add_argument("--out_dir", default="sweep_configs")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    base = json.load(open(args.base_config))
    os.makedirs(args.out_dir, exist_ok=True)
    configs = sample_configs(base, args.n, args.min_distance, args.seed)

    runner_lines = ["#!/bin/bash", "set -e"]
    for i, cfg in enumerate(configs):
        cfg["name"] = f"{base.get('name', 'sweep')}_{i:03d}"
        path = os.path.join(args.out_dir, f"sweep_{i:03d}.json")
        with open(path, "w") as f:
            json.dump(cfg, f, indent=4)
        runner_lines.append(f"python main.py {path}")

    runner = os.path.join(args.out_dir, "run_sweep.sh")
    with open(runner, "w") as f:
        f.write("\n".join(runner_lines) + "\n")
    os.chmod(runner, 0o755)
    print(f"wrote {len(configs)} configs + {runner}")


if __name__ == "__main__":
    main()
