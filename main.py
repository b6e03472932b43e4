"""CLI entry point: `python main.py <config.json>` — same surface as the
reference (main.py:554-568): iterate the train() generator, print progress."""

import argparse
import os

import jax

# Some environments force a platform via sitecustomize AFTER reading
# JAX_PLATFORMS; re-apply the env var so it stays authoritative for the CLI.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# Multi-process clusters must form BEFORE any backend-initializing import
# (orbax, imported by the training stack, touches jax.devices at import).
from sd_lora_trainer_tpu.parallel.distributed import maybe_initialize_distributed

maybe_initialize_distributed()

from sd_lora_trainer_tpu.config import TrainingConfig
from sd_lora_trainer_tpu.main import train

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Train a concept")
    parser.add_argument("config_filename", type=str, help="Input JSON configuration file")
    args = parser.parse_args()

    config = TrainingConfig.from_json(file_path=args.config_filename)
    print("Starting new LoRA training run with config:")
    print(config)
    print("------------------------------------------")

    for progress in train(config=config):
        print(f"Progress: {(100 * progress):.2f}%", end="\r")

    print("Training done :)")
