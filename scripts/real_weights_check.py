"""One-command real-weights rehearsal: convert -> train -> render -> score.

The single push-button check for whoever stages real SD checkpoints
(STAGING.md): verifies the full production path — single-file checkpoint
conversion (models/weights.py, the strict every-key-consumed converter),
20 LoRA+TI train steps on a small synthetic concept, a validation render,
and a CLIP train-similarity assert (when the CLIP scorer weights are staged;
otherwise image-statistics sanity checks with a loud degradation note).

Reference behavior being rehearsed: trainer/models.py:7-54 (checkpoint
download/load) + the cog_test_train.sh end-to-end smoke.

Usage:
  # real weights (after STAGING.md):
  python scripts/real_weights_check.py --ckpt /path/sd_xl_base_1.0.safetensors \
      --model sdxl --res 512

  # in-env dry-run on a synthesized checkpoint (no staging needed):
  python scripts/real_weights_check.py --synthesize tiny   # CI-sized, ~3 min
  python scripts/real_weights_check.py --synthesize full   # full-width SDXL

Exit code 0 + final "REAL-WEIGHTS CHECK PASSED" line = everything held.
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor the caller's JAX_PLATFORMS choice: the session sitecustomize's
# axon register() overrides the platform AFTER jax reads the env, so
# `JAX_PLATFORMS=cpu python scripts/real_weights_check.py` would silently
# target the TPU tunnel (and hang forever when the tunnel is down) without
# this re-apply — the same trap tests/conftest.py guards against.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np


def make_dataset(root: str, n: int = 4, size: int = 96):
    from PIL import Image

    data_dir = os.path.join(root, "dataset")
    os.makedirs(data_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    # structured patterns (not pure noise) so CLIP train-sim is meaningful
    for i in range(n):
        img = np.zeros((size, size, 3), np.uint8)
        img[:, :, i % 3] = 200
        img[:: (i + 2), :, :] = 30
        img += rng.randint(0, 40, img.shape).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(data_dir, f"img_{i}.jpg"))
        with open(os.path.join(data_dir, f"img_{i}.txt"), "w") as f:
            f.write(f"a striped test pattern number {i}")
    return data_dir


def synthesize(root: str, model: str, full: bool) -> str:
    """Write a synthesized single-file checkpoint (tiny or full-width)."""
    from sd_lora_trainer_tpu.models.synthesize import (
        TINY_CLIP_G_CONFIG,
        TINY_CLIP_L_CONFIG,
        TINY_VAE_CONFIG,
        synthesize_checkpoint,
    )
    from sd_lora_trainer_tpu.models.unet import (
        SD15_UNET_CONFIG,
        SDXL_UNET_CONFIG,
        TINY_SD15_UNET_CONFIG,
        TINY_SDXL_UNET_CONFIG,
    )

    ckpt = os.path.join(root, f"synth_{model}_{'full' if full else 'tiny'}.safetensors")
    if full:
        from sd_lora_trainer_tpu.models.clip import CLIP_BIG_G_CONFIG, CLIP_L_CONFIG
        from sd_lora_trainer_tpu.models.vae import SD15_VAE_CONFIG, SDXL_VAE_CONFIG

        unet_cfg = SDXL_UNET_CONFIG if model == "sdxl" else SD15_UNET_CONFIG
        vae_cfg = SDXL_VAE_CONFIG if model == "sdxl" else SD15_VAE_CONFIG
        te1_cfg, te2_cfg = CLIP_L_CONFIG, CLIP_BIG_G_CONFIG if model == "sdxl" else None
    else:
        unet_cfg = TINY_SDXL_UNET_CONFIG if model == "sdxl" else TINY_SD15_UNET_CONFIG
        vae_cfg = TINY_VAE_CONFIG
        te1_cfg = TINY_CLIP_L_CONFIG
        te2_cfg = TINY_CLIP_G_CONFIG if model == "sdxl" else None
    print(f"[real-weights-check] synthesizing {'full-width' if full else 'tiny'} "
          f"{model} checkpoint -> {ckpt}", flush=True)
    synthesize_checkpoint(ckpt, model, unet_cfg, vae_cfg, te1_cfg, te2_cfg, seed=0)
    return ckpt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None, help="staged real checkpoint (single-file LDM)")
    ap.add_argument("--model", default="sdxl", choices=["sdxl", "sd15"])
    ap.add_argument("--res", type=int, default=None,
                    help="train/render resolution (default: 512 real, 64 synthesized)")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--synthesize", choices=["tiny", "full"], default=None,
                    help="dry-run on a synthesized checkpoint instead of --ckpt")
    ap.add_argument("--out", default=None, help="output root (default: temp dir)")
    ap.add_argument("--min-train-sim", type=float, default=0.35,
                    help="CLIP train-similarity floor (real weights only)")
    ap.add_argument("--quantize-base", default="auto",
                    choices=["auto", "none", "int8", "int8+te"],
                    help="frozen-base quantization (models/quant.py); 'auto' "
                         "follows the product default (int8 for SDXL LoRA)")
    args = ap.parse_args()

    if not args.ckpt and not args.synthesize:
        ap.error("need --ckpt (staged real weights) or --synthesize tiny|full")

    root = args.out or tempfile.mkdtemp(prefix="real_weights_check_")
    os.makedirs(root, exist_ok=True)
    ckpt = args.ckpt or synthesize(root, args.model, args.synthesize == "full")
    res = args.res or (512 if args.ckpt else 64)
    data_dir = make_dataset(root)

    from sd_lora_trainer_tpu.config import TrainingConfig
    from sd_lora_trainer_tpu.main import train

    config = TrainingConfig(
        name="rwcheck",
        lora_training_urls=data_dir,
        concept_mode="style",
        caption_model="no_caption",
        sd_model_version=args.model,
        ckpt_path=ckpt,
        seed=0,
        resolution=res,
        validation_img_size=res,
        train_batch_size=2,
        max_train_steps=args.steps,
        checkpointing_steps=10_000,
        n_sample_imgs=2,
        lora_rank=8,
        skip_gpt_cleanup=True,
        augment_imgs_up_to_n=0,
        quantize_base=args.quantize_base,
        output_dir=os.path.join(root, "runs"),
    )
    print(f"[real-weights-check] training {args.steps} steps @ {res}px on {ckpt}",
          flush=True)
    gen = train(config)
    while True:
        try:
            next(gen)
        except StopIteration as stop:
            config, save_dir = stop.value
            break

    # ---- artifact contract ----
    files = os.listdir(save_dir)
    for want in ("special_params.json", "training_args.json", "validation_grid.jpg"):
        assert want in files, (want, files)
    assert any(f.endswith("_lora.safetensors") for f in files), files
    assert any(f.endswith("_embeddings.safetensors") for f in files), files
    print(f"[real-weights-check] artifact set OK in {save_dir}", flush=True)

    # ---- training made progress (loss series decreasing-ish) ----
    t_args = json.load(open(os.path.join(save_dir, "training_args.json")))
    losses = t_args["training_attributes"]["final_losses"].get("img_loss", [])
    assert losses and all(np.isfinite(losses)), losses

    # ---- renders are real images ----
    from PIL import Image

    renders = sorted(f for f in files if f.startswith("img_") and f.endswith(".jpg"))
    assert renders, files
    arrs = [np.asarray(Image.open(os.path.join(save_dir, f))) for f in renders]
    for f, a in zip(renders, arrs):
        assert a.std() > 1.0, f"render {f} is near-constant (std={a.std():.3f})"

    # ---- CLIP train-similarity (needs staged scorer weights) ----
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from auto_eval_model import Evaluation, get_all_jpg_filenames

    ev = Evaluation([os.path.join(save_dir, f) for f in renders])
    if ev.available:
        train_imgs = get_all_jpg_filenames(data_dir)
        sim = ev.training_image_alignment(train_imgs)
        print(f"[real-weights-check] CLIP train-similarity: {sim:.4f}", flush=True)
        if args.ckpt:  # meaningful only with real weights
            assert sim >= args.min_train_sim, (
                f"train-similarity {sim:.3f} < floor {args.min_train_sim} — "
                "the adapters did not move renders toward the concept"
            )
    else:
        print(
            "[real-weights-check] DEGRADED: CLIP scorer not staged "
            "(model_paths['CLIP']/clip-vit-base-patch32) — skipped the "
            "train-similarity assert, ran image-statistics checks only",
            flush=True,
        )

    print("REAL-WEIGHTS CHECK PASSED", flush=True)


if __name__ == "__main__":
    main()
