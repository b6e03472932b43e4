"""Checkpoint-render smoke script (reference: scripts/test_inference.py,
which is bit-rotted upstream — wrong kwarg at :41-47, missing import at :78;
this one works): load a trained checkpoint from disk, sweep lora scales,
render a grid per scale.
"""

from __future__ import annotations

import argparse
import json
import os

import jax.numpy as jnp

from sd_lora_trainer_tpu.checkpoint import load_checkpoint
from sd_lora_trainer_tpu.diffusion.schedulers import DDPMSchedule
from sd_lora_trainer_tpu.inference import InferencePipeline, render_images
from sd_lora_trainer_tpu.main import build_tokenizers
from sd_lora_trainer_tpu.models.weights import load_models_from_checkpoint


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint_dir", help="trained checkpoint folder")
    parser.add_argument("--base_checkpoint", required=True, help="single-file SD checkpoint")
    parser.add_argument("--lora_scales", default="0.6,0.75,0.9")
    parser.add_argument("--n_imgs", type=int, default=4)
    parser.add_argument("--render_size", type=int, default=768)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    loaded = load_models_from_checkpoint(args.base_checkpoint, dtype=jnp.bfloat16)
    tok1, tok2 = build_tokenizers(loaded)
    ckpt = load_checkpoint(
        args.checkpoint_dir, loaded.unet, [loaded.text_encoder, loaded.text_encoder_2]
    )
    # register TI tokens so prompts with <s0>.. tokenize
    n_tokens = ckpt["ti_rows"][0].shape[0] if ckpt["ti_rows"][0] is not None else 0
    toks = [f"<s{i}>" for i in range(n_tokens)]
    for tok in (tok1, tok2):
        if tok is not None and toks:
            tok.add_special_tokens(toks)

    pipe = InferencePipeline(
        version=loaded.version,
        unet_params=loaded.unet,
        unet_config=loaded.unet_config,
        te1_params=loaded.text_encoder,
        te1_config=loaded.text_encoder_config,
        te2_params=loaded.text_encoder_2,
        te2_config=loaded.text_encoder_2_config,
        vae_params=loaded.vae,
        vae_config=loaded.vae_config,
        tokenizer_1=tok1,
        tokenizer_2=tok2,
        schedule=DDPMSchedule.create(),
        ti_rows=ckpt["ti_rows"],
    )

    for scale in [float(s) for s in args.lora_scales.split(",")]:
        print(f"--- rendering at lora_scale={scale}")
        out_dir = os.path.join(args.checkpoint_dir, f"scale_{scale:.2f}")
        os.makedirs(out_dir, exist_ok=True)
        # render_images reads training_args.json from lora_path
        for f in ("training_args.json", "special_params.json"):
            src = os.path.join(args.checkpoint_dir, f)
            dst = os.path.join(out_dir, f)
            if not os.path.exists(dst):
                import shutil

                shutil.copy(src, dst)
        render_images(
            pipe,
            render_size=(args.render_size, args.render_size),
            lora_path=out_dir,
            train_step=0,
            seed=args.seed,
            lora_scale=scale,
            n_imgs=args.n_imgs,
            unet_lora=ckpt["unet_lora"],
            te_loras=ckpt["te_loras"],
        )
        print(f"saved renders to {out_dir}")


if __name__ == "__main__":
    main()
