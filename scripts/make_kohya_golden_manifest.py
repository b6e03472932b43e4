"""Generate the golden kohya-export manifest from REAL peft targeting.

The kohya contract (reference: trainer/checkpoint.py:84-102) is produced
upstream by peft (module targeting, adapter shapes) piped through diffusers'
kohya converter (mechanical rename + alpha=rank). The hard-to-get-right part
is peft's behavior: WHICH modules match ["to_k","to_q","to_v","to_out.0",
"conv2"] / ["k_proj","q_proj","v_proj","out_proj"] and WHAT shapes the
lora_A/lora_B tensors take (esp. Conv2d adapters). This script builds a
meta-device torch skeleton with the exact diffusers module paths + shapes of
the full-size SDXL UNet and CLIP text encoders, wraps it with the reference's
LoraConfig, and records the resulting key inventory + shapes + alpha as
tests/golden/kohya_sdxl_rank16.json.

Run: python scripts/make_kohya_golden_manifest.py
(requires peft — present in this image; the manifest is committed so tests
don't need peft at runtime)
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import torch
import torch.nn as nn

RANK = 16


def build_skeleton(flat_shapes):
    """(dotted_path -> (kernel_shape, has_bias)) -> meta-device module tree."""
    root = nn.Module()

    def ensure(parent, name):
        child = getattr(parent, name, None)
        if child is None or not isinstance(child, nn.Module):
            child = nn.Module()
            parent.add_module(name, child)
        return child

    with torch.device("meta"):
        for path, (shape, has_bias) in flat_shapes.items():
            parts = path.split(".")
            parent = root
            for p in parts[:-1]:
                parent = ensure(parent, p)
            if len(shape) == 2:  # our kernels are (in, out)
                mod = nn.Linear(shape[0], shape[1], bias=has_bias)
            else:  # HWIO
                kh, kw, cin, cout = shape
                mod = nn.Conv2d(cin, cout, (kh, kw), bias=has_bias)
            parent.add_module(parts[-1], mod)
    return root


def flat_kernel_shapes(tree, path=()):
    out = {}
    if isinstance(tree, dict):
        if "kernel" in tree:
            out[".".join(map(str, path))] = (tuple(tree["kernel"].shape), "bias" in tree)
            return out
        for k, v in tree.items():
            out.update(flat_kernel_shapes(v, path + (k,)))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flat_kernel_shapes(v, path + (str(i),)))
    return out


def peft_to_kohya(peft_sd, prefix, alpha):
    """The reference's rename chain: peft keys -> diffusers -> kohya ->
    strip 'base_model_model_' (trainer/checkpoint.py:93-101). Mechanical."""
    out = {}
    for k, v in peft_sd.items():
        assert k.endswith((".lora_A.weight", ".lora_B.weight")), k
        module, which, _ = k.rsplit(".", 2)
        module = module.removeprefix("base_model.model.")
        base = prefix + module.replace(".", "_")
        suffix = "lora_down.weight" if which == "lora_A" else "lora_up.weight"
        out[f"{base}.{suffix}"] = list(v.shape)
        # diffusers convert_state_dict_to_kohya: alpha := len(lora_down) == rank
        out[f"{base}.alpha"] = []
    return out


def generate(model: str):
    from peft import LoraConfig, get_peft_model
    from peft.utils import get_peft_model_state_dict

    from sd_lora_trainer_tpu.models.clip import CLIP_BIG_G_CONFIG, CLIP_L_CONFIG, init_clip_params
    from sd_lora_trainer_tpu.models.unet import (
        SD15_UNET_CONFIG,
        SDXL_UNET_CONFIG,
        init_unet_params,
    )

    unet_cfg = SDXL_UNET_CONFIG if model == "sdxl" else SD15_UNET_CONFIG
    # diffusers convert_state_dict_to_kohya maps text_encoder. -> lora_te1.
    # even for single-TE sd15 (NOT sd-scripts' unindexed lora_te_), so the
    # reference chain — and therefore our export — uses te1 for both models
    clip_cfgs = [CLIP_L_CONFIG, CLIP_BIG_G_CONFIG] if model == "sdxl" else [CLIP_L_CONFIG]

    manifest = {"rank": RANK, "alpha": float(RANK), "keys": {}}

    # UNet: reference target modules, trainer/optimizer.py:84
    shapes = jax.eval_shape(
        lambda: init_unet_params(jax.random.PRNGKey(0), unet_cfg, dtype=jnp.float32)
    )
    skeleton = build_skeleton(flat_kernel_shapes(shapes))
    cfg = LoraConfig(
        r=RANK, lora_alpha=RANK, init_lora_weights=False,
        target_modules=["to_k", "to_q", "to_v", "to_out.0", "conv2"],
    )
    peft_model = get_peft_model(skeleton, cfg)
    sd = get_peft_model_state_dict(peft_model)
    manifest["keys"].update(peft_to_kohya(sd, "lora_unet_", RANK))

    # text encoders: trainer/optimizer.py:162
    for i, clip_cfg in enumerate(clip_cfgs):
        shapes = jax.eval_shape(
            lambda c=clip_cfg: init_clip_params(jax.random.PRNGKey(0), c, dtype=jnp.float32)
        )
        skeleton = build_skeleton(flat_kernel_shapes(shapes))
        cfg = LoraConfig(
            r=RANK, lora_alpha=RANK, init_lora_weights=False,
            target_modules=["k_proj", "q_proj", "v_proj", "out_proj"],
        )
        sd = get_peft_model_state_dict(get_peft_model(skeleton, cfg))
        manifest["keys"].update(peft_to_kohya(sd, f"lora_te{i + 1}_", RANK))

    out_path = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                            f"kohya_{model}_rank16.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    n_adapters = sum(1 for k in manifest["keys"] if k.endswith(".alpha"))
    print(f"wrote {out_path}: {len(manifest['keys'])} keys, {n_adapters} adapted modules")


def main():
    for model in ("sdxl", "sd15"):
        generate(model)


if __name__ == "__main__":
    main()
