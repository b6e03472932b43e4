"""Synthetic single-file checkpoints for tests and offline development.

The reference downloads multi-GB base checkpoints at train start
(trainer/models.py:56-75). In this zero-egress environment we synthesize
random checkpoints with the exact LDM key layout instead, at either full or
tiny widths, so the conversion and training paths are exercised end-to-end.

Round-trip guarantee: synthesize -> convert == the original init pytree, which
is also how the converters themselves are tested.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sd_lora_trainer_tpu.models.clip import CLIPTextConfig, init_clip_params
from sd_lora_trainer_tpu.models.unet import UNetConfig, init_unet_params
from sd_lora_trainer_tpu.models.vae import VAEConfig, init_vae_params
from sd_lora_trainer_tpu.models.weights import (
    CLIP_SD15_PREFIX,
    CLIP_SDXL_G_PREFIX,
    CLIP_SDXL_L_PREFIX,
    UNET_PREFIX,
    VAE_PREFIX,
    export_ldm_unet,
)

# Tiny model-family configs that mirror the real topologies. Shared by tests,
# the multichip dry-run, and synthetic end-to-end runs.
TINY_CLIP_L_CONFIG = CLIPTextConfig(
    vocab_size=256, hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
    max_position_embeddings=77, eos_token_id=255,
)
TINY_CLIP_G_CONFIG = CLIPTextConfig(
    vocab_size=256, hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
    max_position_embeddings=77, eos_token_id=255, hidden_act="gelu", projection_dim=32,
)
TINY_VAE_CONFIG = VAEConfig(block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4)


def export_ldm_vae(params: dict, cfg: VAEConfig) -> Dict[str, np.ndarray]:
    """Pytree -> CompVis VAE state dict (inverse of convert_ldm_vae)."""
    out: Dict[str, np.ndarray] = {}

    def put_conv(key, p):
        out[f"{key}.weight"] = np.transpose(np.asarray(p["kernel"].astype(jnp.float32)), (3, 2, 0, 1))
        out[f"{key}.bias"] = np.asarray(p["bias"].astype(jnp.float32))

    def put_norm(key, p):
        out[f"{key}.weight"] = np.asarray(p["scale"].astype(jnp.float32))
        out[f"{key}.bias"] = np.asarray(p["bias"].astype(jnp.float32))

    def put_lin_as_conv(key, p):
        w = np.transpose(np.asarray(p["kernel"].astype(jnp.float32)))[:, :, None, None]
        out[f"{key}.weight"] = w
        out[f"{key}.bias"] = np.asarray(p["bias"].astype(jnp.float32))

    def put_resnet(base, p):
        put_norm(f"{base}.norm1", p["norm1"])
        put_conv(f"{base}.conv1", p["conv1"])
        put_norm(f"{base}.norm2", p["norm2"])
        put_conv(f"{base}.conv2", p["conv2"])
        if "conv_shortcut" in p:
            put_conv(f"{base}.nin_shortcut", p["conv_shortcut"])

    def put_attn(base, p):
        put_norm(f"{base}.norm", p["group_norm"])
        put_lin_as_conv(f"{base}.q", p["to_q"])
        put_lin_as_conv(f"{base}.k", p["to_k"])
        put_lin_as_conv(f"{base}.v", p["to_v"])
        put_lin_as_conv(f"{base}.proj_out", p["to_out"])

    n = len(cfg.block_out_channels)
    enc = params["encoder"]
    put_conv("encoder.conv_in", enc["conv_in"])
    for i, block in enumerate(enc["down_blocks"]):
        for j, rp in enumerate(block["resnets"]):
            put_resnet(f"encoder.down.{i}.block.{j}", rp)
        if "downsamplers" in block:
            put_conv(f"encoder.down.{i}.downsample.conv", block["downsamplers"][0]["conv"])
    put_resnet("encoder.mid.block_1", enc["mid_block"]["resnets"][0])
    put_attn("encoder.mid.attn_1", enc["mid_block"]["attentions"][0])
    put_resnet("encoder.mid.block_2", enc["mid_block"]["resnets"][1])
    put_norm("encoder.norm_out", enc["conv_norm_out"])
    put_conv("encoder.conv_out", enc["conv_out"])

    dec = params["decoder"]
    put_conv("decoder.conv_in", dec["conv_in"])
    put_resnet("decoder.mid.block_1", dec["mid_block"]["resnets"][0])
    put_attn("decoder.mid.attn_1", dec["mid_block"]["attentions"][0])
    put_resnet("decoder.mid.block_2", dec["mid_block"]["resnets"][1])
    for i, block in enumerate(dec["up_blocks"]):
        ldm_i = n - 1 - i
        for j, rp in enumerate(block["resnets"]):
            put_resnet(f"decoder.up.{ldm_i}.block.{j}", rp)
        if "upsamplers" in block:
            put_conv(f"decoder.up.{ldm_i}.upsample.conv", block["upsamplers"][0]["conv"])
    put_norm("decoder.norm_out", dec["conv_norm_out"])
    put_conv("decoder.conv_out", dec["conv_out"])
    put_conv("quant_conv", params["quant_conv"])
    put_conv("post_quant_conv", params["post_quant_conv"])
    return out


def export_hf_clip(params: dict, cfg: CLIPTextConfig) -> Dict[str, np.ndarray]:
    """Pytree -> transformers CLIPTextModel state dict (HF naming)."""
    out: Dict[str, np.ndarray] = {}

    def put_linear(key, p):
        out[f"{key}.weight"] = np.transpose(np.asarray(p["kernel"].astype(jnp.float32)))
        if "bias" in p:
            out[f"{key}.bias"] = np.asarray(p["bias"].astype(jnp.float32))

    def put_norm(key, p):
        out[f"{key}.weight"] = np.asarray(p["scale"].astype(jnp.float32))
        out[f"{key}.bias"] = np.asarray(p["bias"].astype(jnp.float32))

    tm = params["text_model"]
    out["text_model.embeddings.token_embedding.weight"] = np.asarray(
        tm["embeddings"]["token_embedding"]["weight"].astype(jnp.float32)
    )
    out["text_model.embeddings.position_embedding.weight"] = np.asarray(
        tm["embeddings"]["position_embedding"]["weight"].astype(jnp.float32)
    )
    for i, layer in enumerate(tm["encoder"]["layers"]):
        b = f"text_model.encoder.layers.{i}"
        put_norm(f"{b}.layer_norm1", layer["layer_norm1"])
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            put_linear(f"{b}.self_attn.{proj}", layer["self_attn"][proj])
        put_norm(f"{b}.layer_norm2", layer["layer_norm2"])
        put_linear(f"{b}.mlp.fc1", layer["mlp"]["fc1"])
        put_linear(f"{b}.mlp.fc2", layer["mlp"]["fc2"])
    put_norm("text_model.final_layer_norm", tm["final_layer_norm"])
    if "text_projection" in params:
        put_linear("text_projection", params["text_projection"])
    return out


def export_openclip(params: dict, cfg: CLIPTextConfig) -> Dict[str, np.ndarray]:
    """Pytree -> OpenCLIP text-tower state dict (fused in_proj)."""
    out: Dict[str, np.ndarray] = {}

    def t(p):
        return np.transpose(np.asarray(p.astype(jnp.float32)))

    tm = params["text_model"]
    out["token_embedding.weight"] = np.asarray(
        tm["embeddings"]["token_embedding"]["weight"].astype(jnp.float32)
    )
    out["positional_embedding"] = np.asarray(
        tm["embeddings"]["position_embedding"]["weight"].astype(jnp.float32)
    )
    for i, layer in enumerate(tm["encoder"]["layers"]):
        b = f"transformer.resblocks.{i}"
        sa = layer["self_attn"]
        out[f"{b}.attn.in_proj_weight"] = np.concatenate(
            [t(sa["q_proj"]["kernel"]), t(sa["k_proj"]["kernel"]), t(sa["v_proj"]["kernel"])], axis=0
        )
        out[f"{b}.attn.in_proj_bias"] = np.concatenate(
            [
                np.asarray(sa[p]["bias"].astype(jnp.float32))
                for p in ("q_proj", "k_proj", "v_proj")
            ]
        )
        out[f"{b}.attn.out_proj.weight"] = t(sa["out_proj"]["kernel"])
        out[f"{b}.attn.out_proj.bias"] = np.asarray(sa["out_proj"]["bias"].astype(jnp.float32))
        out[f"{b}.ln_1.weight"] = np.asarray(layer["layer_norm1"]["scale"].astype(jnp.float32))
        out[f"{b}.ln_1.bias"] = np.asarray(layer["layer_norm1"]["bias"].astype(jnp.float32))
        out[f"{b}.ln_2.weight"] = np.asarray(layer["layer_norm2"]["scale"].astype(jnp.float32))
        out[f"{b}.ln_2.bias"] = np.asarray(layer["layer_norm2"]["bias"].astype(jnp.float32))
        out[f"{b}.mlp.c_fc.weight"] = t(layer["mlp"]["fc1"]["kernel"])
        out[f"{b}.mlp.c_fc.bias"] = np.asarray(layer["mlp"]["fc1"]["bias"].astype(jnp.float32))
        out[f"{b}.mlp.c_proj.weight"] = t(layer["mlp"]["fc2"]["kernel"])
        out[f"{b}.mlp.c_proj.bias"] = np.asarray(layer["mlp"]["fc2"]["bias"].astype(jnp.float32))
    out["ln_final.weight"] = np.asarray(tm["final_layer_norm"]["scale"].astype(jnp.float32))
    out["ln_final.bias"] = np.asarray(tm["final_layer_norm"]["bias"].astype(jnp.float32))
    out["text_projection"] = np.asarray(params["text_projection"]["kernel"].astype(jnp.float32))
    return out


def synthesize_checkpoint(
    path: str,
    version: str,
    unet_cfg: UNetConfig,
    vae_cfg: VAEConfig,
    clip_l_cfg: CLIPTextConfig,
    clip_g_cfg: Optional[CLIPTextConfig] = None,
    seed: int = 0,
) -> None:
    """Write a random single-file checkpoint with the exact LDM key layout."""
    from sd_lora_trainer_tpu.utils.safetensors_io import save_safetensors

    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4)
    sd: Dict[str, np.ndarray] = {}

    unet = init_unet_params(ks[0], unet_cfg, dtype=jnp.float32)
    for k, v in export_ldm_unet(unet, unet_cfg).items():
        sd[UNET_PREFIX + k] = v
    vae = init_vae_params(ks[1], vae_cfg, dtype=jnp.float32)
    for k, v in export_ldm_vae(vae, vae_cfg).items():
        sd[VAE_PREFIX + k] = v
    clip_l = init_clip_params(ks[2], clip_l_cfg, dtype=jnp.float32)
    l_prefix = CLIP_SDXL_L_PREFIX if version == "sdxl" else CLIP_SD15_PREFIX
    for k, v in export_hf_clip(clip_l, clip_l_cfg).items():
        sd[l_prefix + k] = v
    if version == "sdxl":
        assert clip_g_cfg is not None
        clip_g = init_clip_params(ks[3], clip_g_cfg, dtype=jnp.float32)
        for k, v in export_openclip(clip_g, clip_g_cfg).items():
            sd[CLIP_SDXL_G_PREFIX + k] = v

    # Embed the (non-standard) model configs as safetensors metadata so the
    # loader can reconstruct tiny topologies without out-of-band info.
    import json

    metadata = {
        "sd_lora_trainer_tpu": json.dumps(
            {
                "version": version,
                "unet": dataclasses.asdict(unet_cfg),
                "vae": dataclasses.asdict(vae_cfg),
                "clip_l": dataclasses.asdict(clip_l_cfg),
                "clip_g": dataclasses.asdict(clip_g_cfg) if clip_g_cfg else None,
            }
        )
    }
    save_safetensors(sd, path, metadata=metadata)
