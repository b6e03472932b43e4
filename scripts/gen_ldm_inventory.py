"""Generate the single-file checkpoint key inventories (name -> shape/dtype).

The reference loads real single-file SD checkpoints every run
(/root/reference/trainer/models.py:7-54 via StableDiffusion(XL)Pipeline.
from_single_file on the URLs at trainer/config.py:29-36). The exact key
inventory of those files — every tensor name, its torch-layout shape, and its
dtype — is the conversion contract our loader (models/weights.py) must
consume. This script *records* that contract as JSON so tests can pin the
converters against it offline (tests/test_checkpoint_inventory.py), without
ever downloading multi-GB weights.

The enumerator below is written from the Stable Diffusion architecture spec
(CompVis UNetModel / AutoencoderKL / HF CLIPTextModel / OpenCLIP text tower
naming + channel arithmetic) — deliberately NOT by calling the converters in
models/weights.py, whose inverse it checks. Shapes are derived from the
config arithmetic (skip-connection concat widths, GEGLU doubling, fused
in_proj stacking), which is exactly where conversion bugs hide.

Inventory layout of a real SD single-file checkpoint:
    model.diffusion_model.*                    UNet  (CompVis naming, OIHW convs)
    first_stage_model.*                        VAE   (CompVis naming)
    cond_stage_model.transformer.*             CLIP-L (SD1.5, HF naming)
    conditioner.embedders.0.transformer.*      CLIP-L (SDXL, HF naming)
    conditioner.embedders.1.model.*            CLIP-G (SDXL, OpenCLIP naming,
                                               fused attn.in_proj_{weight,bias})
plus optional junk families real files carry:
    *.position_ids                 persisted HF buffer (int64 [1,77])
    model_ema.decay / .num_updates EMA bookkeeping (pruned SD15 exports)
    betas, alphas_cumprod, ...     LDM scheduler buffers ([1000] f32/f64)

Usage: python scripts/gen_ldm_inventory.py  (writes tests/golden/ldm_*_inventory.json)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sd_lora_trainer_tpu.models.clip import CLIP_BIG_G_CONFIG, CLIP_L_CONFIG
from sd_lora_trainer_tpu.models.unet import SD15_UNET_CONFIG, SDXL_UNET_CONFIG
from sd_lora_trainer_tpu.models.vae import SD15_VAE_CONFIG, SDXL_VAE_CONFIG


def unet_inventory(cfg) -> dict:
    """model.diffusion_model.* keys (no prefix) -> shape, torch layout."""
    inv = {}
    ch = list(cfg.block_out_channels)
    nl = len(ch)
    lpb = cfg.layers_per_block
    ted = cfg.time_embed_dim
    ctx = cfg.cross_attention_dim

    def norm(base, c):
        inv[f"{base}.weight"] = [c]
        inv[f"{base}.bias"] = [c]

    def linear(base, cout, cin, bias=True):
        inv[f"{base}.weight"] = [cout, cin]
        if bias:
            inv[f"{base}.bias"] = [cout]

    def conv(base, cout, cin, k=3):
        inv[f"{base}.weight"] = [cout, cin, k, k]
        inv[f"{base}.bias"] = [cout]

    def resblock(base, cin, cout):
        norm(f"{base}.in_layers.0", cin)
        conv(f"{base}.in_layers.2", cout, cin)
        linear(f"{base}.emb_layers.1", cout, ted)
        norm(f"{base}.out_layers.0", cout)
        conv(f"{base}.out_layers.3", cout, cout)
        if cin != cout:
            conv(f"{base}.skip_connection", cout, cin, k=1)

    def transformer(base, c, depth):
        norm(f"{base}.norm", c)  # GroupNorm
        if cfg.use_linear_projection:
            linear(f"{base}.proj_in", c, c)
            linear(f"{base}.proj_out", c, c)
        else:
            conv(f"{base}.proj_in", c, c, k=1)
            conv(f"{base}.proj_out", c, c, k=1)
        for k in range(depth):
            tb = f"{base}.transformer_blocks.{k}"
            for n in ("norm1", "norm2", "norm3"):
                norm(f"{tb}.{n}", c)
            # self-attention: q/k/v from the stream, no bias
            for qkv in ("to_q", "to_k", "to_v"):
                linear(f"{tb}.attn1.{qkv}", c, c, bias=False)
            linear(f"{tb}.attn1.to_out.0", c, c)
            # cross-attention: k/v from the text context
            linear(f"{tb}.attn2.to_q", c, c, bias=False)
            linear(f"{tb}.attn2.to_k", c, ctx, bias=False)
            linear(f"{tb}.attn2.to_v", c, ctx, bias=False)
            linear(f"{tb}.attn2.to_out.0", c, c)
            # GEGLU: single proj producing value+gate halves (2 * 4c)
            linear(f"{tb}.ff.net.0.proj", 8 * c, c)
            linear(f"{tb}.ff.net.2", c, 4 * c)

    linear("time_embed.0", ted, ch[0])
    linear("time_embed.2", ted, ted)
    if cfg.addition_embed_dim is not None:
        # SDXL text_time embedding: pooled (1280) + 6 fourier-embedded (256)
        # micro-conditioning scalars -> 2816-wide input
        linear("label_emb.0.0", ted, cfg.addition_input_dim)
        linear("label_emb.0.2", ted, ted)
    conv("input_blocks.0.0", ch[0], cfg.in_channels)

    # down path; track per-block output channels for the up-path skip concat
    skips = [ch[0]]
    idx = 1
    cur = ch[0]
    for i in range(nl):
        for _ in range(lpb):
            resblock(f"input_blocks.{idx}.0", cur, ch[i])
            cur = ch[i]
            if cfg.cross_attention[i]:
                transformer(f"input_blocks.{idx}.1", cur, cfg.transformer_layers[i])
            skips.append(cur)
            idx += 1
        if i < nl - 1:
            conv(f"input_blocks.{idx}.0.op", cur, cur)  # stride-2 downsample
            skips.append(cur)
            idx += 1

    resblock("middle_block.0", cur, cur)
    transformer("middle_block.1", cur, cfg.mid_transformer_layers)
    resblock("middle_block.2", cur, cur)

    idx = 0
    for i in range(nl):
        level = nl - 1 - i
        for j in range(lpb + 1):
            cin = cur + skips.pop()
            resblock(f"output_blocks.{idx}.0", cin, ch[level])
            cur = ch[level]
            module = 1
            if cfg.cross_attention[level]:
                transformer(f"output_blocks.{idx}.{module}", cur, cfg.transformer_layers[level])
                module += 1
            if j == lpb and level > 0:
                conv(f"output_blocks.{idx}.{module}.conv", cur, cur)  # upsample
            idx += 1
    assert not skips, skips

    norm("out.0", ch[0])
    conv("out.2", cfg.out_channels, ch[0])
    return inv


def vae_inventory(cfg) -> dict:
    """first_stage_model.* keys -> shape."""
    inv = {}
    ch = list(cfg.block_out_channels)
    nl = len(ch)
    zc = cfg.latent_channels

    def norm(base, c):
        inv[f"{base}.weight"] = [c]
        inv[f"{base}.bias"] = [c]

    def conv(base, cout, cin, k=3):
        inv[f"{base}.weight"] = [cout, cin, k, k]
        inv[f"{base}.bias"] = [cout]

    def resblock(base, cin, cout):
        norm(f"{base}.norm1", cin)
        conv(f"{base}.conv1", cout, cin)
        norm(f"{base}.norm2", cout)
        conv(f"{base}.conv2", cout, cout)
        if cin != cout:
            conv(f"{base}.nin_shortcut", cout, cin, k=1)

    def attn(base, c):
        norm(f"{base}.norm", c)
        for name in ("q", "k", "v", "proj_out"):
            conv(f"{base}.{name}", c, c, k=1)

    # encoder
    conv("encoder.conv_in", ch[0], cfg.sample_channels)
    cur = ch[0]
    for i in range(nl):
        for j in range(cfg.layers_per_block):
            resblock(f"encoder.down.{i}.block.{j}", cur, ch[i])
            cur = ch[i]
        if i < nl - 1:
            conv(f"encoder.down.{i}.downsample.conv", cur, cur)
    resblock("encoder.mid.block_1", cur, cur)
    attn("encoder.mid.attn_1", cur)
    resblock("encoder.mid.block_2", cur, cur)
    norm("encoder.norm_out", cur)
    conv("encoder.conv_out", 2 * zc, cur)
    inv["quant_conv.weight"] = [2 * zc, 2 * zc, 1, 1]
    inv["quant_conv.bias"] = [2 * zc]

    # decoder (up.{i} indexed by resolution level; up.{nl-1} runs first)
    inv["post_quant_conv.weight"] = [zc, zc, 1, 1]
    inv["post_quant_conv.bias"] = [zc]
    conv("decoder.conv_in", ch[-1], zc)
    cur = ch[-1]
    resblock("decoder.mid.block_1", cur, cur)
    attn("decoder.mid.attn_1", cur)
    resblock("decoder.mid.block_2", cur, cur)
    for ldm_i in reversed(range(nl)):
        out = ch[ldm_i]
        for j in range(cfg.layers_per_block + 1):
            resblock(f"decoder.up.{ldm_i}.block.{j}", cur if j == 0 else out, out)
        cur = out
        if ldm_i > 0:
            conv(f"decoder.up.{ldm_i}.upsample.conv", cur, cur)
    norm("decoder.norm_out", cur)
    conv("decoder.conv_out", cfg.sample_channels, cur)
    return inv


def hf_clip_inventory(cfg, include_position_ids=True) -> dict:
    """text_model.* keys (HF CLIPTextModel layout) -> shape."""
    inv = {}
    d, mlp = cfg.hidden_size, cfg.intermediate_size

    def norm(base):
        inv[f"{base}.weight"] = [d]
        inv[f"{base}.bias"] = [d]

    inv["text_model.embeddings.token_embedding.weight"] = [cfg.vocab_size, d]
    inv["text_model.embeddings.position_embedding.weight"] = [cfg.max_position_embeddings, d]
    if include_position_ids:
        # persisted int64 buffer transformers used to register; present in
        # real single-file exports, must be skipped by the converter
        inv["text_model.embeddings.position_ids"] = [1, cfg.max_position_embeddings]
    for i in range(cfg.num_layers):
        b = f"text_model.encoder.layers.{i}"
        norm(f"{b}.layer_norm1")
        norm(f"{b}.layer_norm2")
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            inv[f"{b}.self_attn.{proj}.weight"] = [d, d]
            inv[f"{b}.self_attn.{proj}.bias"] = [d]
        inv[f"{b}.mlp.fc1.weight"] = [mlp, d]
        inv[f"{b}.mlp.fc1.bias"] = [mlp]
        inv[f"{b}.mlp.fc2.weight"] = [d, mlp]
        inv[f"{b}.mlp.fc2.bias"] = [d]
    norm("text_model.final_layer_norm")
    return inv


def openclip_inventory(cfg) -> dict:
    """OpenCLIP text tower keys (conditioner.embedders.1.model.*) -> shape."""
    inv = {}
    d, mlp = cfg.hidden_size, cfg.intermediate_size
    inv["logit_scale"] = []  # scalar; junk for text conditioning
    inv["positional_embedding"] = [cfg.max_position_embeddings, d]
    inv["text_projection"] = [d, cfg.projection_dim]
    inv["token_embedding.weight"] = [cfg.vocab_size, d]
    inv["ln_final.weight"] = [d]
    inv["ln_final.bias"] = [d]
    for i in range(cfg.num_layers):
        b = f"transformer.resblocks.{i}"
        # fused q/k/v projection (torch nn.MultiheadAttention layout)
        inv[f"{b}.attn.in_proj_weight"] = [3 * d, d]
        inv[f"{b}.attn.in_proj_bias"] = [3 * d]
        inv[f"{b}.attn.out_proj.weight"] = [d, d]
        inv[f"{b}.attn.out_proj.bias"] = [d]
        for n in ("ln_1", "ln_2"):
            inv[f"{b}.{n}.weight"] = [d]
            inv[f"{b}.{n}.bias"] = [d]
        inv[f"{b}.mlp.c_fc.weight"] = [mlp, d]
        inv[f"{b}.mlp.c_fc.bias"] = [mlp]
        inv[f"{b}.mlp.c_proj.weight"] = [d, mlp]
        inv[f"{b}.mlp.c_proj.bias"] = [d]
    return inv


# LDM DDPM scheduler buffers many SD15 community exports retain ([1000] each);
# the loader must ignore them (they are derivable from the beta schedule).
SD15_SCHEDULER_BUFFERS = [
    "betas", "alphas_cumprod", "alphas_cumprod_prev", "sqrt_alphas_cumprod",
    "sqrt_one_minus_alphas_cumprod", "log_one_minus_alphas_cumprod",
    "sqrt_recip_alphas_cumprod", "sqrt_recipm1_alphas_cumprod",
    "posterior_variance", "posterior_log_variance_clipped",
    "posterior_mean_coef1", "posterior_mean_coef2",
]


def checkpoint_inventory(version: str) -> dict:
    """Full prefixed inventory {key: {shape, dtype, family, optional}}."""
    inv = {}

    def add(prefix, family_inv, family, optional_suffixes=()):
        for k, shape in family_inv.items():
            optional = any(k.endswith(s) for s in optional_suffixes)
            dtype = "int64" if k.endswith("position_ids") else "float16"
            inv[prefix + k] = {
                "shape": shape, "dtype": dtype, "family": family,
                "optional": optional,
            }

    if version == "sdxl":
        add("model.diffusion_model.", unet_inventory(SDXL_UNET_CONFIG), "unet")
        add("first_stage_model.", vae_inventory(SDXL_VAE_CONFIG), "vae")
        add(
            "conditioner.embedders.0.transformer.",
            hf_clip_inventory(CLIP_L_CONFIG), "clip_l",
            optional_suffixes=("position_ids",),
        )
        add("conditioner.embedders.1.model.", openclip_inventory(CLIP_BIG_G_CONFIG), "clip_g")
    else:
        add("model.diffusion_model.", unet_inventory(SD15_UNET_CONFIG), "unet")
        add("first_stage_model.", vae_inventory(SD15_VAE_CONFIG), "vae")
        add(
            "cond_stage_model.transformer.",
            hf_clip_inventory(CLIP_L_CONFIG), "clip_l",
            optional_suffixes=("position_ids",),
        )
        for k in SD15_SCHEDULER_BUFFERS:
            inv[k] = {"shape": [1000], "dtype": "float32", "family": "junk", "optional": True}
        inv["model_ema.decay"] = {"shape": [], "dtype": "float32", "family": "junk", "optional": True}
        inv["model_ema.num_updates"] = {"shape": [], "dtype": "int64", "family": "junk", "optional": True}
    return inv


def main():
    golden = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden")
    os.makedirs(golden, exist_ok=True)
    for version in ("sd15", "sdxl"):
        inv = checkpoint_inventory(version)
        n_params = sum(
            int(__import__("numpy").prod(v["shape"])) if v["shape"] else 1
            for v in inv.values()
            if v["family"] != "junk" and not v["shape"] == [1, 77]
        )
        path = os.path.join(golden, f"ldm_{version}_inventory.json")
        with open(path, "w") as f:
            json.dump(inv, f, indent=0, sort_keys=True)
        print(f"{path}: {len(inv)} keys, {n_params:,} weight params")


if __name__ == "__main__":
    main()
