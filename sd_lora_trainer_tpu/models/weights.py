"""Single-file SD checkpoint -> param pytrees.

Replaces the reference's `StableDiffusion(XL)Pipeline.from_single_file`
(trainer/models.py:15-28). A single-file checkpoint is an "LDM-layout"
safetensors with four weight families:

    model.diffusion_model.*                     UNet   (CompVis naming)
    first_stage_model.*                         VAE    (CompVis naming)
    cond_stage_model.transformer.text_model.*   CLIP-L (SD1.5, HF naming)
    conditioner.embedders.0.transformer.*       CLIP-L (SDXL, HF naming)
    conditioner.embedders.1.model.*             CLIP-G (SDXL, OpenCLIP naming)

We convert each family into this package's pytrees (diffusers-style module
paths, (in,out) linear kernels, HWIO convs). Version detection inspects keys
instead of the reference's try/except pipeline-load fallback
(trainer/models.py:15-28) — `conditioner.embedders.1.*` present <=> SDXL.

Every checkpoint tensor must be consumed exactly once; leftovers raise. That
structural invariant is the main guard against silent mis-mapping (SURVEY.md
ranks UNet weight conversion the #1 risk).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from sd_lora_trainer_tpu.models.clip import CLIP_BIG_G_CONFIG, CLIP_L_CONFIG, CLIPTextConfig
from sd_lora_trainer_tpu.models.unet import SD15_UNET_CONFIG, SDXL_UNET_CONFIG, UNetConfig
from sd_lora_trainer_tpu.models.vae import SD15_VAE_CONFIG, SDXL_VAE_CONFIG, VAEConfig

UNET_PREFIX = "model.diffusion_model."
VAE_PREFIX = "first_stage_model."
CLIP_SD15_PREFIX = "cond_stage_model.transformer."
CLIP_SDXL_L_PREFIX = "conditioner.embedders.0.transformer."
CLIP_SDXL_G_PREFIX = "conditioner.embedders.1.model."


def detect_version(keys) -> str:
    """'sdxl' | 'sd15' from checkpoint key inspection."""
    for k in keys:
        if k.startswith("conditioner.embedders.1."):
            return "sdxl"
    return "sd15"


@dataclasses.dataclass
class LoadedModels:
    version: str
    unet: dict
    unet_config: UNetConfig
    vae: dict
    vae_config: VAEConfig
    text_encoder: dict
    text_encoder_config: CLIPTextConfig
    text_encoder_2: Optional[dict]
    text_encoder_2_config: Optional[CLIPTextConfig]


def load_checkpoint_file(path: str) -> Dict[str, jnp.ndarray]:
    """Load a .safetensors state dict as jnp arrays (bf16-safe)."""
    from safetensors import safe_open

    tensors = {}
    with safe_open(path, framework="flax") as f:
        for k in f.keys():
            tensors[k] = f.get_tensor(k)
    return tensors


def read_embedded_configs(path: str):
    """Read model configs embedded in safetensors metadata (synthetic / tiny
    checkpoints written by models/synthesize.py). Returns None for standard
    SD checkpoints."""
    import json

    from safetensors import safe_open

    with safe_open(path, framework="flax") as f:
        metadata = f.metadata() or {}
    raw = metadata.get("sd_lora_trainer_tpu")
    if not raw:
        return None
    data = json.loads(raw)
    for key in ("unet", "vae", "clip_l", "clip_g"):
        if data.get(key):
            for k, v in list(data[key].items()):
                if isinstance(v, list):
                    data[key][k] = tuple(v)
    return {
        "version": data["version"],
        "unet": UNetConfig(**data["unet"]),
        "vae": VAEConfig(**data["vae"]),
        "clip_l": CLIPTextConfig(**data["clip_l"]),
        "clip_g": CLIPTextConfig(**data["clip_g"]) if data.get("clip_g") else None,
    }


def load_models_from_checkpoint(
    path: str,
    dtype=jnp.bfloat16,
    unet_config: Optional[UNetConfig] = None,
    vae_config: Optional[VAEConfig] = None,
    clip_l_config: Optional[CLIPTextConfig] = None,
    clip_g_config: Optional[CLIPTextConfig] = None,
) -> LoadedModels:
    """The TPU equivalent of reference load_models() (trainer/models.py:7-54).

    Config overrides exist for tiny synthetic checkpoints (tests / offline
    development); default None means the standard SD15/SDXL topologies, or
    the configs embedded in the checkpoint's metadata if present.
    """
    embedded = read_embedded_configs(path)
    if embedded is not None:
        unet_config = unet_config or embedded["unet"]
        vae_config = vae_config or embedded["vae"]
        clip_l_config = clip_l_config or embedded["clip_l"]
        clip_g_config = clip_g_config or embedded["clip_g"]
    sd = load_checkpoint_file(path)
    version = detect_version(sd.keys())
    if version == "sdxl":
        unet_cfg = unet_config or SDXL_UNET_CONFIG
        vae_cfg = vae_config or SDXL_VAE_CONFIG
        clip_l_cfg = clip_l_config or CLIP_L_CONFIG
        clip_g_cfg = clip_g_config or CLIP_BIG_G_CONFIG
        unet = convert_ldm_unet(_take_prefix(sd, UNET_PREFIX), unet_cfg, dtype)
        vae = convert_ldm_vae(_take_prefix(sd, VAE_PREFIX), vae_cfg, dtype)
        te1 = convert_hf_clip(_take_prefix(sd, CLIP_SDXL_L_PREFIX), clip_l_cfg, dtype)
        te2 = convert_openclip(_take_prefix(sd, CLIP_SDXL_G_PREFIX), clip_g_cfg, dtype)
        return LoadedModels(
            version, unet, unet_cfg, vae, vae_cfg, te1, clip_l_cfg, te2, clip_g_cfg
        )
    unet_cfg = unet_config or SD15_UNET_CONFIG
    vae_cfg = vae_config or SD15_VAE_CONFIG
    clip_l_cfg = clip_l_config or CLIP_L_CONFIG
    unet = convert_ldm_unet(_take_prefix(sd, UNET_PREFIX), unet_cfg, dtype)
    vae = convert_ldm_vae(_take_prefix(sd, VAE_PREFIX), vae_cfg, dtype)
    te1 = convert_hf_clip(_take_prefix(sd, CLIP_SD15_PREFIX), clip_l_cfg, dtype)
    return LoadedModels(version, unet, unet_cfg, vae, vae_cfg, te1, clip_l_cfg, None, None)


def _take_prefix(sd: dict, prefix: str) -> dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


class _KeyConsumer:
    """Wraps a flat state dict; every get pops. Leftovers raise at close."""

    def __init__(self, sd: dict, family: str, dtype):
        self.sd = dict(sd)
        self.family = family
        self.dtype = dtype

    def _get(self, key: str) -> jnp.ndarray:
        if key not in self.sd:
            raise KeyError(f"[{self.family}] missing checkpoint key: {key}")
        return self.sd.pop(key)

    def linear(self, key: str, bias: bool = True) -> dict:
        """torch Linear [out,in] -> kernel (in,out)."""
        p = {"kernel": jnp.transpose(self._get(f"{key}.weight")).astype(self.dtype)}
        if bias:
            p["bias"] = self._get(f"{key}.bias").astype(self.dtype)
        return p

    def conv(self, key: str) -> dict:
        """torch Conv2d [O,I,kh,kw] -> HWIO."""
        w = self._get(f"{key}.weight")
        return {
            "kernel": jnp.transpose(w, (2, 3, 1, 0)).astype(self.dtype),
            "bias": self._get(f"{key}.bias").astype(self.dtype),
        }

    def conv_as_linear(self, key: str) -> dict:
        """1x1 conv [O,I,1,1] -> linear kernel (I,O) (VAE attention q/k/v)."""
        w = self._get(f"{key}.weight")
        if w.ndim == 4:
            w = w[:, :, 0, 0]
        return {
            "kernel": jnp.transpose(w).astype(self.dtype),
            "bias": self._get(f"{key}.bias").astype(self.dtype),
        }

    def norm(self, key: str) -> dict:
        return {
            "scale": self._get(f"{key}.weight").astype(self.dtype),
            "bias": self._get(f"{key}.bias").astype(self.dtype),
        }

    def raw(self, key: str) -> jnp.ndarray:
        return self._get(key).astype(self.dtype)

    def has(self, key: str) -> bool:
        return key in self.sd

    def finish(self):
        if self.sd:
            leftover = sorted(self.sd.keys())[:10]
            raise ValueError(
                f"[{self.family}] {len(self.sd)} unconsumed checkpoint keys, "
                f"e.g. {leftover}"
            )


# ---------------------------------------------------------------------------
# UNet: LDM (CompVis) layout -> diffusers-style pytree
# ---------------------------------------------------------------------------


def _ldm_resnet(c: _KeyConsumer, base: str) -> dict:
    p = {
        "norm1": c.norm(f"{base}.in_layers.0"),
        "conv1": c.conv(f"{base}.in_layers.2"),
        "time_emb_proj": c.linear(f"{base}.emb_layers.1"),
        "norm2": c.norm(f"{base}.out_layers.0"),
        "conv2": c.conv(f"{base}.out_layers.3"),
    }
    if c.has(f"{base}.skip_connection.weight"):
        p["conv_shortcut"] = c.conv(f"{base}.skip_connection")
    return p


def _ldm_transformer(c: _KeyConsumer, base: str, cfg: UNetConfig, depth: int) -> dict:
    def attn(b):
        return {
            "to_q": c.linear(f"{b}.to_q", bias=False),
            "to_k": c.linear(f"{b}.to_k", bias=False),
            "to_v": c.linear(f"{b}.to_v", bias=False),
            "to_out.0": c.linear(f"{b}.to_out.0"),
        }

    blocks = []
    for k in range(depth):
        tb = f"{base}.transformer_blocks.{k}"
        blocks.append(
            {
                "norm1": c.norm(f"{tb}.norm1"),
                "attn1": attn(f"{tb}.attn1"),
                "norm2": c.norm(f"{tb}.norm2"),
                "attn2": attn(f"{tb}.attn2"),
                "norm3": c.norm(f"{tb}.norm3"),
                "ff.net.0.proj": c.linear(f"{tb}.ff.net.0.proj"),
                "ff.net.2": c.linear(f"{tb}.ff.net.2"),
            }
        )
    p = {"norm": c.norm(f"{base}.norm"), "transformer_blocks": blocks}
    if cfg.use_linear_projection:
        p["proj_in"] = c.linear(f"{base}.proj_in")
        p["proj_out"] = c.linear(f"{base}.proj_out")
    else:
        p["proj_in"] = c.conv(f"{base}.proj_in")
        p["proj_out"] = c.conv(f"{base}.proj_out")
    return p


def convert_ldm_unet(sd: dict, cfg: UNetConfig, dtype=jnp.bfloat16) -> dict:
    c = _KeyConsumer(sd, "unet", dtype)
    n_levels = len(cfg.block_out_channels)

    params = {
        "conv_in": c.conv("input_blocks.0.0"),
        "time_embedding": {
            "linear_1": c.linear("time_embed.0"),
            "linear_2": c.linear("time_embed.2"),
        },
        "conv_norm_out": c.norm("out.0"),
        "conv_out": c.conv("out.2"),
    }
    if cfg.addition_embed_dim is not None:
        params["add_embedding"] = {
            "linear_1": c.linear("label_emb.0.0"),
            "linear_2": c.linear("label_emb.0.2"),
        }

    # down path: input_blocks numbering walks resnet(/attn) layers then the
    # per-level downsampler
    down_blocks = []
    idx = 1
    for i in range(n_levels):
        block = {"resnets": []}
        if cfg.cross_attention[i]:
            block["attentions"] = []
        for _ in range(cfg.layers_per_block):
            block["resnets"].append(_ldm_resnet(c, f"input_blocks.{idx}.0"))
            if cfg.cross_attention[i]:
                block["attentions"].append(
                    _ldm_transformer(c, f"input_blocks.{idx}.1", cfg, cfg.transformer_layers[i])
                )
            idx += 1
        if i < n_levels - 1:
            block["downsamplers"] = [{"conv": c.conv(f"input_blocks.{idx}.0.op")}]
            idx += 1
        down_blocks.append(block)
    params["down_blocks"] = down_blocks

    params["mid_block"] = {
        "resnets": [_ldm_resnet(c, "middle_block.0"), _ldm_resnet(c, "middle_block.2")],
        "attentions": [
            _ldm_transformer(c, "middle_block.1", cfg, cfg.mid_transformer_layers)
        ],
    }

    up_blocks = []
    idx = 0
    for i in range(n_levels):
        level = n_levels - 1 - i
        block = {"resnets": []}
        if cfg.cross_attention[level]:
            block["attentions"] = []
        for j in range(cfg.layers_per_block + 1):
            block["resnets"].append(_ldm_resnet(c, f"output_blocks.{idx}.0"))
            module = 1
            if cfg.cross_attention[level]:
                block["attentions"].append(
                    _ldm_transformer(
                        c, f"output_blocks.{idx}.{module}", cfg, cfg.transformer_layers[level]
                    )
                )
                module += 1
            is_last_layer = j == cfg.layers_per_block
            if is_last_layer and i < n_levels - 1:
                block["upsamplers"] = [{"conv": c.conv(f"output_blocks.{idx}.{module}.conv")}]
            idx += 1
        up_blocks.append(block)
    params["up_blocks"] = up_blocks

    c.finish()
    return params


def export_ldm_unet(params: dict, cfg: UNetConfig) -> Dict[str, np.ndarray]:
    """Inverse of convert_ldm_unet (full-finetune export + tests).

    Returns an LDM-layout state dict of numpy arrays (torch OIHW / [out,in]).
    """
    out: Dict[str, np.ndarray] = {}

    def put_linear(key, p):
        out[f"{key}.weight"] = np.transpose(np.asarray(p["kernel"].astype(jnp.float32)))
        if "bias" in p:
            out[f"{key}.bias"] = np.asarray(p["bias"].astype(jnp.float32))

    def put_conv(key, p):
        out[f"{key}.weight"] = np.transpose(
            np.asarray(p["kernel"].astype(jnp.float32)), (3, 2, 0, 1)
        )
        out[f"{key}.bias"] = np.asarray(p["bias"].astype(jnp.float32))

    def put_norm(key, p):
        out[f"{key}.weight"] = np.asarray(p["scale"].astype(jnp.float32))
        out[f"{key}.bias"] = np.asarray(p["bias"].astype(jnp.float32))

    def put_resnet(base, p):
        put_norm(f"{base}.in_layers.0", p["norm1"])
        put_conv(f"{base}.in_layers.2", p["conv1"])
        put_linear(f"{base}.emb_layers.1", p["time_emb_proj"])
        put_norm(f"{base}.out_layers.0", p["norm2"])
        put_conv(f"{base}.out_layers.3", p["conv2"])
        if "conv_shortcut" in p:
            put_conv(f"{base}.skip_connection", p["conv_shortcut"])

    def put_transformer(base, p):
        put_norm(f"{base}.norm", p["norm"])
        if cfg.use_linear_projection:
            put_linear(f"{base}.proj_in", p["proj_in"])
            put_linear(f"{base}.proj_out", p["proj_out"])
        else:
            put_conv(f"{base}.proj_in", p["proj_in"])
            put_conv(f"{base}.proj_out", p["proj_out"])
        for k, tb in enumerate(p["transformer_blocks"]):
            b = f"{base}.transformer_blocks.{k}"
            for norm in ("norm1", "norm2", "norm3"):
                put_norm(f"{b}.{norm}", tb[norm])
            for attn in ("attn1", "attn2"):
                put_linear(f"{b}.{attn}.to_q", tb[attn]["to_q"])
                put_linear(f"{b}.{attn}.to_k", tb[attn]["to_k"])
                put_linear(f"{b}.{attn}.to_v", tb[attn]["to_v"])
                put_linear(f"{b}.{attn}.to_out.0", tb[attn]["to_out.0"])
            put_linear(f"{b}.ff.net.0.proj", tb["ff.net.0.proj"])
            put_linear(f"{b}.ff.net.2", tb["ff.net.2"])

    put_conv("input_blocks.0.0", params["conv_in"])
    put_linear("time_embed.0", params["time_embedding"]["linear_1"])
    put_linear("time_embed.2", params["time_embedding"]["linear_2"])
    if "add_embedding" in params:
        put_linear("label_emb.0.0", params["add_embedding"]["linear_1"])
        put_linear("label_emb.0.2", params["add_embedding"]["linear_2"])
    put_norm("out.0", params["conv_norm_out"])
    put_conv("out.2", params["conv_out"])

    n_levels = len(cfg.block_out_channels)
    idx = 1
    for i in range(n_levels):
        block = params["down_blocks"][i]
        for j in range(cfg.layers_per_block):
            put_resnet(f"input_blocks.{idx}.0", block["resnets"][j])
            if cfg.cross_attention[i]:
                put_transformer(f"input_blocks.{idx}.1", block["attentions"][j])
            idx += 1
        if i < n_levels - 1:
            put_conv(f"input_blocks.{idx}.0.op", block["downsamplers"][0]["conv"])
            idx += 1

    put_resnet("middle_block.0", params["mid_block"]["resnets"][0])
    put_transformer("middle_block.1", params["mid_block"]["attentions"][0])
    put_resnet("middle_block.2", params["mid_block"]["resnets"][1])

    idx = 0
    for i in range(n_levels):
        level = n_levels - 1 - i
        block = params["up_blocks"][i]
        for j in range(cfg.layers_per_block + 1):
            put_resnet(f"output_blocks.{idx}.0", block["resnets"][j])
            module = 1
            if cfg.cross_attention[level]:
                put_transformer(f"output_blocks.{idx}.{module}", block["attentions"][j])
                module += 1
            if j == cfg.layers_per_block and i < n_levels - 1:
                put_conv(f"output_blocks.{idx}.{module}.conv", block["upsamplers"][0]["conv"])
            idx += 1
    return out


# ---------------------------------------------------------------------------
# VAE: CompVis layout -> pytree
# ---------------------------------------------------------------------------


def _vae_resnet(c: _KeyConsumer, base: str) -> dict:
    p = {
        "norm1": c.norm(f"{base}.norm1"),
        "conv1": c.conv(f"{base}.conv1"),
        "norm2": c.norm(f"{base}.norm2"),
        "conv2": c.conv(f"{base}.conv2"),
    }
    if c.has(f"{base}.nin_shortcut.weight"):
        p["conv_shortcut"] = c.conv(f"{base}.nin_shortcut")
    return p


def _vae_attn(c: _KeyConsumer, base: str) -> dict:
    return {
        "group_norm": c.norm(f"{base}.norm"),
        "to_q": c.conv_as_linear(f"{base}.q"),
        "to_k": c.conv_as_linear(f"{base}.k"),
        "to_v": c.conv_as_linear(f"{base}.v"),
        "to_out": c.conv_as_linear(f"{base}.proj_out"),
    }


def convert_ldm_vae(sd: dict, cfg: VAEConfig, dtype=jnp.bfloat16) -> dict:
    c = _KeyConsumer(sd, "vae", dtype)
    n = len(cfg.block_out_channels)

    down_blocks = []
    for i in range(n):
        block = {
            "resnets": [
                _vae_resnet(c, f"encoder.down.{i}.block.{j}") for j in range(cfg.layers_per_block)
            ]
        }
        if i < n - 1:
            block["downsamplers"] = [{"conv": c.conv(f"encoder.down.{i}.downsample.conv")}]
        down_blocks.append(block)
    encoder = {
        "conv_in": c.conv("encoder.conv_in"),
        "down_blocks": down_blocks,
        "mid_block": {
            "resnets": [_vae_resnet(c, "encoder.mid.block_1"), _vae_resnet(c, "encoder.mid.block_2")],
            "attentions": [_vae_attn(c, "encoder.mid.attn_1")],
        },
        "conv_norm_out": c.norm("encoder.norm_out"),
        "conv_out": c.conv("encoder.conv_out"),
    }

    # decoder.up is indexed by *resolution level*: up.{n-1} runs first.
    up_blocks = []
    for i in range(n):
        ldm_i = n - 1 - i
        block = {
            "resnets": [
                _vae_resnet(c, f"decoder.up.{ldm_i}.block.{j}")
                for j in range(cfg.layers_per_block + 1)
            ]
        }
        if ldm_i > 0:
            block["upsamplers"] = [{"conv": c.conv(f"decoder.up.{ldm_i}.upsample.conv")}]
        up_blocks.append(block)
    decoder = {
        "conv_in": c.conv("decoder.conv_in"),
        "mid_block": {
            "resnets": [_vae_resnet(c, "decoder.mid.block_1"), _vae_resnet(c, "decoder.mid.block_2")],
            "attentions": [_vae_attn(c, "decoder.mid.attn_1")],
        },
        "up_blocks": up_blocks,
        "conv_norm_out": c.norm("decoder.norm_out"),
        "conv_out": c.conv("decoder.conv_out"),
    }

    params = {
        "encoder": encoder,
        "decoder": decoder,
        "quant_conv": c.conv("quant_conv"),
        "post_quant_conv": c.conv("post_quant_conv"),
    }
    c.finish()
    return params


# ---------------------------------------------------------------------------
# CLIP-L (HF layout) and CLIP-G (OpenCLIP layout)
# ---------------------------------------------------------------------------


def convert_hf_clip(sd: dict, cfg: CLIPTextConfig, dtype=jnp.bfloat16) -> dict:
    c = _KeyConsumer(sd, "clip_l", dtype)
    # SD1.5 checkpoints ship two junk keys transformers adds
    for junk in ("text_model.embeddings.position_ids",):
        if c.has(junk):
            c.sd.pop(junk)

    layers = []
    for i in range(cfg.num_layers):
        b = f"text_model.encoder.layers.{i}"
        layers.append(
            {
                "layer_norm1": c.norm(f"{b}.layer_norm1"),
                "self_attn": {
                    "q_proj": c.linear(f"{b}.self_attn.q_proj"),
                    "k_proj": c.linear(f"{b}.self_attn.k_proj"),
                    "v_proj": c.linear(f"{b}.self_attn.v_proj"),
                    "out_proj": c.linear(f"{b}.self_attn.out_proj"),
                },
                "layer_norm2": c.norm(f"{b}.layer_norm2"),
                "mlp": {"fc1": c.linear(f"{b}.mlp.fc1"), "fc2": c.linear(f"{b}.mlp.fc2")},
            }
        )
    params = {
        "text_model": {
            "embeddings": {
                "token_embedding": {"weight": c.raw("text_model.embeddings.token_embedding.weight")},
                "position_embedding": {
                    "weight": c.raw("text_model.embeddings.position_embedding.weight")
                },
            },
            "encoder": {"layers": layers},
            "final_layer_norm": c.norm("text_model.final_layer_norm"),
        }
    }
    if c.has("text_projection.weight"):
        params["text_projection"] = c.linear("text_projection", bias=False)
    c.finish()
    return params


def convert_openclip(sd: dict, cfg: CLIPTextConfig, dtype=jnp.bfloat16) -> dict:
    """OpenCLIP text tower (conditioner.embedders.1.model.*) -> same pytree as
    convert_hf_clip. The fused attn.in_proj is split into q/k/v."""
    c = _KeyConsumer(sd, "clip_g", dtype)
    for junk in ("logit_scale", "transformer.text_model.embeddings.position_ids"):
        if c.has(junk):
            c.sd.pop(junk)

    d = cfg.hidden_size
    layers = []
    for i in range(cfg.num_layers):
        b = f"transformer.resblocks.{i}"
        in_w = c.raw(f"{b}.attn.in_proj_weight")  # [3D, D] torch layout
        in_b = c.raw(f"{b}.attn.in_proj_bias")  # [3D]
        qw, kw, vw = in_w[:d], in_w[d : 2 * d], in_w[2 * d :]
        qb, kb, vb = in_b[:d], in_b[d : 2 * d], in_b[2 * d :]
        layers.append(
            {
                "layer_norm1": c.norm(f"{b}.ln_1"),
                "self_attn": {
                    "q_proj": {"kernel": jnp.transpose(qw), "bias": qb},
                    "k_proj": {"kernel": jnp.transpose(kw), "bias": kb},
                    "v_proj": {"kernel": jnp.transpose(vw), "bias": vb},
                    "out_proj": c.linear(f"{b}.attn.out_proj"),
                },
                "layer_norm2": c.norm(f"{b}.ln_2"),
                "mlp": {
                    "fc1": c.linear(f"{b}.mlp.c_fc"),
                    "fc2": c.linear(f"{b}.mlp.c_proj"),
                },
            }
        )
    params = {
        "text_model": {
            "embeddings": {
                "token_embedding": {"weight": c.raw("token_embedding.weight")},
                "position_embedding": {"weight": c.raw("positional_embedding")},
            },
            "encoder": {"layers": layers},
            "final_layer_norm": c.norm("ln_final"),
        },
        # OpenCLIP text_projection is a raw [D, P] parameter applied x @ P —
        # already (in, out), no transpose.
        "text_projection": {"kernel": c.raw("text_projection")},
    }
    c.finish()
    return params
