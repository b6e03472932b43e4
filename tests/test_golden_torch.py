"""Golden numeric anchors: independent torch re-implementation vs our stack.

SURVEY.md ranks single-file weight conversion the #1 silent-divergence risk,
and round-1 only had self-roundtrip tests (our exporter inverting our
importer — blind to a systematically wrong mapping). These tests break that
circularity: a from-scratch torch implementation of the LDM UNet and VAE
reads tensors DIRECTLY from the checkpoint by their raw LDM key names
(model.diffusion_model.input_blocks.1.0.in_layers.2.weight, ...) and computes
the forward in NCHW/fp32. Our path (convert_ldm_unet/convert_ldm_vae ->
unet_forward/vae_encode/vae_decode) must agree elementwise. Any drift in key
mapping, transposition, block wiring, skip order, norm eps, GEGLU gating,
attention scaling, or timestep-embedding convention fails these tests.

The torch model here is written from the Stable Diffusion architecture spec
(CompVis UNetModel / AutoencoderKL semantics), not ported from any library.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from sd_lora_trainer_tpu.models.synthesize import (
    TINY_CLIP_G_CONFIG,
    TINY_CLIP_L_CONFIG,
    TINY_VAE_CONFIG,
    synthesize_checkpoint,
)
from sd_lora_trainer_tpu.models.unet import (
    TINY_SD15_UNET_CONFIG,
    TINY_SDXL_UNET_CONFIG,
    unet_forward,
)
from sd_lora_trainer_tpu.models.vae import vae_decode, vae_encode
from sd_lora_trainer_tpu.models.weights import (
    UNET_PREFIX,
    VAE_PREFIX,
    convert_ldm_unet,
    convert_ldm_vae,
    load_checkpoint_file,
)

torch.set_grad_enabled(False)


# ---------------------------------------------------------------------------
# Independent torch LDM ops
# ---------------------------------------------------------------------------


def _t(sd, key):
    t = sd[key]
    assert isinstance(t, torch.Tensor), key
    return t.float()


def timestep_embedding_torch(t: torch.Tensor, dim: int) -> torch.Tensor:
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def gn(sd, base, x, groups, eps=1e-5):
    return F.group_norm(x, groups, _t(sd, f"{base}.weight"), _t(sd, f"{base}.bias"), eps)


def ln(sd, base, x):
    return F.layer_norm(x, (x.shape[-1],), _t(sd, f"{base}.weight"), _t(sd, f"{base}.bias"))


def conv(sd, base, x, stride=1, padding=1):
    return F.conv2d(x, _t(sd, f"{base}.weight"), _t(sd, f"{base}.bias"), stride, padding)


def linear(sd, base, x, bias=True):
    return F.linear(x, _t(sd, f"{base}.weight"), _t(sd, f"{base}.bias") if bias else None)


def mha_torch(q, k, v, heads):
    b, lq, d = q.shape
    lk = k.shape[1]
    dh = d // heads
    q = q.view(b, lq, heads, dh).transpose(1, 2)
    k = k.view(b, lk, heads, dh).transpose(1, 2)
    v = v.view(b, lk, heads, dh).transpose(1, 2)
    logits = (q @ k.transpose(-1, -2)) / math.sqrt(dh)
    out = torch.softmax(logits, dim=-1) @ v
    return out.transpose(1, 2).reshape(b, lq, d)


def ldm_resblock(sd, base, x, temb, groups):
    h = conv(sd, f"{base}.in_layers.2", F.silu(gn(sd, f"{base}.in_layers.0", x, groups)))
    h = h + linear(sd, f"{base}.emb_layers.1", F.silu(temb))[:, :, None, None]
    h = conv(sd, f"{base}.out_layers.3", F.silu(gn(sd, f"{base}.out_layers.0", h, groups)))
    if f"{base}.skip_connection.weight" in sd:
        x = F.conv2d(x, _t(sd, f"{base}.skip_connection.weight"), _t(sd, f"{base}.skip_connection.bias"))
    return x + h


def ldm_basic_block(sd, base, x, ctx, heads):
    h = ln(sd, f"{base}.norm1", x)
    x = x + linear(
        sd, f"{base}.attn1.to_out.0",
        mha_torch(
            linear(sd, f"{base}.attn1.to_q", h, bias=False),
            linear(sd, f"{base}.attn1.to_k", h, bias=False),
            linear(sd, f"{base}.attn1.to_v", h, bias=False),
            heads,
        ),
    )
    h = ln(sd, f"{base}.norm2", x)
    x = x + linear(
        sd, f"{base}.attn2.to_out.0",
        mha_torch(
            linear(sd, f"{base}.attn2.to_q", h, bias=False),
            linear(sd, f"{base}.attn2.to_k", ctx, bias=False),
            linear(sd, f"{base}.attn2.to_v", ctx, bias=False),
            heads,
        ),
    )
    h = linear(sd, f"{base}.ff.net.0.proj", ln(sd, f"{base}.norm3", x))
    a, b = h.chunk(2, dim=-1)  # GEGLU: value * gelu(gate)
    return x + linear(sd, f"{base}.ff.net.2", a * F.gelu(b))


def ldm_spatial_transformer(sd, base, x, ctx, heads, depth, groups, linear_proj):
    b, c, hh, ww = x.shape
    residual = x
    h = gn(sd, f"{base}.norm", x, groups)
    if linear_proj:
        h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        h = linear(sd, f"{base}.proj_in", h)
    else:
        h = F.conv2d(h, _t(sd, f"{base}.proj_in.weight"), _t(sd, f"{base}.proj_in.bias"))
        h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
    for k in range(depth):
        h = ldm_basic_block(sd, f"{base}.transformer_blocks.{k}", h, ctx, heads)
    if linear_proj:
        h = linear(sd, f"{base}.proj_out", h)
        h = h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
    else:
        h = h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
        h = F.conv2d(h, _t(sd, f"{base}.proj_out.weight"), _t(sd, f"{base}.proj_out.bias"))
    return residual + h


def torch_ldm_unet(sd, cfg, x, t, ctx, text_embeds=None, time_ids=None):
    """Full CompVis-layout UNet forward in NCHW fp32."""
    groups = cfg.norm_num_groups
    temb = timestep_embedding_torch(t, cfg.block_out_channels[0])
    temb = linear(sd, "time_embed.2", F.silu(linear(sd, "time_embed.0", temb)))
    if cfg.addition_embed_dim is not None:
        add_t = timestep_embedding_torch(time_ids.reshape(-1), cfg.addition_embed_dim)
        add_t = add_t.reshape(temb.shape[0], -1)
        y = torch.cat([text_embeds, add_t], dim=-1)
        temb = temb + linear(sd, "label_emb.0.2", F.silu(linear(sd, "label_emb.0.0", y)))

    n = len(cfg.block_out_channels)
    h = conv(sd, "input_blocks.0.0", x)
    hs = [h]
    idx = 1
    for i in range(n):
        for _ in range(cfg.layers_per_block):
            h = ldm_resblock(sd, f"input_blocks.{idx}.0", h, temb, groups)
            if cfg.cross_attention[i]:
                h = ldm_spatial_transformer(
                    sd, f"input_blocks.{idx}.1", h, ctx, cfg.num_heads[i],
                    cfg.transformer_layers[i], groups, cfg.use_linear_projection,
                )
            hs.append(h)
            idx += 1
        if i < n - 1:
            h = conv(sd, f"input_blocks.{idx}.0.op", h, stride=2)
            hs.append(h)
            idx += 1

    h = ldm_resblock(sd, "middle_block.0", h, temb, groups)
    h = ldm_spatial_transformer(
        sd, "middle_block.1", h, ctx, cfg.mid_num_heads,
        cfg.mid_transformer_layers, groups, cfg.use_linear_projection,
    )
    h = ldm_resblock(sd, "middle_block.2", h, temb, groups)

    idx = 0
    for i in range(n):
        level = n - 1 - i
        for j in range(cfg.layers_per_block + 1):
            h = torch.cat([h, hs.pop()], dim=1)
            h = ldm_resblock(sd, f"output_blocks.{idx}.0", h, temb, groups)
            module = 1
            if cfg.cross_attention[level]:
                h = ldm_spatial_transformer(
                    sd, f"output_blocks.{idx}.{module}", h, ctx, cfg.num_heads[level],
                    cfg.transformer_layers[level], groups, cfg.use_linear_projection,
                )
                module += 1
            if j == cfg.layers_per_block and i < n - 1:
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = conv(sd, f"output_blocks.{idx}.{module}.conv", h)
            idx += 1

    return conv(sd, "out.2", F.silu(gn(sd, "out.0", h, groups)))


def vae_resblock_torch(sd, base, x, groups):
    h = conv(sd, f"{base}.conv1", F.silu(gn(sd, f"{base}.norm1", x, groups, eps=1e-6)))
    h = conv(sd, f"{base}.conv2", F.silu(gn(sd, f"{base}.norm2", h, groups, eps=1e-6)))
    if f"{base}.nin_shortcut.weight" in sd:
        x = F.conv2d(x, _t(sd, f"{base}.nin_shortcut.weight"), _t(sd, f"{base}.nin_shortcut.bias"))
    return x + h


def vae_attn_torch(sd, base, x, groups):
    b, c, hh, ww = x.shape
    h = gn(sd, f"{base}.norm", x, groups, eps=1e-6)

    def proj(name, y):
        w = _t(sd, f"{base}.{name}.weight")
        if w.ndim == 4:
            w = w[:, :, 0, 0]
        return F.linear(y, w, _t(sd, f"{base}.{name}.bias"))

    flat = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
    out = mha_torch(proj("q", flat), proj("k", flat), proj("v", flat), heads=1)
    out = proj("proj_out", out)
    return x + out.reshape(b, hh, ww, c).permute(0, 3, 1, 2)


def torch_ldm_vae_encode(sd, cfg, x):
    groups = cfg.norm_num_groups
    n = len(cfg.block_out_channels)
    h = conv(sd, "encoder.conv_in", x)
    for i in range(n):
        for j in range(cfg.layers_per_block):
            h = vae_resblock_torch(sd, f"encoder.down.{i}.block.{j}", h, groups)
        if i < n - 1:
            h = F.pad(h, (0, 1, 0, 1))  # CompVis asymmetric pad
            h = F.conv2d(
                h, _t(sd, f"encoder.down.{i}.downsample.conv.weight"),
                _t(sd, f"encoder.down.{i}.downsample.conv.bias"), stride=2,
            )
    h = vae_resblock_torch(sd, "encoder.mid.block_1", h, groups)
    h = vae_attn_torch(sd, "encoder.mid.attn_1", h, groups)
    h = vae_resblock_torch(sd, "encoder.mid.block_2", h, groups)
    h = conv(sd, "encoder.conv_out", F.silu(gn(sd, "encoder.norm_out", h, groups, eps=1e-6)))
    moments = F.conv2d(h, _t(sd, "quant_conv.weight"), _t(sd, "quant_conv.bias"))
    mean, logvar = moments.chunk(2, dim=1)
    return mean, torch.clamp(logvar, -30.0, 20.0)


def torch_ldm_vae_decode(sd, cfg, z):
    groups = cfg.norm_num_groups
    n = len(cfg.block_out_channels)
    h = F.conv2d(z, _t(sd, "post_quant_conv.weight"), _t(sd, "post_quant_conv.bias"))
    h = conv(sd, "decoder.conv_in", h)
    h = vae_resblock_torch(sd, "decoder.mid.block_1", h, groups)
    h = vae_attn_torch(sd, "decoder.mid.attn_1", h, groups)
    h = vae_resblock_torch(sd, "decoder.mid.block_2", h, groups)
    for ldm_i in reversed(range(n)):  # decoder.up indexed by resolution level
        for j in range(cfg.layers_per_block + 1):
            h = vae_resblock_torch(sd, f"decoder.up.{ldm_i}.block.{j}", h, groups)
        if ldm_i > 0:
            h = F.interpolate(h, scale_factor=2, mode="nearest")
            h = conv(sd, f"decoder.up.{ldm_i}.upsample.conv", h)
    return conv(sd, "decoder.conv_out", F.silu(gn(sd, "decoder.norm_out", h, groups, eps=1e-6)))


# ---------------------------------------------------------------------------
# Fixtures + tests
# ---------------------------------------------------------------------------


def _load_family(path, prefix):
    raw = load_checkpoint_file(path)
    return {
        k[len(prefix):]: torch.from_numpy(np.asarray(v, np.float32))
        for k, v in raw.items()
        if k.startswith(prefix)
    }


@pytest.fixture(scope="module")
def sdxl_ckpt(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("golden") / "tiny_sdxl.safetensors")
    synthesize_checkpoint(
        path, "sdxl", TINY_SDXL_UNET_CONFIG, TINY_VAE_CONFIG, TINY_CLIP_L_CONFIG,
        TINY_CLIP_G_CONFIG, seed=3,
    )
    return path


@pytest.fixture(scope="module")
def sd15_ckpt(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("golden15") / "tiny_sd15.safetensors")
    synthesize_checkpoint(
        path, "sd15", TINY_SD15_UNET_CONFIG, TINY_VAE_CONFIG, TINY_CLIP_L_CONFIG, seed=4,
    )
    return path


def _unet_parity(path, cfg, sdxl):
    sd_torch = _load_family(path, UNET_PREFIX)
    raw = load_checkpoint_file(path)
    unet_sd = {k[len(UNET_PREFIX):]: v for k, v in raw.items() if k.startswith(UNET_PREFIX)}
    params = convert_ldm_unet(unet_sd, cfg, dtype=jnp.float32)

    rng = np.random.RandomState(0)
    B, H, W = 2, 16, 16
    x = rng.randn(B, H, W, 4).astype(np.float32)
    t = np.array([37, 801], np.int64)
    ctx = rng.randn(B, 7, cfg.cross_attention_dim).astype(np.float32)
    added = None
    text_embeds = time_ids = None
    if sdxl:
        text_embeds = rng.randn(B, cfg.addition_pooled_dim).astype(np.float32)
        time_ids = np.array([[64, 64, 0, 0, 32, 32]] * B, np.float32)
        added = {
            "text_embeds": jnp.asarray(text_embeds),
            "time_ids": jnp.asarray(time_ids),
        }

    ours, _ = unet_forward(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), cfg,
        added_cond=added, use_flash=False, remat=False,
    )
    ours = np.asarray(ours)

    theirs = torch_ldm_unet(
        sd_torch, cfg,
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(t),
        torch.from_numpy(ctx),
        text_embeds=torch.from_numpy(text_embeds) if sdxl else None,
        time_ids=torch.from_numpy(time_ids) if sdxl else None,
    )
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=2e-4)


def test_unet_parity_sdxl_linear_proj(sdxl_ckpt):
    """SDXL topology: linear proj_in/out, depth-2/10 blocks, text_time emb."""
    _unet_parity(sdxl_ckpt, TINY_SDXL_UNET_CONFIG, sdxl=True)


def test_unet_parity_sd15_conv_proj(sd15_ckpt):
    """SD15 topology: conv proj_in/out, 4 levels, depth-1 blocks."""
    _unet_parity(sd15_ckpt, TINY_SD15_UNET_CONFIG, sdxl=False)


def test_vae_encode_decode_parity(sdxl_ckpt):
    sd_torch = _load_family(sdxl_ckpt, VAE_PREFIX)
    raw = load_checkpoint_file(sdxl_ckpt)
    vae_sd = {k[len(VAE_PREFIX):]: v for k, v in raw.items() if k.startswith(VAE_PREFIX)}
    params = convert_ldm_vae(vae_sd, TINY_VAE_CONFIG, dtype=jnp.float32)

    rng = np.random.RandomState(1)
    img = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    mean_j, logvar_j = vae_encode(params, jnp.asarray(img), TINY_VAE_CONFIG)
    mean_t, logvar_t = torch_ldm_vae_encode(
        sd_torch, TINY_VAE_CONFIG, torch.from_numpy(img).permute(0, 3, 1, 2)
    )
    np.testing.assert_allclose(
        np.asarray(mean_j), mean_t.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(logvar_j), logvar_t.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=2e-4
    )

    z = rng.randn(
        2, 32 // 2 ** (len(TINY_VAE_CONFIG.block_out_channels) - 1),
        32 // 2 ** (len(TINY_VAE_CONFIG.block_out_channels) - 1),
        TINY_VAE_CONFIG.latent_channels,
    ).astype(np.float32)
    # vae_decode takes SCALED latents (divides by scaling_factor internally)
    dec_j = vae_decode(
        params, jnp.asarray(z) * TINY_VAE_CONFIG.scaling_factor, TINY_VAE_CONFIG
    )
    dec_t = torch_ldm_vae_decode(
        sd_torch, TINY_VAE_CONFIG, torch.from_numpy(z).permute(0, 3, 1, 2)
    )
    np.testing.assert_allclose(
        np.asarray(dec_j), dec_t.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=2e-4
    )
