"""UNet2DCondition (SD1.5 + SDXL) in functional JAX, NHWC, bf16-first.

The reference gets this model from diffusers (trainer/models.py:7-54 loads the
pipeline; trainer/main.py:329-336 runs the forward). We own it: one
implementation parameterized by `UNetConfig` covers both SD1.5 (4 levels,
transformer depth 1, 8 heads, cross-dim 768) and SDXL (3 levels, transformer
depths 0/2/10, 64-dim heads, cross-dim 2048, text_time additional embeddings).

TPU-first design notes:
- NHWC activations and HWIO conv kernels (XLA's native TPU conv layout).
- attention is `ops.attention` (einsum + fp32 softmax) with a Pallas flash
  path for the long-sequence self-attention blocks.
- every cross-attention can emit DAAM score aux outputs — the reference's
  monkey-patched processors (trainer/ti_cross_attn_loss.py:114-230) become a
  `capture_attn` flag returning {layer_name: [B, Lq, 77]} alongside the output.
- `remat=True` wraps each down/mid/up block in jax.checkpoint so the 2.6B-param
  SDXL UNet trains at 1024px within a v5e chip's HBM.

Param tree mirrors diffusers module naming (down_blocks.N.attentions.M...),
which is the naming the kohya export contract is expressed in.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from sd_lora_trainer_tpu.models.layers import (
    _apply_lora_dense,
    conv2d,
    dense,
    gelu,
    group_norm,
    layer_norm,
    silu,
    timestep_embedding,
    upsample_nearest_2x,
)
from sd_lora_trainer_tpu.ops.attention import multihead_attention, self_attention


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    # per-level: True => CrossAttnDownBlock2D / CrossAttnUpBlock2D
    cross_attention: Tuple[bool, ...] = (True, True, True, False)
    layers_per_block: int = 2
    transformer_layers: Tuple[int, ...] = (1, 1, 1, 0)  # per level
    num_heads: Tuple[int, ...] = (8, 8, 8, 8)  # per level
    mid_transformer_layers: int = 1
    mid_num_heads: int = 8
    cross_attention_dim: int = 768
    use_linear_projection: bool = False
    norm_num_groups: int = 32
    # SDXL "text_time" additional embeddings
    addition_embed_dim: Optional[int] = None  # 256 for SDXL
    addition_pooled_dim: Optional[int] = None  # 1280 for SDXL
    addition_time_ids: int = 6

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    @property
    def addition_input_dim(self) -> Optional[int]:
        if self.addition_embed_dim is None:
            return None
        return self.addition_pooled_dim + self.addition_embed_dim * self.addition_time_ids


SD15_UNET_CONFIG = UNetConfig()

SDXL_UNET_CONFIG = UNetConfig(
    block_out_channels=(320, 640, 1280),
    cross_attention=(False, True, True),
    transformer_layers=(0, 2, 10),
    num_heads=(5, 10, 20),
    mid_transformer_layers=10,
    mid_num_heads=20,
    cross_attention_dim=2048,
    use_linear_projection=True,
    addition_embed_dim=256,
    addition_pooled_dim=1280,
)

# Tiny config for unit tests and the multichip dry-run: same topology as SDXL
# (3 levels, one attention-free level, text_time embeddings) at toy widths.
TINY_SDXL_UNET_CONFIG = UNetConfig(
    block_out_channels=(32, 64, 64),
    cross_attention=(False, True, True),
    layers_per_block=1,
    transformer_layers=(0, 1, 2),
    num_heads=(1, 2, 2),
    mid_transformer_layers=1,
    mid_num_heads=2,
    cross_attention_dim=64,
    use_linear_projection=True,
    norm_num_groups=8,
    addition_embed_dim=8,
    addition_pooled_dim=32,
)

TINY_SD15_UNET_CONFIG = UNetConfig(
    block_out_channels=(32, 64, 64, 64),
    cross_attention=(True, True, True, False),
    layers_per_block=1,
    transformer_layers=(1, 1, 1, 0),
    num_heads=(2, 2, 2, 2),
    mid_transformer_layers=1,
    mid_num_heads=2,
    cross_attention_dim=48,
    use_linear_projection=False,
    norm_num_groups=8,
)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def _resnet(p: dict, x: jnp.ndarray, temb: jnp.ndarray, groups: int) -> jnp.ndarray:
    h = conv2d(p["conv1"], silu(group_norm(p["norm1"], x, groups)), padding=1)
    t = dense(p["time_emb_proj"], silu(temb))  # [B, C]
    h = h + t[:, None, None, :].astype(h.dtype)
    h = conv2d(p["conv2"], silu(group_norm(p["norm2"], h, groups)), padding=1)
    if "conv_shortcut" in p:
        x = conv2d(p["conv_shortcut"], x, padding="VALID")
    return x + h


def _tag(x: jnp.ndarray, name: str, stash8_names=frozenset()) -> jnp.ndarray:
    """checkpoint_name the activation — as a row-wise int8 stash (half the
    HBM under a `save:` policy) when the name is in the stash8 set."""
    if name in stash8_names:
        from sd_lora_trainer_tpu.ops.stash8 import stash8

        return stash8(x, name)
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(x, name)


def _module_pad_len(b: int, ntok: int, c: int, heads: int, use_flash: bool) -> int:
    """Padded token count for a spatial transformer, or 0 for no padding.

    Aspect-ratio bucket shapes produce self-attention lengths the flash
    kernel must pad (832x1216 -> 3952 -> 4096). Padding per attention call
    serialized ~500 x 40 MB pad/slice DMAs per train step — 7.1 s/step of
    async-copy wall against 2.1 s of compute (bench_logs/r5_session.log,
    ragged 832x1216 profile). Instead the UNet pads ONCE per module: every
    transformer block then runs at the padded length (LN/FF/residuals are
    row-local; self-attention masks pad tokens via segment ids; cross-attn
    pad rows compute garbage that is sliced off at module exit with zero
    cotangent), and the pad/slice pair amortizes over the whole block stack.
    """
    if not use_flash:
        return 0
    from sd_lora_trainer_tpu.ops.flash_attention import (
        _pad_plan,
        flash_attention_qualifies,
    )

    if not flash_attention_qualifies((b, ntok, c), (b, ntok, c), heads):
        return 0
    lp = _pad_plan(ntok)[0]
    return lp if lp != ntok else 0


def _transformer_block(
    p: dict,
    x: jnp.ndarray,  # [B, L, C]
    ctx: jnp.ndarray,  # [B, 77, cross_dim]
    heads: int,
    capture: bool,
    use_flash: bool,
    flash_tp=None,
    stash8_names=frozenset(),
    pre_padded: int = 0,  # caller padded L; this many tokens are real
):
    from jax.ad_checkpoint import checkpoint_name  # noqa: F401  (via _tag)

    # checkpoint_name tags: inert without a naming remat policy; a
    # "save:..."/"offload:..." remat mode (unet_forward) uses them to keep
    # selected intermediates instead of recomputing them in backward. The
    # channel suffix lets policies target one resolution level at a time.
    tag = f"_c{x.shape[-1]}"
    # self-attention
    h = layer_norm(p["norm1"], x)
    a1 = p["attn1"]
    if "qkv" in a1:
        # fused layout (models/fuse.py): one [C,3C] matmul; LoRA deltas still
        # apply per projection onto the split slices
        q, k, v = jnp.split(h @ a1["qkv"]["kernel"].astype(h.dtype), 3, axis=-1)
        if "lora" in a1.get("to_q", {}):
            q = _apply_lora_dense(a1["to_q"], h, q)
        if "lora" in a1.get("to_k", {}):
            k = _apply_lora_dense(a1["to_k"], h, k)
        if "lora" in a1.get("to_v", {}):
            v = _apply_lora_dense(a1["to_v"], h, v)
    else:
        q = dense(a1["to_q"], h)
        k = dense(a1["to_k"], h)
        v = dense(a1["to_v"], h)
    attn = self_attention(
        q, k, v, heads, use_flash=use_flash, tp_shard=flash_tp, name_tag=tag,
        stash8_out=(f"flash_out{tag}" in stash8_names), pre_padded=pre_padded,
    )
    attn = _tag(attn, f"attn_out{tag}", stash8_names)
    x = x + dense(a1["to_out.0"], attn)

    # cross-attention (+ optional DAAM score capture)
    h = layer_norm(p["norm2"], x)
    a2 = p["attn2"]
    q = dense(a2["to_q"], h)
    if "kv" in a2:
        k, v = jnp.split(ctx @ a2["kv"]["kernel"].astype(ctx.dtype), 2, axis=-1)
        if "lora" in a2.get("to_k", {}):
            k = _apply_lora_dense(a2["to_k"], ctx, k)
        if "lora" in a2.get("to_v", {}):
            v = _apply_lora_dense(a2["to_v"], ctx, v)
    else:
        k = dense(a2["to_k"], ctx)
        v = dense(a2["to_v"], ctx)
    attn, scores = multihead_attention(q, k, v, heads, capture_scores=capture)
    if scores is not None and pre_padded:
        # DAAM consumers assert q_len == h*w — drop the pad rows
        scores = scores[:, :pre_padded]
    # distinct tag: the SELF-attention attn_out duplicates flash_out bytes
    # (same tensor reshaped), so plans that already save flash residuals can
    # target the non-redundant cross-attention outputs alone
    attn = _tag(attn, f"xattn_out{tag}", stash8_names)
    x = x + dense(a2["to_out.0"], attn)

    # GEGLU feed-forward
    h = layer_norm(p["norm3"], x)
    kproj = p["ff.net.0.proj"]["kernel"]
    if kproj.ndim == 3:
        # tensor-parallel layout [in, 2, inner] (main.py reshapes at TP
        # setup): value/gate halves live on axis 1, so a 'model'-axis shard of
        # the LAST axis holds MATCHING a/b column slices — a*gelu(b) is then
        # local to each device, no resharding (contiguous-half column
        # sharding would put each half wholly on one device).
        h2 = jnp.einsum("blc,cti->blti", h, kproj.astype(h.dtype))
        bias = p["ff.net.0.proj"]["bias"]
        if bias.ndim == 1:
            bias = bias.reshape(2, -1)
        h2 = h2 + bias.astype(h.dtype)
        h2 = _tag(h2, f"ff_hidden{tag}", stash8_names)
        a, b = h2[..., 0, :], h2[..., 1, :]
    else:
        h2 = _tag(dense(p["ff.net.0.proj"], h), f"ff_hidden{tag}", stash8_names)
        a, b = jnp.split(h2, 2, axis=-1)
    x = x + dense(p["ff.net.2"], a * gelu(b))
    return x, scores


def _spatial_transformer(
    p: dict,
    x: jnp.ndarray,  # NHWC
    ctx: jnp.ndarray,
    cfg: UNetConfig,
    heads: int,
    name: str,
    capture: bool,
    use_flash: bool,
    flash_tp=None,
    stash8_names=frozenset(),
):
    """Transformer2DModel: GN -> proj_in -> blocks -> proj_out -> residual."""
    b, hh, ww, c = x.shape
    residual = x
    h = group_norm(p["norm"], x, cfg.norm_num_groups)
    scores_out = {}
    ntok = hh * ww
    if cfg.use_linear_projection:
        h = h.reshape(b, ntok, c)
        h = dense(p["proj_in"], h)
    else:
        h = conv2d(p["proj_in"], h, padding="VALID")
        h = h.reshape(b, ntok, c)
    # Pad ragged bucket lengths ONCE for the whole block stack (rationale and
    # per-row-exactness argument at _module_pad_len); blocks mask via segment
    # ids, the pad rows are sliced off (zero cotangent) before proj_out.
    pad_to = _module_pad_len(b, ntok, c, heads, use_flash)
    if pad_to:
        h = jnp.pad(h, ((0, 0), (0, pad_to - ntok), (0, 0)))
    for i, bp in enumerate(p["transformer_blocks"]):
        h, scores = _transformer_block(
            bp, h, ctx, heads, capture, use_flash, flash_tp, stash8_names,
            pre_padded=ntok if pad_to else 0,
        )
        if scores is not None:
            scores_out[f"{name}.transformer_blocks.{i}.attn2"] = scores
    if pad_to:
        h = h[:, :ntok]
    if cfg.use_linear_projection:
        h = dense(p["proj_out"], h)
        h = h.reshape(b, hh, ww, c)
    else:
        h = h.reshape(b, hh, ww, c)
        h = conv2d(p["proj_out"], h, padding="VALID")
    return residual + h, scores_out


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _named_policy_remat(spec: str, cfg: "UNetConfig"):
    """Named-activation remat: full recompute EXCEPT the listed
    checkpoint_name'd intermediates, which are saved on device ("save:") or
    offloaded to host DRAM ("offload:", streamed back by XLA in backward).
    Names come from _transformer_block / flash_attention._named_flash; a
    trailing '*' expands over the per-level channel suffixes, e.g.
    "save:flash_out*,flash_lse*"."""
    from sd_lora_trainer_tpu.ops.stash8 import expand_names

    kind, _, raw = spec.partition(":")
    names = expand_names(raw, cfg.block_out_channels)
    if kind == "save":
        policy = jax.checkpoint_policies.save_only_these_names(*names)
    else:
        policy = jax.checkpoint_policies.save_and_offload_only_these_names(
            names_which_can_be_saved=[],
            names_which_can_be_offloaded=names,
            offload_src="device",
            offload_dst="pinned_host",
        )
    return lambda f: jax.checkpoint(f, policy=policy)


def unet_forward(
    params: dict,
    latents: jnp.ndarray,  # [B, H, W, 4]
    timesteps: jnp.ndarray,  # [B] int32/float32
    encoder_hidden_states: jnp.ndarray,  # [B, 77, cross_dim]
    cfg: UNetConfig,
    added_cond: Optional[dict] = None,  # {"text_embeds": [B,1280], "time_ids": [B,6]}
    capture_attn: bool = False,
    use_flash: bool = True,
    remat: bool = True,
    flash_tp=None,  # (Mesh, data_axis, model_axis): flash via shard_map under TP
    stash8: str = "",  # comma list of checkpoint names to stash as int8 (ops/stash8.py)
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Predict noise. Returns (eps_pred [B,H,W,4], attn_scores dict).

    attn_scores is non-empty only with capture_attn=True and contains the
    head-summed scaled QK^T logits of every down/up-block cross-attention
    (the reference's DAAM probe covers down/up blocks only,
    ti_cross_attn_loss.py:88-112).
    """
    ctx = encoder_hidden_states
    groups = cfg.norm_num_groups

    if stash8:
        from sd_lora_trainer_tpu.ops.stash8 import expand_names

        if not (isinstance(remat, str) and "save:" in remat):
            # quantizing without a policy that saves the stash is pure
            # quality loss (the int8 pair would be recomputed, not kept)
            raise ValueError(
                f"stash8={stash8!r} requires a 'save:'-family remat plan "
                f"whose names include the stashed ones, got remat={remat!r}"
            )
        stash8_names = frozenset(expand_names(stash8, cfg.block_out_channels))
    else:
        stash8_names = frozenset()

    # --- time (+ SDXL text_time) embedding, fp32 ---
    t_emb = timestep_embedding(timesteps, cfg.block_out_channels[0])
    temb = dense(params["time_embedding"]["linear_2"], silu(dense(params["time_embedding"]["linear_1"], t_emb)))
    if cfg.addition_embed_dim is not None:
        assert added_cond is not None, "SDXL UNet needs added_cond text_embeds/time_ids"
        time_ids = added_cond["time_ids"].reshape(-1)  # [B*6]
        add_t = timestep_embedding(time_ids, cfg.addition_embed_dim)
        add_t = add_t.reshape(temb.shape[0], -1)  # [B, 6*256]
        add_emb = jnp.concatenate(
            [added_cond["text_embeds"].astype(add_t.dtype), add_t], axis=-1
        )  # [B, 2816]
        add_emb = dense(
            params["add_embedding"]["linear_2"], silu(dense(params["add_embedding"]["linear_1"], add_emb))
        )
        temb = temb + add_emb
    temb = temb.astype(latents.dtype)

    if isinstance(remat, str) and remat.startswith("light+"):
        # "light+save:<names>": plain-resnet layers save all activations
        # (light), attention layers remat with the named-save policy
        _, _, sub = remat.partition("+")
        remat_attn = _named_policy_remat(sub, cfg)
        maybe_remat = remat_attn
        remat_plain = lambda f: f  # noqa: E731
    elif isinstance(remat, str) and remat.startswith(("save:", "offload:")):
        maybe_remat = _named_policy_remat(remat, cfg)
        remat_plain = maybe_remat
    elif remat == "dots":
        # save matmul/conv outputs, recompute elementwise — trades a little
        # HBM for much less recomputation in the backward pass
        policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        maybe_remat = lambda f: jax.checkpoint(f, policy=policy)  # noqa: E731
        remat_plain = maybe_remat
    elif remat == "light":
        # selective: remat only attention-bearing layers; plain resnet layers
        # (the highest-resolution, most conv-expensive ones) save activations
        maybe_remat = jax.checkpoint
        remat_plain = lambda f: f  # noqa: E731
    elif isinstance(remat, str):
        # A typo'd policy spec silently running full remat would invalidate
        # any measurement the operator thinks they made — reject it. "auto"
        # must be resolved by the caller (main.py / bench.py) before here.
        raise ValueError(
            f"unknown remat policy {remat!r}: expected True/False, 'light', "
            "'dots', 'save:<names>', 'offload:<names>', 'light+save:<names>'"
        )
    elif remat:
        maybe_remat = jax.checkpoint
        remat_plain = jax.checkpoint
    else:
        maybe_remat = lambda f: f  # noqa: E731
        remat_plain = maybe_remat

    x = conv2d(params["conv_in"], latents, padding=1)
    skips = [x]
    attn_scores: Dict[str, jnp.ndarray] = {}

    # --- down ---
    for i, ch in enumerate(cfg.block_out_channels):
        bp = params["down_blocks"][i]
        has_attn = cfg.cross_attention[i]

        for j in range(cfg.layers_per_block):
            layer_params = {"resnet": bp["resnets"][j]}
            if has_attn:
                layer_params["attention"] = bp["attentions"][j]

            def down_layer(
                layer_params, x, temb, ctx, i=i, has_attn=has_attn,
                name=f"down_blocks.{i}.attentions.{j}",
            ):
                scores = {}
                x = _resnet(layer_params["resnet"], x, temb, groups)
                if has_attn:
                    x, scores = _spatial_transformer(
                        layer_params["attention"], x, ctx, cfg, cfg.num_heads[i],
                        name, capture_attn, use_flash, flash_tp, stash8_names,
                    )
                return x, scores

            wrap = maybe_remat if has_attn else remat_plain
            x, scores = wrap(down_layer)(layer_params, x, temb, ctx)
            attn_scores.update(scores)
            skips.append(x)
        if "downsamplers" in bp:
            x = conv2d(bp["downsamplers"][0]["conv"], x, stride=2, padding=1)
            skips.append(x)

    # --- mid ---
    mid = params["mid_block"]

    def mid_fn(mid, x, temb, ctx):
        scores = {}
        x = _resnet(mid["resnets"][0], x, temb, groups)
        if "attentions" in mid:
            x, scores = _spatial_transformer(
                mid["attentions"][0],
                x,
                ctx,
                cfg,
                cfg.mid_num_heads,
                "mid_block.attentions.0",
                False,  # the reference's DAAM probe skips the mid block
                use_flash,
                flash_tp,
                stash8_names,
            )
        x = _resnet(mid["resnets"][1], x, temb, groups)
        return x, scores

    x, _ = maybe_remat(mid_fn)(mid, x, temb, ctx)

    # --- up ---
    rev_channels = list(reversed(cfg.block_out_channels))
    for i in range(len(cfg.block_out_channels)):
        level = len(cfg.block_out_channels) - 1 - i  # original down level index
        bp = params["up_blocks"][i]
        has_attn = cfg.cross_attention[level]

        for j in range(cfg.layers_per_block + 1):
            layer_params = {"resnet": bp["resnets"][j]}
            if has_attn:
                layer_params["attention"] = bp["attentions"][j]

            def up_layer(
                layer_params, x, skip, temb, ctx, level=level, has_attn=has_attn,
                name=f"up_blocks.{i}.attentions.{j}",
            ):
                scores = {}
                x = jnp.concatenate([x, skip], axis=-1)
                x = _resnet(layer_params["resnet"], x, temb, groups)
                if has_attn:
                    x, scores = _spatial_transformer(
                        layer_params["attention"], x, ctx, cfg, cfg.num_heads[level],
                        name, capture_attn, use_flash, flash_tp, stash8_names,
                    )
                return x, scores

            wrap = maybe_remat if has_attn else remat_plain
            x, scores = wrap(up_layer)(layer_params, x, skips.pop(), temb, ctx)
            attn_scores.update(scores)
        if "upsamplers" in bp:
            x = upsample_nearest_2x(x)
            x = conv2d(bp["upsamplers"][0]["conv"], x, padding=1)

    x = conv2d(params["conv_out"], silu(group_norm(params["conv_norm_out"], x, groups)), padding=1)
    return x, attn_scores


# ---------------------------------------------------------------------------
# Init (tests / synthetic checkpoints / bench)
# ---------------------------------------------------------------------------


def init_unet_params(key: jax.Array, cfg: UNetConfig, dtype=jnp.bfloat16) -> dict:
    """Random-init a UNet param tree with the exact structure conversion
    produces (used by tests and the throughput bench)."""
    key_iter = iter(jax.random.split(key, 20000))

    def lin(cin, cout, std=0.02):
        return {
            "kernel": jax.random.normal(next(key_iter), (cin, cout), dtype) * std,
            "bias": jnp.zeros((cout,), dtype),
        }

    def lin_nobias(cin, cout, std=0.02):
        return {"kernel": jax.random.normal(next(key_iter), (cin, cout), dtype) * std}

    def conv(cin, cout, k=3, std=0.02):
        return {
            "kernel": jax.random.normal(next(key_iter), (k, k, cin, cout), dtype) * std,
            "bias": jnp.zeros((cout,), dtype),
        }

    def gn(c):
        return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    def ln(c):
        return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    ted = cfg.time_embed_dim

    def resnet(cin, cout):
        p = {
            "norm1": gn(cin),
            "conv1": conv(cin, cout),
            "time_emb_proj": lin(ted, cout),
            "norm2": gn(cout),
            "conv2": conv(cout, cout),
        }
        if cin != cout:
            p["conv_shortcut"] = conv(cin, cout, 1)
        return p

    def tblock(c):
        return {
            "norm1": ln(c),
            "attn1": {
                "to_q": lin_nobias(c, c),
                "to_k": lin_nobias(c, c),
                "to_v": lin_nobias(c, c),
                "to_out.0": lin(c, c),
            },
            "norm2": ln(c),
            "attn2": {
                "to_q": lin_nobias(c, c),
                "to_k": lin_nobias(cfg.cross_attention_dim, c),
                "to_v": lin_nobias(cfg.cross_attention_dim, c),
                "to_out.0": lin(c, c),
            },
            "norm3": ln(c),
            "ff.net.0.proj": lin(c, c * 8),
            "ff.net.2": lin(c * 4, c),
        }

    def transformer(c, depth):
        p = {
            "norm": gn(c),
            "transformer_blocks": [tblock(c) for _ in range(depth)],
        }
        if cfg.use_linear_projection:
            p["proj_in"] = lin(c, c)
            p["proj_out"] = lin(c, c)
        else:
            p["proj_in"] = conv(c, c, 1)
            p["proj_out"] = conv(c, c, 1)
        return p

    ch = cfg.block_out_channels
    down_blocks = []
    cin = ch[0]
    for i, cout in enumerate(ch):
        block = {"resnets": []}
        if cfg.cross_attention[i]:
            block["attentions"] = []
        c = cin
        for _ in range(cfg.layers_per_block):
            block["resnets"].append(resnet(c, cout))
            if cfg.cross_attention[i]:
                block["attentions"].append(transformer(cout, cfg.transformer_layers[i]))
            c = cout
        if i < len(ch) - 1:
            block["downsamplers"] = [{"conv": conv(cout, cout)}]
        down_blocks.append(block)
        cin = cout

    mid_c = ch[-1]
    mid_block = {
        "resnets": [resnet(mid_c, mid_c), resnet(mid_c, mid_c)],
        "attentions": [transformer(mid_c, cfg.mid_transformer_layers)],
    }

    # up blocks: channel bookkeeping mirrors diffusers — skip channels come
    # from the down path in reverse order.
    down_skip_channels = [ch[0]]
    for i, cout in enumerate(ch):
        down_skip_channels += [cout] * cfg.layers_per_block
        if i < len(ch) - 1:
            down_skip_channels.append(cout)

    up_blocks = []
    rev = list(reversed(ch))
    prev_out = mid_c
    for i, cout in enumerate(rev):
        level = len(ch) - 1 - i
        block = {"resnets": []}
        if cfg.cross_attention[level]:
            block["attentions"] = []
        for _ in range(cfg.layers_per_block + 1):
            skip_c = down_skip_channels.pop()
            block["resnets"].append(resnet(prev_out + skip_c, cout))
            if cfg.cross_attention[level]:
                block["attentions"].append(transformer(cout, cfg.transformer_layers[level]))
            prev_out = cout
        if i < len(rev) - 1:
            block["upsamplers"] = [{"conv": conv(cout, cout)}]
        up_blocks.append(block)

    params = {
        "conv_in": conv(cfg.in_channels, ch[0]),
        "time_embedding": {"linear_1": lin(ch[0], ted), "linear_2": lin(ted, ted)},
        "down_blocks": down_blocks,
        "mid_block": mid_block,
        "up_blocks": up_blocks,
        "conv_norm_out": gn(ch[0]),
        "conv_out": conv(ch[0], cfg.out_channels),
    }
    if cfg.addition_embed_dim is not None:
        params["add_embedding"] = {
            "linear_1": lin(cfg.addition_input_dim, ted),
            "linear_2": lin(ted, ted),
        }
    return params
