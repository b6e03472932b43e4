"""Attention ops for the UNet / CLIP / VAE stacks.

Two code paths:
- `multihead_attention` — einsum attention with fp32 softmax. XLA fuses this
  well on TPU for the short sequences (<= 4096 image tokens, 77 text tokens)
  SD runs at; it is also the reference path the Pallas kernel is tested
  against.
- a Pallas flash-attention path (ops/flash_attention.py) used for the large
  self-attention blocks at 1024px; dispatch is shape-gated in
  `self_attention`.

DAAM capture: when `capture_scores=True`, cross-attention also returns the
head-summed scaled QK^T scores [B, Lq, Lk] — the quantity the reference's
monkey-patched DAAMLossAttnProcessor2_0 stashes
(reference: trainer/ti_cross_attn_loss.py:201-212). Here it is an auxiliary
output, so it exists inside one jitted step.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    b, l, d = x.shape
    return x.reshape(b, l, heads, d // heads).transpose(0, 2, 1, 3)  # [B,H,L,dh]


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, l, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * dh)


def multihead_attention(
    q: jnp.ndarray,  # [B, Lq, D]
    k: jnp.ndarray,  # [B, Lk, D]
    v: jnp.ndarray,  # [B, Lk, D]
    heads: int,
    mask: Optional[jnp.ndarray] = None,  # additive, broadcastable to [B,H,Lq,Lk]
    capture_scores: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Plain attention with fp32 softmax. Returns (out [B,Lq,D], scores|None).

    `scores` (when captured) are the *pre-softmax* scaled logits summed over
    heads, in fp32 — DAAM semantics.
    """
    qh = _split_heads(q, heads)
    kh = _split_heads(k, heads)
    vh = _split_heads(v, heads)
    scale = 1.0 / jnp.sqrt(jnp.asarray(qh.shape[-1], jnp.float32))

    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        logits = logits + mask

    captured = jnp.sum(logits, axis=1) if capture_scores else None  # [B,Lq,Lk] fp32

    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
    return _merge_heads(out), captured


def self_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    use_flash: bool = False,
    tp_shard=None,  # (Mesh, data_axis_name, model_axis_name)
    name_tag: str = "",  # checkpoint_name suffix for the flash residuals
    stash8_out: bool = False,  # stash the flash output residual as int8
    pre_padded: int = 0,  # caller padded the sequence; this many tokens are real
) -> jnp.ndarray:
    """Self-attention over image tokens; flash kernel when shapes qualify.

    `pre_padded > 0`: the sequence was zero-padded by the caller (the UNet
    pads once per spatial-transformer module, models/unet.py) and only the
    first `pre_padded` tokens are real. The flash path masks the pad tokens
    via segment ids; every einsum fallback masks the pad KEYS additively so
    real rows never attend to them (pad rows' output is garbage either way —
    the caller slices it off, and its cotangent is zero).

    `tp_shard`: under Megatron tensor parallelism q/k/v arrive feature-sharded
    (attention heads split across the 'model' axis) and the Pallas flash
    custom call has no SPMD partitioning rules — GSPMD would replicate.
    shard_map splits the head axis explicitly: each device runs the kernel on
    its own heads (batch stays sharded on 'data'), composing flash with the
    mesh at zero communication. Falls back to einsum when heads don't divide.
    """
    if tp_shard is not None and use_flash:
        mesh, data_ax, model_ax = tp_shard
        n_model = mesh.shape[model_ax]
        n_data = mesh.shape[data_ax]
        if heads % n_model == 0 and q.shape[0] % n_data == 0:
            from jax.sharding import PartitionSpec as P

            spec = P(data_ax, None, model_ax)
            local_heads = heads // n_model

            def local_attn(ql, kl, vl):
                return self_attention(
                    ql, kl, vl, local_heads, use_flash=use_flash,
                    name_tag=name_tag, stash8_out=stash8_out,
                    pre_padded=pre_padded,
                )

            return jax.shard_map(
                local_attn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec
            )(q, k, v)
        # heads (or batch) don't divide the mesh: running the Pallas custom
        # call WITHOUT the shard_map would make GSPMD fully replicate q/k/v —
        # the exact regression the old tp-disables-flash guard prevented.
        # Einsum attention partitions fine under GSPMD, so fall back to it.
        use_flash = False
    if use_flash:
        from sd_lora_trainer_tpu.ops.flash_attention import flash_attention_qualifies, flash_mha

        if flash_attention_qualifies(q.shape, k.shape, heads):
            return flash_mha(
                q, k, v, heads, name_tag=name_tag, stash8_out=stash8_out,
                pre_padded=pre_padded,
            )
    mask = None
    if pre_padded:
        # einsum fallback on a pre-padded sequence: exclude the pad keys so
        # real rows match the unpadded computation exactly
        keymask = jnp.arange(k.shape[1]) < pre_padded
        mask = jnp.where(keymask, 0.0, -1e9).astype(jnp.float32)[None, None, None, :]
    out, _ = multihead_attention(q, k, v, heads, mask=mask)
    return out


def make_causal_mask(length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Additive causal mask [1, 1, L, L] (CLIP text encoder)."""
    # -0.7*float_max style large-negative instead of -inf avoids NaNs in
    # exp(-inf - (-inf)) corner cases on TPU.
    neg = jnp.asarray(-0.7 * jnp.finfo(jnp.float32).max, dtype)
    mask = jnp.triu(jnp.full((length, length), neg, dtype), k=1)
    return mask[None, None]
