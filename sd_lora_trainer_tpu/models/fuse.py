"""Compute-layout fusions for the UNet's attention projections.

`fuse_attention_projections` rewrites a UNet param tree so each transformer
block's projections issue fewer, larger matmuls on the MXU:

- attn1 (self-attention): to_q/to_k/to_v kernels [C,C] concatenate into ONE
  [C,3C] `qkv` kernel — one matmul instead of three over the same input.
- attn2 (cross-attention): to_k/to_v kernels [ctx,C] concatenate into one
  [ctx,2C] `kv` kernel over the text context. (to_q reads the image stream —
  different input, stays separate.)

The base kernels are REMOVED from their projection dicts (no extra HBM); the
dicts remain as LoRA carriers — inject_lora still attaches adapters per
projection and the forward applies each low-rank delta to its split slice, so
training/export semantics are unchanged (kohya export reads the ORIGINAL
unfused tree; this transform only feeds the jitted step's frozen copy).

Not applicable with DoRA (its column-norm needs the per-projection base
kernel, models/layers.py:_apply_lora_dense) — callers gate on that.
"""

from __future__ import annotations

import jax.numpy as jnp

from sd_lora_trainer_tpu.models.quant import QTensor


def _concat_out(kernels):
    """Concatenate projection kernels along the output axis.

    Quantized bases (models/quant.py) concatenate code-wise: per-output-channel
    scales live on the same axis, so the fused QTensor is exactly the
    quantization of the fused kernel."""
    if all(isinstance(k, QTensor) for k in kernels):
        return QTensor(
            jnp.concatenate([k.q for k in kernels], axis=1),
            jnp.concatenate([k.s for k in kernels], axis=1),
            kernels[0].dtype,
        )
    return jnp.concatenate(kernels, axis=1)


def _fuse_tblock(tb: dict) -> dict:
    tb = dict(tb)
    for attn, names, fused_key in (
        ("attn1", ("to_q", "to_k", "to_v"), "qkv"),
        ("attn2", ("to_k", "to_v"), "kv"),
    ):
        a = dict(tb[attn])
        if not all("kernel" in a.get(n, {}) for n in names):
            continue
        a[fused_key] = {
            "kernel": _concat_out([a[n]["kernel"] for n in names])
        }
        for n in names:
            sub = dict(a[n])
            del sub["kernel"]
            a[n] = sub  # keeps any "lora" subdict in place
        tb[attn] = a
    return tb


def _fuse_attention(sp: dict) -> dict:
    sp = dict(sp)
    sp["transformer_blocks"] = [_fuse_tblock(tb) for tb in sp["transformer_blocks"]]
    return sp


def fuse_attention_projections(unet_params: dict) -> dict:
    """Return a new tree with fused qkv/kv kernels in every spatial
    transformer (down/mid/up). Leaves everything else untouched."""
    out = dict(unet_params)
    for key in ("down_blocks", "up_blocks"):
        blocks = []
        for bp in out.get(key, []):
            bp = dict(bp)
            if "attentions" in bp:
                bp["attentions"] = [_fuse_attention(sp) for sp in bp["attentions"]]
            blocks.append(bp)
        out[key] = blocks
    mid = dict(out["mid_block"])
    if "attentions" in mid:
        mid["attentions"] = [_fuse_attention(sp) for sp in mid["attentions"]]
    out["mid_block"] = mid
    return out
