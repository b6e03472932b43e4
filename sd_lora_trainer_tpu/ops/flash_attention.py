"""Flash attention for the UNet's big self-attention blocks.

At 1024px SDXL the top self-attention runs at 4096 image tokens; materializing
[B, heads, 4096, 4096] logits is HBM-bandwidth waste. This wraps the tiled,
online-softmax Pallas TPU kernel (jax.experimental.pallas.ops.tpu) with
SD-specific shape gating + head-dim padding so every UNet level can use it:

- SD15 head dims are 40/80/160 — zero-padding Q/K to a lane-aligned head dim
  leaves QK^T unchanged, and zero-padding V just adds zero output columns we
  slice off. `sm_scale` always uses the *original* head dim.
- sequence lengths below 256 (the UNet's deepest levels) fall back to einsum
  attention in the caller; the tiny logits tensors there are cheap.

On CPU (tests) the kernel is unavailable, so `flash_attention_qualifies`
returns False unless we're on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.cache
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def flash_attention_qualifies(q_shape, k_shape, heads: int) -> bool:
    """Gate: TPU backend, seq lengths tile-able, self-attention-sized KV."""
    if not _on_tpu():
        return False
    b, lq, d = q_shape
    _, lk, _ = k_shape
    head_dim = d // heads
    if head_dim > 256:
        return False
    if lq == lk:
        # self-attention: ANY length >= 256 qualifies — non-128-multiple
        # lengths (most aspect-ratio bucket shapes, e.g. 832x1216 -> 3952
        # tokens) are zero-padded to a tile-able length with segment-id
        # masking (flash_mha), instead of falling back to einsum whose
        # [B,h,L,L] logits are GBs at those L.
        return lq >= 256
    # cross-shaped (unused today): both sequence dims must tile at >= 128
    return lq % 128 == 0 and lk % 128 == 0 and lq >= 256 and lk >= 256


def _pad_plan(l: int):
    """(padded_len, block_q, block_k) for a self-attention length l.

    The kernel needs block sizes that divide the sequence length, and the
    measured-best blocks are 512/1024 (block_k=1024 beats 512 by ~13% at
    [8,10,4096,64]; the 128/128 fallback the old plan used for 128-multiple
    lengths like 3840 measured ~10x slower END TO END at the 768x1280 bucket
    — bench_logs/r5_ragged_diag.log). So: any length above 512 that is not
    already a 1024-multiple pads up to one (<= 6.7% extra FLOPs at real
    bucket shapes, masked via segment ids); lengths <= 512 pad to a
    128-multiple and use single-block grids.
    """
    if l % 1024 == 0 or (l <= 512 and l % 128 == 0):
        lp = l
    else:
        lp = _round_up(l, 1024 if l > 512 else 128)
    blk_q = min(512, lp)
    blk_k = min(1024, lp)
    if lp % blk_q:
        blk_q = 128  # always divides (lp is a multiple of 128)
    if lp % blk_k:
        blk_k = 128
    return lp, blk_q, blk_k


@functools.lru_cache(maxsize=None)
def _named_flash(
    sm_scale: float,
    blk_q: int,
    blk_k: int,
    tag: str,
    stash8_out: bool = False,
    valid_len: int = 0,
):
    """Flash attention as our own custom_vjp with `checkpoint_name`d residuals.

    Under `jax.checkpoint` (full remat), the backward pass re-runs the
    forward kernel just to regenerate its softmax residuals (o, l, m). The
    library's custom_vjp hides those residuals, so no remat policy can elect
    to save them. This wrapper calls the underlying fwd/bwd pallas kernels
    directly and names the residuals — a `save_only_these_names` /
    `save_and_offload_only_these_names` policy that saves
    `flash_out{tag}` + `flash_lse{tag}` elides the forward-kernel recompute
    entirely (q/k/v rebuild from the cheap projection matmuls). With no
    naming policy the names are inert and behavior is identical to the
    library path (numerics pinned by scripts/flash_parity_tpu.py).
    """
    from jax.ad_checkpoint import checkpoint_name
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        DEFAULT_MASK_VALUE,
        BlockSizes,
        SegmentIds,
        _flash_attention,
        _flash_attention_bwd_dkv,
        _flash_attention_bwd_dq,
    )

    def seg_ids(qh):
        """valid_len > 0: the sequence was padded (aspect-ratio bucket shape).
        Valid tokens share id 1; padded tokens share id 0, so padded q rows
        attend to >= 1 (padded) key — a well-defined softmax, no NaN rows —
        while never mixing with real tokens. The padded rows' garbage output
        is sliced off by the caller; their cotangent is zero, so dk/dv get no
        contribution from them."""
        if valid_len == 0:
            return None
        b, _, lp, _ = qh.shape
        ids = (jnp.arange(lp) < valid_len).astype(jnp.int32)
        ids = jnp.broadcast_to(ids[None], (b, lp))
        return SegmentIds(q=ids, kv=ids)

    def sizes():
        return BlockSizes(
            block_q=blk_q, block_k_major=blk_k, block_k=blk_k, block_b=1,
            block_q_major_dkv=blk_q, block_k_major_dkv=blk_k, block_k_dkv=blk_k,
            block_q_dkv=blk_q, block_k_major_dq=blk_k, block_k_dq=blk_k,
            block_q_dq=blk_q,
        )

    @jax.custom_vjp
    def f(qh, kh, vh):
        return _flash_attention(
            qh, kh, vh, None, seg_ids(qh), False, False, sm_scale, sizes(), False
        )

    def fwd(qh, kh, vh):
        o, l, m = _flash_attention(
            qh, kh, vh, None, seg_ids(qh), True, False, sm_scale, sizes(), False
        )
        if stash8_out:
            # int8 stash of the output residual (ops/stash8.py): halves the
            # HBM the save-policy keeps. The dequantized o~ is BOTH the
            # primal output and the backward residual, so fwd/bwd stay
            # consistent — the quantizer is the only approximation.
            from sd_lora_trainer_tpu.ops.stash8 import (
                dequantize_rowwise,
                quantize_rowwise,
            )

            qo, so = quantize_rowwise(o)
            qo = checkpoint_name(qo, f"flash_out{tag}")
            so = checkpoint_name(so, f"flash_out{tag}")
            o = dequantize_rowwise(qo, so, o.dtype)
        else:
            o = checkpoint_name(o, f"flash_out{tag}")
        l = checkpoint_name(l, f"flash_lse{tag}")
        m = checkpoint_name(m, f"flash_lse{tag}")
        qh = checkpoint_name(qh, f"flash_qkv{tag}")
        kh = checkpoint_name(kh, f"flash_qkv{tag}")
        vh = checkpoint_name(vh, f"flash_qkv{tag}")
        return o, (qh, kh, vh, o, l, m)

    def bwd(res, do):
        qh, kh, vh, o, l, m = res
        seg = seg_ids(qh)
        di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
        dk, dv = _flash_attention_bwd_dkv(
            qh, kh, vh, None, seg, l, m, do, di,
            block_q_major=blk_q, block_k_major=blk_k, block_k=blk_k,
            block_q=blk_q, sm_scale=sm_scale, causal=False,
            mask_value=DEFAULT_MASK_VALUE, debug=False,
        )
        dq, _ = _flash_attention_bwd_dq(
            qh, kh, vh, None, seg, l, m, do, di,
            block_q_major=blk_q, block_k_major=blk_k, block_k=blk_k,
            sm_scale=sm_scale, causal=False,
            mask_value=DEFAULT_MASK_VALUE, debug=False,
        )
        return dq, dk, dv

    f.defvjp(fwd, bwd)
    return f


def flash_mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    name_tag: str = "",
    stash8_out: bool = False,
    pre_padded: int = 0,
) -> jnp.ndarray:
    """[B, L, D] multihead flash attention via the Pallas TPU kernel.

    `pre_padded > 0`: the caller already padded the sequence to this length's
    _pad_plan (models/unet.py pads ONCE per spatial-transformer module — the
    per-call jnp.pad/slice pairs this skips were the aspect-ratio-bucket
    bottleneck: ~500 serialized 40 MB DMAs per step, async-copy wall 7.1 s/step
    vs 2.1 s of compute, bench_logs/r5_session.log ragged profile). Only the
    first `pre_padded` tokens are real; the kernel masks the rest via segment
    ids and the output KEEPS the padded length (caller slices at module exit).
    """
    b, lq, d = q.shape
    lk = k.shape[1]
    head_dim = d // heads
    sm_scale = 1.0 / (head_dim**0.5)

    def split(x, l):
        return x.reshape(b, l, heads, head_dim).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q, lq), split(k, lk), split(v, lk)

    # Sub-lane head dims run native: the kernel handles them via its sliced
    # l/m broadcast, numerics match einsum attention, and skipping the
    # explicit zero-pad removes 3 big pad ops per call. Measured end-to-end:
    # SDXL (d=64) 3.62->3.79 imgs/s, SD15 (d=40/80) 21.9->22.6, identical
    # losses. head_dim > 128 (SD15's 160) still pads to a lane multiple —
    # zero columns leave QK^T unchanged and add zero output columns we slice
    # away; sm_scale always uses the original dim.
    padded = head_dim if head_dim <= 128 else _round_up(head_dim, 128)
    if padded != head_dim:
        pad = [(0, 0), (0, 0), (0, 0), (0, padded - head_dim)]
        qh, kh, vh = jnp.pad(qh, pad), jnp.pad(kh, pad), jnp.pad(vh, pad)

    # Sequence padding for aspect-ratio bucket shapes (self-attention,
    # lq == lk): pad to a tile-able length and mask the pad tokens via
    # segment ids inside the kernel (_named_flash.seg_ids). <= 3.6% extra
    # FLOPs at SDXL bucket shapes vs an einsum fallback whose [B,h,L,L]
    # logits are GBs. The pad rows' outputs are sliced off below; their
    # zero cotangent keeps dk/dv exact.
    if pre_padded:
        lp, blk_q, blk_k = _pad_plan(pre_padded)
        assert lq == lk == lp, (lq, lk, lp, pre_padded)
        valid = pre_padded if pre_padded != lp else 0
    elif lq == lk:
        lp, blk_q, blk_k = _pad_plan(lq)
        valid = lq if lp != lq else 0
        if valid:
            spad = [(0, 0), (0, 0), (0, lp - lq), (0, 0)]
            qh, kh, vh = jnp.pad(qh, spad), jnp.pad(kh, spad), jnp.pad(vh, spad)
    else:
        # Measured on v5e at [8,10,4096,64] fwd+grad: block_k=1024 beats 512
        # by ~13% (fewer KV re-reads per q block); block_q stays 512 (2048
        # was a wash, 256 regressed). Both clamp to the sequence length.
        blk_q, blk_k, valid = min(512, lq), min(1024, lk), 0
    out = _named_flash(sm_scale, blk_q, blk_k, name_tag, stash8_out, valid)(qh, kh, vh)
    if valid and not pre_padded:
        out = out[:, :, :lq]
    if padded != head_dim:
        out = out[..., :head_dim]
    return out.transpose(0, 2, 1, 3).reshape(b, lq, heads * head_dim)
