"""Training losses and regularizers.

Ports the semantics of reference trainer/loss.py and
trainer/ti_cross_attn_loss.py to pure, jit-friendly JAX:

- `diffusion_loss` — masked MSE on the noise prediction with Min-SNR-gamma
  weighting (arXiv:2303.09556) and mask-mean renormalization
  (reference: trainer/loss.py:127-168).
- `prompt_norm_regularization` / `DistributionLossTargets` — prompt-embedding
  norm target + token covariance/std losses vs the pretrained embedding
  distribution (reference: trainer/loss.py:172-297).
- `token_attention_loss` — DAAM cross-attention regularization computed from
  attention-score aux outputs of the UNet (reference: trainer/loss.py:10-80 and
  trainer/ti_cross_attn_loss.py:201-212). Unlike the reference, the scores are
  first-class auxiliary outputs of our attention layers, not a monkey-patched
  processor.

All tensors are NHWC. Everything here is shape-static and traceable.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from sd_lora_trainer_tpu.diffusion.schedulers import DDPMSchedule


def diffusion_loss(
    model_pred: jnp.ndarray,  # [B,H,W,C]
    noise: jnp.ndarray,  # [B,H,W,C]
    noisy_latent: jnp.ndarray,  # [B,H,W,C]
    latent: jnp.ndarray,  # [B,H,W,C] (x_0; needed for the v-pred target)
    mask: jnp.ndarray,  # [B,H,W,1] in [0,1]
    schedule: DDPMSchedule,
    timesteps: jnp.ndarray,  # [B] int32
    snr_gamma: float,
) -> jnp.ndarray:
    """Masked Min-SNR-weighted MSE (reference: trainer/loss.py:127-168)."""
    if schedule.prediction_type == "epsilon":
        target = noise
    elif schedule.prediction_type == "v_prediction":
        target = schedule.get_velocity(latent, noise, timesteps)
    else:
        raise ValueError(f"Unknown prediction type {schedule.prediction_type}")

    sq_err = (model_pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    sq_err = sq_err * mask.astype(jnp.float32)

    per_sample = jnp.mean(sq_err, axis=tuple(range(1, sq_err.ndim)))  # [B]

    if snr_gamma is None or snr_gamma == 0.0:
        weighted = per_sample
    else:
        snr = schedule.compute_snr(timesteps)  # [B]
        base_weight = jnp.minimum(snr, snr_gamma) / snr
        if schedule.prediction_type == "v_prediction":
            # Velocity objective is floored to an SNR weight of one.
            mse_loss_weights = base_weight + 1.0
        else:
            mse_loss_weights = base_weight
        mse_loss_weights = mse_loss_weights / jnp.mean(mse_loss_weights)
        weighted = per_sample * mse_loss_weights

    # Renormalize by the per-sample mask mean so sparsely-masked samples are
    # not systematically down-weighted (reference: trainer/loss.py:164-168).
    mean_mask = jnp.mean(mask.astype(jnp.float32), axis=tuple(range(1, mask.ndim)))  # [B]
    mean_mask = mean_mask / jnp.mean(mean_mask)
    weighted = weighted / mean_mask

    return jnp.mean(weighted)


def lora_l1_penalty(lora_params) -> jnp.ndarray:
    """Normalized L1 of all LoRA matrices: sum|p| / numel (main.py:353-356)."""
    leaves = jax.tree_util.tree_leaves(lora_params)
    if not leaves:
        return jnp.asarray(0.0, jnp.float32)
    abs_sum = sum(jnp.sum(jnp.abs(p.astype(jnp.float32))) for p in leaves)
    numel = sum(p.size for p in leaves)
    return abs_sum / numel


# ---------------------------------------------------------------------------
# Conditioning / token-distribution regularizers
# ---------------------------------------------------------------------------

# Empirical prompt-embedding norm targets (reference: trainer/loss.py:182).
TARGET_PROMPT_NORM = {"sdxl": 34.5, "sd15": 27.8}


def prompt_norm_regularization(
    prompt_embeds: jnp.ndarray,  # [B, 77, D]
    target_norm: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pull the mean per-token conditioning norm toward the pretrained target
    (reference: trainer/loss.py:240-245). Returns (loss, observed_norm)."""
    cond_norms = jnp.linalg.norm(prompt_embeds.astype(jnp.float32), axis=-1).mean(axis=0)
    observed = cond_norms[2:].mean()
    return (observed - target_norm) ** 2, observed


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DistributionLossTargets:
    """Precomputed statistics of a pretrained token-embedding table
    (reference: trainer/loss.py:254-297 `DistributionLoss`).

    `target_cov` is the full [D,D] covariance — cheap to keep on device for
    D<=1280 and turns the covariance loss into one MXU matmul.
    """

    target_cov: jnp.ndarray  # [D, D] float32
    target_stds_mean: jnp.ndarray  # scalar
    target_stds_var: jnp.ndarray  # scalar: std(stds)^2 / mean(stds)

    @classmethod
    def from_embeddings(cls, table: jnp.ndarray) -> "DistributionLossTargets":
        table = table.astype(jnp.float32)
        target_stds = table.std(axis=-1)
        return cls(
            target_cov=_covariance(table),
            target_stds_mean=target_stds.mean(),
            target_stds_var=target_stds.std() ** 2 / target_stds.mean(),
        )

    def covariance_loss(self, new_embeddings: jnp.ndarray) -> jnp.ndarray:
        """Frobenius distance of covariances / D^2 (loss.py:283-290)."""
        cov_new = _covariance(new_embeddings.astype(jnp.float32))
        d = new_embeddings.shape[-1]
        return jnp.linalg.norm(self.target_cov - cov_new) / (d * d)

    def std_loss(self, new_embeddings: jnp.ndarray) -> jnp.ndarray:
        """Pull per-row std toward the pretrained mean std (loss.py:292-297)."""
        stds = new_embeddings.astype(jnp.float32).std(axis=-1)
        return jnp.mean((self.target_stds_mean - stds) ** 2 / self.target_stds_var)


def _covariance(x: jnp.ndarray) -> jnp.ndarray:
    mean = x.mean(axis=0)
    xc = x - mean
    return (xc.T @ xc) / (x.shape[0] - 1)


# ---------------------------------------------------------------------------
# DAAM token-attention regularization
# ---------------------------------------------------------------------------


def stack_attention_maps(
    attn_scores: Dict[str, jnp.ndarray],  # name -> [B, q_len, 77]
    img_ratio: float,
) -> jnp.ndarray:
    """Reshape per-layer cross-attention scores to spatial heatmaps at the
    smallest common resolution and stack them: [n_layers, B, h, w, 77]
    (reference: ti_cross_attn_loss.py:239-268).

    `img_ratio` = width / height of the training image; q_len = h*w per layer.
    Shapes are static per layer, so this traces to a fixed graph.
    """
    reshaped = []
    min_pixels, min_shape = None, None
    for name in sorted(attn_scores.keys()):
        score = attn_scores[name]
        b, q_len, n_text = score.shape
        width = round(math.sqrt(q_len * img_ratio))
        height = round(width / img_ratio)
        assert height * width == q_len, (
            f"attention map {name}: q_len={q_len} does not factor as "
            f"{height}x{width} for img_ratio={img_ratio}"
        )
        reshaped.append(score.reshape(b, height, width, n_text))
        if min_pixels is None or height * width < min_pixels:
            min_pixels, min_shape = height * width, (height, width)

    resized = []
    for heatmap in reshaped:
        if heatmap.shape[1] * heatmap.shape[2] != min_pixels:
            heatmap = jax.image.resize(
                heatmap,
                (heatmap.shape[0], min_shape[0], min_shape[1], heatmap.shape[3]),
                method="bicubic",
            )
        resized.append(heatmap)
    return jnp.stack(resized, axis=0)


def _resized_spatial_mean_weights(
    height: int, width: int, min_shape: Tuple[int, int]
) -> jnp.ndarray:
    """Per-pixel weights w s.t. <w, x.ravel()> == mean over pixels of
    bicubic_resize(x, min_shape) — the spatial mean of a resized map is a
    fixed linear functional of the raw map (resize is linear), so it can be
    computed WITHOUT materializing the resized [B,h,w,77] tensors. Obtained by
    transposing the resize against the uniform-mean covector."""
    p = min_shape[0] * min_shape[1]
    if (height, width) == min_shape:
        return jnp.full((height * width,), 1.0 / p, jnp.float32)

    def resize_flat(x):
        return jax.image.resize(x.reshape(height, width), min_shape, method="bicubic").ravel()

    (wvec,) = jax.linear_transpose(
        resize_flat, jax.ShapeDtypeStruct((height * width,), jnp.float32)
    )(jnp.full((p,), 1.0 / p, jnp.float32))
    return wvec


def token_attention_loss(
    attn_scores: Dict[str, jnp.ndarray],  # name -> [B, q_len, 77] fp32 scores
    mask: jnp.ndarray,  # [B, H, W, 1] latent-res mask
    img_ratio: float,
    caption_token_lengths: jnp.ndarray,  # [B] int: len(tokenizer.encode(caption))
    ti_token_positions: jnp.ndarray,  # [B, n_ti] int: position of each TI token, -1 if absent
) -> jnp.ndarray:
    """DAAM cross-attention regularizer (reference: trainer/loss.py:10-80).

    Four weighted terms: (0) mean attention of all caption tokens, (1) TI-token
    attention inside the mask, (2) TI-token attention outside the mask (with a
    +10 offset), (3) variance of mean attention across TI tokens.

    Host-side caption analysis (token lengths, TI positions) is passed in as
    arrays so the whole thing traces under jit; samples whose captions lost the
    TI tokens are masked out (the reference `continue`s over them).

    Memory note: mathematically equal to stacking all resized per-layer maps
    ([L,B,h,w,77], the reference's DAAMLoss layout) and reducing — but that
    stack's transpose picks catastrophic padded layouts on TPU (128x HBM
    expansion seen at bs=8 1024px). Instead: term 0's spatial means are fixed
    linear functionals of the raw scores (see _resized_spatial_mean_weights),
    and the TI gather (3 tokens) commutes exactly with the spatial resize, so
    only [B,h,w,n_ti] ever materializes.
    """
    names = sorted(attn_scores.keys())
    first = attn_scores[names[0]]
    batch, _, n_text = first.shape
    n_layers = len(names)
    n_ti = ti_token_positions.shape[1]
    valid = jnp.all(ti_token_positions >= 0, axis=1)  # [B]
    safe_pos = jnp.clip(ti_token_positions, 0, n_text - 1)  # [B, n_ti]

    shapes = []
    for name in names:
        _, q_len, _ = attn_scores[name].shape
        width = round(math.sqrt(q_len * img_ratio))
        height = round(width / img_ratio)
        assert height * width == q_len, (
            f"attention map {name}: q_len={q_len} does not factor as "
            f"{height}x{width} for img_ratio={img_ratio}"
        )
        shapes.append((height, width))
    min_shape = min(shapes, key=lambda s: s[0] * s[1])
    h, w = min_shape

    mean_acc = jnp.zeros((batch, n_text), jnp.float32)
    ti_acc = jnp.zeros((batch, h, w, n_ti), jnp.float32)
    for name, (hl, wl) in zip(names, shapes):
        score = attn_scores[name]  # [B, q, T]
        wvec = _resized_spatial_mean_weights(hl, wl, min_shape)
        mean_acc = mean_acc + jnp.einsum("bqt,q->bt", score, wvec)
        g = jnp.take_along_axis(score, safe_pos[:, None, :], axis=2)  # [B,q,n_ti]
        g = g.reshape(batch, hl, wl, n_ti)
        if (hl, wl) != min_shape:
            g = jax.image.resize(g, (batch, h, w, n_ti), method="bicubic")
        ti_acc = ti_acc + g

    # Resize mask to heatmap resolution: [B, h, w]
    mask2 = jax.image.resize(mask.astype(jnp.float32), (batch, h, w, 1), method="nearest")
    mask2 = mask2[..., 0]

    # --- term 0: penalize mean attention of content tokens (positions
    # 1..len-2, i.e. between BOS and EOS) ---
    pos = jnp.arange(n_text)[None, :]  # [1, T]
    content = (pos >= 1) & (pos < (caption_token_lengths[:, None] - 1))  # [B, T]
    mean_att_per_token = mean_acc / n_layers  # [B, T] (mean over layers+space)
    relu_sq = jax.nn.relu(mean_att_per_token) ** 2
    # per-sample mean over that sample's content tokens
    denom = jnp.maximum(content.sum(axis=1), 1)
    att_l2_per_sample = (relu_sq * content).sum(axis=1) / denom  # [B]

    # --- TI-token heatmaps: mean over layers ---
    ti_heatmaps = ti_acc / n_layers  # [B, h, w, n_ti]
    ti_heatmaps = jnp.moveaxis(ti_heatmaps, -1, 1)  # [B, n_ti, h, w]
    ti_masks = jnp.broadcast_to(mask2[:, None, :, :], ti_heatmaps.shape)

    valid_f = valid.astype(jnp.float32)
    n_valid = jnp.maximum(valid_f.sum(), 1.0)
    vmask = valid_f[:, None, None, None]

    token_means = ti_heatmaps.mean(axis=(2, 3))  # [B, n_ti]
    token_att_var = jnp.var(token_means, axis=1, ddof=1)  # [B] (unbiased, as torch)

    reg_loss_0 = 5.0 * att_l2_per_sample.mean()
    reg_loss_1 = 1.0 * jnp.sum(
        (jax.nn.relu(ti_heatmaps * ti_masks) ** 2) * vmask
    ) / (n_valid * n_ti * h * w)
    reg_loss_2 = 2.0 * jnp.sum(
        (jax.nn.relu(ti_heatmaps * (1.0 - ti_masks) + 10.0) ** 2) * vmask
    ) / (n_valid * n_ti * h * w)
    reg_loss_3 = 1.0 * jnp.sum(token_att_var * valid_f) / n_valid

    total = reg_loss_0 + reg_loss_1 + reg_loss_2 + reg_loss_3
    # If no sample retained its TI tokens, the reference returns 0.0.
    return jnp.where(valid.any(), total, 0.0)
