"""Numeric tests for losses against independently-computed golden values
(reference semantics: trainer/loss.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from sd_lora_trainer_tpu.diffusion.losses import (
    DistributionLossTargets,
    diffusion_loss,
    lora_l1_penalty,
    prompt_norm_regularization,
    token_attention_loss,
)
from sd_lora_trainer_tpu.diffusion.schedulers import DDPMSchedule


def _setup(B=2, H=4, W=4, C=4, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4)
    pred = jax.random.normal(ks[0], (B, H, W, C))
    noise = jax.random.normal(ks[1], (B, H, W, C))
    latent = jax.random.normal(ks[2], (B, H, W, C))
    mask = (jax.random.uniform(ks[3], (B, H, W, 1)) > 0.3).astype(jnp.float32)
    t = jnp.array([100, 700])
    sched = DDPMSchedule.create()
    return pred, noise, latent, mask, t, sched


def test_diffusion_loss_no_snr_matches_manual():
    pred, noise, latent, mask, t, sched = _setup()
    noisy = sched.add_noise(latent, noise, t)
    loss = diffusion_loss(pred, noise, noisy, latent, mask, sched, t, snr_gamma=0.0)

    p, n, m = np.asarray(pred), np.asarray(noise), np.asarray(mask)
    per = ((p - n) ** 2 * m).mean(axis=(1, 2, 3))
    mm = m.mean(axis=(1, 2, 3))
    expected = (per / (mm / mm.mean())).mean()
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


def test_diffusion_loss_min_snr_weighting():
    pred, noise, latent, mask, t, sched = _setup()
    noisy = sched.add_noise(latent, noise, t)
    loss = diffusion_loss(pred, noise, noisy, latent, mask, sched, t, snr_gamma=5.0)

    p, n, m = np.asarray(pred), np.asarray(noise), np.asarray(mask)
    ac = np.asarray(sched.alphas_cumprod)[np.asarray(t)]
    snr = ac / (1 - ac)
    w = np.minimum(snr, 5.0) / snr
    w = w / w.mean()
    per = ((p - n) ** 2 * m).mean(axis=(1, 2, 3)) * w
    mm = m.mean(axis=(1, 2, 3))
    expected = (per / (mm / mm.mean())).mean()
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


def test_l1_penalty_is_mean_abs():
    params = {"a": jnp.array([1.0, -2.0]), "b": jnp.array([[3.0, -4.0]])}
    assert float(lora_l1_penalty(params)) == (1 + 2 + 3 + 4) / 4
    assert float(lora_l1_penalty({})) == 0.0


def test_prompt_norm_regularization():
    embeds = jnp.ones((2, 77, 16)) * 2.0  # per-token norm = 8
    loss, observed = prompt_norm_regularization(embeds, target_norm=10.0)
    np.testing.assert_allclose(float(observed), 8.0, rtol=1e-6)
    np.testing.assert_allclose(float(loss), 4.0, rtol=1e-6)


def test_distribution_loss_zero_for_matching_distribution():
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (100, 32)) * 0.014
    targets = DistributionLossTargets.from_embeddings(table)
    # same embeddings -> covariance loss == 0
    np.testing.assert_allclose(float(targets.covariance_loss(table)), 0.0, atol=1e-7)
    # rows with the target mean std -> std loss near 0
    assert float(targets.std_loss(table)) < 2.0  # rows vary; bounded


def test_distribution_loss_penalizes_scale_drift():
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (100, 32)) * 0.014
    targets = DistributionLossTargets.from_embeddings(table)
    drifted = table * 10.0
    assert float(targets.covariance_loss(drifted)) > float(targets.covariance_loss(table))
    assert float(targets.std_loss(drifted)) > float(targets.std_loss(table))


def test_token_attention_loss_shapes_and_invalid_handling():
    B, T = 2, 77
    # two layers at 8x8 and 4x4
    key = jax.random.PRNGKey(1)
    scores = {
        "down.0.attn2": jax.random.normal(key, (B, 64, T)) * 0.1,
        "up.1.attn2": jax.random.normal(jax.random.fold_in(key, 1), (B, 16, T)) * 0.1,
    }
    mask = jnp.ones((B, 16, 16, 1))
    lengths = jnp.array([10, 12])
    ti_pos = jnp.array([[1, 2, 3], [2, 3, 4]])
    loss = token_attention_loss(scores, mask, 1.0, lengths, ti_pos)
    assert np.isfinite(float(loss))
    assert float(loss) > 0  # reg_loss_2's +10 offset guarantees positivity

    # all-invalid TI positions -> loss falls back to 0
    ti_bad = jnp.full((B, 3), -1)
    loss0 = token_attention_loss(scores, mask, 1.0, lengths, ti_bad)
    np.testing.assert_allclose(float(loss0), 0.0)


def test_token_attention_loss_masked_region_direction():
    """TI attention inside the mask is penalized ~1x, outside ~2x (with +10
    offset) — pushing scores down outside the mask reduces the loss."""
    B, T = 1, 77
    base = jnp.zeros((B, 64, T))
    scores_hi_out = {"l": base.at[:, :, 1:4].set(5.0)}
    mask = jnp.zeros((1, 8, 8, 1))  # empty mask: all attention is "outside"
    lengths = jnp.array([6])
    ti_pos = jnp.array([[1, 2, 3]])
    loss_out = token_attention_loss(scores_hi_out, mask, 1.0, lengths, ti_pos)
    mask_full = jnp.ones((1, 8, 8, 1))  # full mask: all attention "inside"
    loss_in = token_attention_loss(scores_hi_out, mask_full, 1.0, lengths, ti_pos)
    assert float(loss_out) > float(loss_in)


def test_token_attention_loss_matches_stacked_reference():
    """The streaming implementation (linear-functional spatial means + gather-
    before-resize) must equal the direct stacked formulation: build
    [L,B,h,w,T] with stack_attention_maps and reduce it the reference way."""
    from sd_lora_trainer_tpu.diffusion.losses import stack_attention_maps

    B, T, n_ti = 2, 77, 3
    key = jax.random.PRNGKey(7)
    scores = {
        "down.0.attn2": jax.random.normal(key, (B, 256, T)) * 0.2,        # 16x16
        "mid.attn2": jax.random.normal(jax.random.fold_in(key, 1), (B, 64, T)) * 0.2,  # 8x8
        "up.1.attn2": jax.random.normal(jax.random.fold_in(key, 2), (B, 256, T)) * 0.2,
    }
    mask = (jax.random.uniform(jax.random.fold_in(key, 3), (B, 32, 32, 1)) > 0.5).astype(
        jnp.float32
    )
    lengths = jnp.array([9, 14])
    ti_pos = jnp.array([[1, 2, 3], [4, 5, 6]])

    got = float(token_attention_loss(scores, mask, 1.0, lengths, ti_pos))

    # --- direct stacked reference computation ---
    maps = stack_attention_maps(scores, 1.0)  # [L,B,h,w,T]
    L, _, h, w, _ = maps.shape
    mask2 = jax.image.resize(mask, (B, h, w, 1), method="nearest")[..., 0]
    pos = jnp.arange(T)[None, :]
    content = (pos >= 1) & (pos < (lengths[:, None] - 1))
    mean_att = maps.mean(axis=(0, 2, 3))
    relu_sq = jax.nn.relu(mean_att) ** 2
    att_l2 = (relu_sq * content).sum(axis=1) / jnp.maximum(content.sum(axis=1), 1)
    per_layer = jnp.take_along_axis(maps, ti_pos[None, :, None, None, :], axis=4)
    ti_heatmaps = jnp.moveaxis(per_layer.mean(axis=0), -1, 1)  # [B,n_ti,h,w]
    ti_masks = jnp.broadcast_to(mask2[:, None], ti_heatmaps.shape)
    token_means = ti_heatmaps.mean(axis=(2, 3))
    var = jnp.var(token_means, axis=1, ddof=1)
    want = float(
        5.0 * att_l2.mean()
        + jnp.sum(jax.nn.relu(ti_heatmaps * ti_masks) ** 2) / (B * n_ti * h * w)
        + 2.0 * jnp.sum(jax.nn.relu(ti_heatmaps * (1 - ti_masks) + 10.0) ** 2) / (B * n_ti * h * w)
        + var.mean()
    )
    np.testing.assert_allclose(got, want, rtol=2e-5)
