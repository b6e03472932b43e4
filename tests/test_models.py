"""Shape/semantics tests for the model stack on tiny configs."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_lora_trainer_tpu.models.clip import (
    CLIPTextConfig,
    clip_text_forward,
    init_clip_params,
)
from sd_lora_trainer_tpu.models.unet import (
    TINY_SD15_UNET_CONFIG,
    TINY_SDXL_UNET_CONFIG,
    init_unet_params,
    unet_forward,
)
from sd_lora_trainer_tpu.models.vae import VAEConfig, init_vae_params, vae_decode, vae_encode, vae_sample

TINY_CLIP = CLIPTextConfig(
    vocab_size=100, hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
    max_position_embeddings=16, eos_token_id=99,
)
TINY_CLIP_PROJ = dataclasses.replace(TINY_CLIP, projection_dim=24, hidden_act="gelu")

TINY_VAE = VAEConfig(block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4)


def _ids(batch=2, length=16, eos=99):
    ids = np.full((batch, length), eos, np.int32)
    ids[:, 0] = 1  # bos-ish
    ids[0, 1:5] = [5, 6, 7, 8]
    ids[1, 1:3] = [9, 10]
    return jnp.asarray(ids)


def test_clip_output_shapes_and_pooling():
    params = init_clip_params(jax.random.PRNGKey(0), TINY_CLIP)
    out = clip_text_forward(params, _ids(), TINY_CLIP, dtype=jnp.float32)
    assert out["last"].shape == (2, 16, 32)
    assert out["penultimate"].shape == (2, 16, 32)
    assert out["pooled"].shape == (2, 32)
    # pooled = last[:, first_eos_position]: row 0 first EOS at 5, row 1 at 3
    np.testing.assert_allclose(np.asarray(out["pooled"][0]), np.asarray(out["last"][0, 5]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["pooled"][1]), np.asarray(out["last"][1, 3]), rtol=1e-6)


def test_clip_projection_head():
    params = init_clip_params(jax.random.PRNGKey(0), TINY_CLIP_PROJ)
    out = clip_text_forward(params, _ids(), TINY_CLIP_PROJ, dtype=jnp.float32)
    assert out["pooled"].shape == (2, 24)


def test_clip_causality():
    """Changing a later token must not change earlier positions' features."""
    params = init_clip_params(jax.random.PRNGKey(0), TINY_CLIP)
    ids1 = _ids()
    ids2 = ids1.at[0, 10].set(42)
    o1 = clip_text_forward(params, ids1, TINY_CLIP, dtype=jnp.float32)
    o2 = clip_text_forward(params, ids2, TINY_CLIP, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(o1["last"][0, :10]), np.asarray(o2["last"][0, :10]), atol=1e-5
    )
    assert not np.allclose(np.asarray(o1["last"][0, 10:]), np.asarray(o2["last"][0, 10:]))


def test_clip_ti_rows_extend_vocab():
    params = init_clip_params(jax.random.PRNGKey(0), TINY_CLIP)
    ti = jax.random.normal(jax.random.PRNGKey(1), (3, 32)) * 0.01
    ids = _ids().at[0, 2].set(100)  # first TI token id = vocab_size
    out = clip_text_forward(params, ids, TINY_CLIP, ti_embeddings=ti, dtype=jnp.float32)
    assert out["last"].shape == (2, 16, 32)
    # gradient flows into TI rows only through their usage
    def loss_fn(ti):
        o = clip_text_forward(params, ids, TINY_CLIP, ti_embeddings=ti, dtype=jnp.float32)
        return jnp.sum(o["last"] ** 2)
    g = jax.grad(loss_fn)(ti)
    assert np.abs(np.asarray(g[0])).sum() > 0  # used row gets gradient
    np.testing.assert_allclose(np.asarray(g[1]), 0.0, atol=1e-8)  # unused rows don't


def test_vae_roundtrip_shapes():
    params = init_vae_params(jax.random.PRNGKey(0), TINY_VAE)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    mean, logvar = vae_encode(params, imgs, TINY_VAE)
    # 2 blocks -> one downsample -> /2
    assert mean.shape == (2, 8, 8, 4) and logvar.shape == (2, 8, 8, 4)
    z = vae_sample(mean, logvar, jax.random.PRNGKey(2), TINY_VAE.scaling_factor)
    out = vae_decode(params, z, TINY_VAE)
    assert out.shape == (2, 16, 16, 3)


def test_vae_sample_statistics():
    mean = jnp.ones((1, 4, 4, 4)) * 2.0
    logvar = jnp.zeros((1, 4, 4, 4))  # std = 1
    keys = jax.random.split(jax.random.PRNGKey(0), 200)
    samples = jnp.stack([vae_sample(mean, logvar, k, 1.0) for k in keys[:50]])
    assert abs(float(samples.mean()) - 2.0) < 0.1


def test_unet_sd15_forward_shapes():
    cfg = TINY_SD15_UNET_CONFIG
    params = init_unet_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    lat = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    t = jnp.array([10, 500])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 16, cfg.cross_attention_dim))
    out, scores = unet_forward(params, lat, t, ctx, cfg, use_flash=False, remat=False)
    assert out.shape == (2, 16, 16, 4)
    assert scores == {}


def test_unet_sdxl_forward_with_added_cond_and_daam():
    cfg = TINY_SDXL_UNET_CONFIG
    params = init_unet_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    lat = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    t = jnp.array([10, 500])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 16, cfg.cross_attention_dim))
    added = {
        "text_embeds": jax.random.normal(jax.random.PRNGKey(3), (2, cfg.addition_pooled_dim)),
        "time_ids": jnp.tile(jnp.array([[1024, 1024, 0, 0, 1024, 1024]], jnp.float32), (2, 1)),
    }
    out, scores = unet_forward(
        params, lat, t, ctx, cfg, added_cond=added, capture_attn=True, use_flash=False, remat=False
    )
    assert out.shape == (2, 16, 16, 4)
    # level 1 (8x8) has 1 tblock per attention x 1 layer; level 2 (4x4) has 2
    assert len(scores) > 0
    for name, s in scores.items():
        assert s.shape[0] == 2 and s.shape[2] == 16, (name, s.shape)
        assert "attn2" in name and ("down_blocks" in name or "up_blocks" in name)


def test_unet_remat_matches_no_remat():
    cfg = TINY_SD15_UNET_CONFIG
    params = init_unet_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    t = jnp.array([42])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 16, cfg.cross_attention_dim))
    o1, _ = unet_forward(params, lat, t, ctx, cfg, use_flash=False, remat=False)
    o2, _ = unet_forward(params, lat, t, ctx, cfg, use_flash=False, remat=True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def test_unet_timestep_sensitivity():
    cfg = TINY_SD15_UNET_CONFIG
    params = init_unet_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    lat = jnp.ones((1, 8, 8, 4))
    ctx = jnp.ones((1, 16, cfg.cross_attention_dim))
    o1, _ = unet_forward(params, lat, jnp.array([1]), ctx, cfg, use_flash=False, remat=False)
    o2, _ = unet_forward(params, lat, jnp.array([900]), ctx, cfg, use_flash=False, remat=False)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
