"""Structural sanity: full-size parameter counts must match the known
SD1.5 / SDXL architectures (strong guard against topology mistakes —
computed via eval_shape, nothing materialized)."""

import jax
import jax.numpy as jnp

from sd_lora_trainer_tpu.models.clip import (
    CLIP_BIG_G_CONFIG,
    CLIP_L_CONFIG,
    init_clip_params,
)
from sd_lora_trainer_tpu.models.unet import (
    SD15_UNET_CONFIG,
    SDXL_UNET_CONFIG,
    init_unet_params,
)
from sd_lora_trainer_tpu.models.vae import SD15_VAE_CONFIG, init_vae_params


def _count(init_fn):
    shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    return sum(x.size for x in jax.tree_util.tree_leaves(shapes))


def test_sdxl_unet_param_count():
    n = _count(lambda k: init_unet_params(k, SDXL_UNET_CONFIG, dtype=jnp.bfloat16))
    assert n == 2_567_463_684, n  # exact: SDXL UNet


def test_sd15_unet_param_count():
    n = _count(lambda k: init_unet_params(k, SD15_UNET_CONFIG, dtype=jnp.bfloat16))
    assert n == 859_520_964, n  # exact: SD1.5 UNet


def test_clip_l_param_count():
    n = _count(lambda k: init_clip_params(k, CLIP_L_CONFIG))
    assert n == 123_060_480, n  # exact: CLIP ViT-L/14 text tower


def test_clip_bigg_param_count():
    n = _count(lambda k: init_clip_params(k, CLIP_BIG_G_CONFIG))
    assert n == 694_659_840, n  # exact: OpenCLIP bigG text tower + projection


def test_vae_param_count():
    n = _count(lambda k: init_vae_params(k, SD15_VAE_CONFIG))
    assert n == 83_653_863, n  # exact: AutoencoderKL
