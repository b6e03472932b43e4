"""Weight conversion tests: LDM-layout round-trips and golden parity of the
CLIP encoder against transformers' reference implementation (torch CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_lora_trainer_tpu.models.clip import clip_text_forward, init_clip_params
from sd_lora_trainer_tpu.models.synthesize import (
    TINY_CLIP_G_CONFIG,
    TINY_CLIP_L_CONFIG,
    TINY_VAE_CONFIG,
    export_hf_clip,
    synthesize_checkpoint,
)
from sd_lora_trainer_tpu.models.unet import (
    TINY_SD15_UNET_CONFIG,
    TINY_SDXL_UNET_CONFIG,
    init_unet_params,
    unet_forward,
)
from sd_lora_trainer_tpu.models.vae import vae_encode
from sd_lora_trainer_tpu.models.weights import detect_version, load_models_from_checkpoint


def _tree_allclose(a, b, atol=1e-6):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb, f"tree structure mismatch:\n{ta}\nvs\n{tb}"
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x, np.float32), np.asarray(y, np.float32), atol=atol)


@pytest.fixture(scope="module")
def sd15_ckpt(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ckpt") / "tiny_sd15.safetensors")
    synthesize_checkpoint(
        path, "sd15", TINY_SD15_UNET_CONFIG, TINY_VAE_CONFIG, TINY_CLIP_L_CONFIG, seed=0
    )
    return path


@pytest.fixture(scope="module")
def sdxl_ckpt(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ckpt") / "tiny_sdxl.safetensors")
    synthesize_checkpoint(
        path, "sdxl", TINY_SDXL_UNET_CONFIG, TINY_VAE_CONFIG, TINY_CLIP_L_CONFIG,
        TINY_CLIP_G_CONFIG, seed=0,
    )
    return path


def test_version_detection(sd15_ckpt, sdxl_ckpt):
    from sd_lora_trainer_tpu.models.weights import load_checkpoint_file

    assert detect_version(load_checkpoint_file(sd15_ckpt).keys()) == "sd15"
    assert detect_version(load_checkpoint_file(sdxl_ckpt).keys()) == "sdxl"


def test_sd15_roundtrip_exact(sd15_ckpt):
    """synthesize -> convert must reproduce the init pytrees bit-exactly."""
    loaded = load_models_from_checkpoint(
        sd15_ckpt, dtype=jnp.float32,
        unet_config=TINY_SD15_UNET_CONFIG, vae_config=TINY_VAE_CONFIG,
        clip_l_config=TINY_CLIP_L_CONFIG,
    )
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    _tree_allclose(loaded.unet, init_unet_params(ks[0], TINY_SD15_UNET_CONFIG, jnp.float32))
    from sd_lora_trainer_tpu.models.vae import init_vae_params

    _tree_allclose(loaded.vae, init_vae_params(ks[1], TINY_VAE_CONFIG, jnp.float32))
    _tree_allclose(loaded.text_encoder, init_clip_params(ks[2], TINY_CLIP_L_CONFIG, jnp.float32))
    assert loaded.text_encoder_2 is None


def test_sdxl_roundtrip_and_forward(sdxl_ckpt):
    loaded = load_models_from_checkpoint(
        sdxl_ckpt, dtype=jnp.float32,
        unet_config=TINY_SDXL_UNET_CONFIG, vae_config=TINY_VAE_CONFIG,
        clip_l_config=TINY_CLIP_L_CONFIG, clip_g_config=TINY_CLIP_G_CONFIG,
    )
    assert loaded.version == "sdxl"
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    _tree_allclose(loaded.unet, init_unet_params(ks[0], TINY_SDXL_UNET_CONFIG, jnp.float32))
    _tree_allclose(loaded.text_encoder_2, init_clip_params(ks[3], TINY_CLIP_G_CONFIG, jnp.float32))

    # forward through every converted model
    ids = jnp.full((1, 77), 3, jnp.int32).at[0, 0].set(1).at[0, 76].set(255)
    te1 = clip_text_forward(loaded.text_encoder, ids, TINY_CLIP_L_CONFIG, dtype=jnp.float32)
    te2 = clip_text_forward(loaded.text_encoder_2, ids, TINY_CLIP_G_CONFIG, dtype=jnp.float32)
    ctx = jnp.concatenate([te1["penultimate"], te2["penultimate"]], axis=-1)
    assert ctx.shape == (1, 77, 64)
    lat = jax.random.normal(jax.random.PRNGKey(5), (1, 16, 16, 4))
    added = {
        "text_embeds": te2["pooled"],
        "time_ids": jnp.array([[1024, 1024, 0, 0, 1024, 1024]], jnp.float32),
    }
    out, _ = unet_forward(
        loaded.unet, lat, jnp.array([7]), ctx, TINY_SDXL_UNET_CONFIG,
        added_cond=added, use_flash=False, remat=False,
    )
    assert out.shape == (1, 16, 16, 4)
    imgs = jax.random.normal(jax.random.PRNGKey(6), (1, 16, 16, 3))
    mean, logvar = vae_encode(loaded.vae, imgs, TINY_VAE_CONFIG)
    assert mean.shape == (1, 8, 8, 4)


def test_clip_parity_vs_transformers():
    """Golden parity: our CLIP forward == transformers.CLIPTextModel on the
    same random weights (validates transposes, LN, activation, causal mask,
    penultimate hidden state, and EOS pooling)."""
    torch = pytest.importorskip("torch")
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel

    cfg = TINY_CLIP_L_CONFIG
    params = init_clip_params(jax.random.PRNGKey(7), cfg, dtype=jnp.float32)
    sd = export_hf_clip(params, cfg)

    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="quick_gelu",
        eos_token_id=cfg.eos_token_id,
        bos_token_id=254,
    )
    model = CLIPTextModel(hf_cfg).eval()
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}, strict=False
    )
    assert not unexpected, unexpected
    assert all("position_ids" in m for m in missing), missing

    ids = np.full((2, 77), 3, np.int64)
    ids[:, 0] = 254
    ids[0, 1:5] = [10, 11, 12, 13]
    ids[0, 5:] = cfg.eos_token_id
    ids[1, 1:3] = [20, 21]
    ids[1, 3:] = cfg.eos_token_id

    with torch.no_grad():
        hf_out = model(torch.from_numpy(ids), output_hidden_states=True)
    ours = clip_text_forward(params, jnp.asarray(ids, jnp.int32), cfg, dtype=jnp.float32)

    np.testing.assert_allclose(
        np.asarray(ours["last"]), hf_out.last_hidden_state.numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours["penultimate"]), hf_out.hidden_states[-2].numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours["pooled"]), hf_out.pooler_output.numpy(), atol=2e-5
    )
