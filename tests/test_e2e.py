"""End-to-end smoke test: the full vertical slice on tiny synthetic models.

config JSON -> preprocess -> latent caching -> jitted LoRA+TI training ->
kohya/TI/special_params export -> Euler validation rendering -> grid. This is
the TPU analogue of the reference's cog_test_train.sh de-facto integration
test (SURVEY.md §4), runnable offline on the CPU mesh.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow

from sd_lora_trainer_tpu.config import TrainingConfig
from sd_lora_trainer_tpu.models.synthesize import (
    TINY_CLIP_G_CONFIG,
    TINY_CLIP_L_CONFIG,
    TINY_VAE_CONFIG,
    synthesize_checkpoint,
)
from sd_lora_trainer_tpu.models.unet import TINY_SDXL_UNET_CONFIG


@pytest.fixture(scope="module")
def tiny_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    ckpt = str(root / "tiny_sdxl.safetensors")
    synthesize_checkpoint(
        ckpt, "sdxl", TINY_SDXL_UNET_CONFIG, TINY_VAE_CONFIG, TINY_CLIP_L_CONFIG,
        TINY_CLIP_G_CONFIG, seed=0,
    )
    data_dir = root / "dataset"
    data_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(4):
        img = Image.fromarray(rng.randint(0, 255, (96, 96, 3), np.uint8))
        img.save(data_dir / f"img_{i}.jpg")
        (data_dir / f"img_{i}.txt").write_text(f"a colorful test pattern number {i}")
    return {"ckpt": ckpt, "data": str(data_dir), "root": root}


@pytest.fixture(scope="module")
def train_run(tiny_env):
    out_root = str(tiny_env["root"] / "runs")
    config = TrainingConfig(
        name="tinytest",
        lora_training_urls=tiny_env["data"],
        concept_mode="style",
        caption_model="no_caption",
        sd_model_version="sdxl",
        ckpt_path=tiny_env["ckpt"],
        seed=0,
        resolution=64,
        validation_img_size=64,
        train_batch_size=2,
        max_train_steps=4,
        checkpointing_steps=100,
        n_sample_imgs=2,
        lora_rank=4,
        skip_gpt_cleanup=True,
        augment_imgs_up_to_n=0,
        output_dir=out_root,
    )
    from sd_lora_trainer_tpu.main import train

    gen = train(config)
    progress = []
    while True:
        try:
            progress.append(next(gen))
        except StopIteration as stop:
            result = stop.value
            break
    config, save_dir = result
    return {"config": config, "save_dir": save_dir, "progress": progress}


def test_progress_and_completion(train_run):
    assert len(train_run["progress"]) >= 1
    assert all(0 < p <= 1.0 for p in train_run["progress"])


def test_artifact_set(train_run):
    save_dir = train_run["save_dir"]
    files = os.listdir(save_dir)
    assert "special_params.json" in files
    assert "training_args.json" in files
    assert any(f.endswith("_lora.safetensors") for f in files), files
    assert any(f.endswith("_embeddings.safetensors") for f in files), files
    # validation renders + grid
    assert any(f.startswith("img_") and f.endswith(".jpg") for f in files), files
    assert "validation_grid.jpg" in files

    token_map = json.load(open(os.path.join(save_dir, "special_params.json")))
    assert token_map == {"TOK": "<s0><s1><s2>"}

    args = json.load(open(os.path.join(save_dir, "training_args.json")))
    assert args["training_attributes"]["n_training_imgs"] == 4
    assert "trigger_text" in args["training_attributes"]


def test_kohya_file_contract(train_run):
    from sd_lora_trainer_tpu.utils.safetensors_io import load_safetensors

    save_dir = train_run["save_dir"]
    lora_file = next(f for f in os.listdir(save_dir) if f.endswith("_lora.safetensors"))
    assert lora_file == "tinytest_sdxl_lora.safetensors"
    sd = load_safetensors(os.path.join(save_dir, lora_file))
    assert all(k.startswith("lora_unet_") for k in sd)
    downs = [k for k in sd if k.endswith(".lora_down.weight")]
    ups = [k for k in sd if k.endswith(".lora_up.weight")]
    alphas = [k for k in sd if k.endswith(".alpha")]
    assert len(downs) == len(ups) == len(alphas) > 0
    for k in alphas:
        assert float(np.asarray(sd[k]).reshape(-1)[0]) == 4.0  # rank
        assert np.asarray(sd[k]).ndim == 0  # kohya alpha is a 0-d tensor

    emb_file = next(f for f in os.listdir(save_dir) if f.endswith("_embeddings.safetensors"))
    emb = load_safetensors(os.path.join(save_dir, emb_file))
    assert set(emb.keys()) == {"clip_l", "clip_g"}
    assert emb["clip_l"].shape == (3, TINY_CLIP_L_CONFIG.hidden_size)
    assert emb["clip_g"].shape == (3, TINY_CLIP_G_CONFIG.hidden_size)


def test_load_checkpoint_roundtrip(train_run, tiny_env):
    import jax.numpy as jnp

    from sd_lora_trainer_tpu.checkpoint import load_checkpoint
    from sd_lora_trainer_tpu.models.weights import load_models_from_checkpoint

    loaded = load_models_from_checkpoint(tiny_env["ckpt"], dtype=jnp.float32)
    result = load_checkpoint(
        train_run["save_dir"], loaded.unet, [loaded.text_encoder, loaded.text_encoder_2]
    )
    assert result["unet_lora"] is not None
    assert result["token_dict"] == {"TOK": "<s0><s1><s2>"}
    assert result["ti_rows"][0] is not None and result["ti_rows"][1] is not None
    # merged render path usable
    from sd_lora_trainer_tpu.models.lora import merge_lora

    merged = merge_lora(loaded.unet, result["unet_lora"], scale=0.8)
    assert merged is not loaded.unet


def test_rendered_images_valid(train_run):
    save_dir = train_run["save_dir"]
    imgs = [f for f in os.listdir(save_dir) if f.startswith("img_")]
    assert len(imgs) == 2
    for f in imgs:
        img = Image.open(os.path.join(save_dir, f))
        assert img.size == (64, 64)
