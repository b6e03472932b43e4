"""Additional end-to-end paths: bucketed training, token warmup, CLI
invocation, full-finetune training run."""

import json
import os
import subprocess
import sys

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
    root = tmp_path_factory.mktemp("e2e_extras")
    ckpt = str(root / "tiny_sdxl.safetensors")
    synthesize_checkpoint(
        ckpt, "sdxl", TINY_SDXL_UNET_CONFIG, TINY_VAE_CONFIG, TINY_CLIP_L_CONFIG,
        TINY_CLIP_G_CONFIG, seed=0,
    )
    data_dir = root / "dataset"
    data_dir.mkdir()
    rng = np.random.RandomState(0)
    # mixed aspect ratios to exercise bucketing
    for i, (w, h) in enumerate([(96, 96), (128, 64), (64, 128), (96, 96), (128, 64), (96, 96)]):
        Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(data_dir / f"img_{i}.jpg")
        (data_dir / f"img_{i}.txt").write_text(f"test pattern {i}")
    return {"ckpt": ckpt, "data": str(data_dir), "root": root}


def _run_train(tiny_env, **overrides):
    from sd_lora_trainer_tpu.main import train

    cfg_kwargs = dict(
        name="extras",
        lora_training_urls=tiny_env["data"],
        concept_mode="style",
        caption_model="no_caption",
        sd_model_version="sdxl",
        ckpt_path=tiny_env["ckpt"],
        seed=0,
        resolution=64,
        validation_img_size=64,
        train_batch_size=2,
        max_train_steps=3,
        checkpointing_steps=100,
        n_sample_imgs=1,
        lora_rank=4,
        skip_gpt_cleanup=True,
        augment_imgs_up_to_n=0,
        output_dir=str(tiny_env["root"] / "runs"),
    )
    cfg_kwargs.update(overrides)
    config = TrainingConfig(**cfg_kwargs)
    gen = train(config)
    while True:
        try:
            next(gen)
        except StopIteration as stop:
            return stop.value


def test_full_finetune_run(tiny_env):
    """is_lora=False: the whole UNet trains; exports the LDM unet."""
    config, save_dir = _run_train(tiny_env, name="fullft", is_lora=False, unet_lr=1e-5)
    files = os.listdir(save_dir)
    assert "unet_finetuned.safetensors" in files, files
    assert not any(f.endswith("_lora.safetensors") for f in files)
    assert any(f.endswith("embeddings.safetensors") for f in files)  # TI still trains


def test_token_warmup_runs(tiny_env):
    """token_warmup_steps + a gpt_description triggers text-only warmup."""
    from sd_lora_trainer_tpu.main import train

    config = TrainingConfig(
        name="warmup",
        lora_training_urls=tiny_env["data"],
        concept_mode="object",
        caption_model="no_caption",
        sd_model_version="sdxl",
        ckpt_path=tiny_env["ckpt"],
        seed=0,
        resolution=64,
        validation_img_size=64,
        train_batch_size=2,
        max_train_steps=2,
        checkpointing_steps=100,
        n_sample_imgs=1,
        lora_rank=4,
        token_warmup_steps=3,
        skip_gpt_cleanup=True,
        augment_imgs_up_to_n=0,
        crop_based_on_salience=False,
        mask_target_prompts=None,
        output_dir=str(tiny_env["root"] / "runs_warmup"),
    )
    # inject a concept description the warmup needs (normally from GPT)
    config.training_attributes["gpt_description"] = "a colorful test pattern"
    gen = train(config)
    while True:
        try:
            next(gen)
        except StopIteration as stop:
            config, save_dir = stop.value
            break
    assert os.path.exists(os.path.join(save_dir, "special_params.json"))


def test_cli_subprocess(tiny_env):
    """`python main.py <config.json>` runs end to end (the reference's CLI
    surface, main.py:554-568)."""
    cfg = dict(
        name="cli",
        lora_training_urls=tiny_env["data"],
        concept_mode="style",
        caption_model="no_caption",
        sd_model_version="sdxl",
        ckpt_path=tiny_env["ckpt"],
        seed=0,
        resolution=64,
        validation_img_size=64,
        train_batch_size=2,
        max_train_steps=2,
        checkpointing_steps=100,
        n_sample_imgs=1,
        lora_rank=4,
        skip_gpt_cleanup=True,
        augment_imgs_up_to_n=0,
        output_dir=str(tiny_env["root"] / "runs_cli"),
    )
    cfg_path = tiny_env["root"] / "cli_config.json"
    cfg_path.write_text(json.dumps(cfg))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    result = subprocess.run(
        [sys.executable, "main.py", str(cfg_path)],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    assert "Training done :)" in result.stdout


def test_bucketed_training_run(tiny_env):
    """aspect_ratio_bucketing=True drives the per-bucket latent caches and
    BucketPlan batching through the real train loop (the path that is broken
    in the reference, dataset.py:115-136)."""
    config, save_dir = _run_train(
        tiny_env, name="bucketed", aspect_ratio_bucketing=True, max_train_steps=3,
        debug=True,
    )
    files = os.listdir(save_dir)
    assert any(f.endswith("_lora.safetensors") for f in files)
    args = json.load(open(os.path.join(save_dir, "training_args.json")))
    assert args["aspect_ratio_bucketing"] is True

    # debug mode drops a source snapshot in the output dir (reference
    # main.py:538-543) — the zip contains the package's .py files
    import zipfile

    zip_path = os.path.join(str(config.output_dir), "source_code.zip")
    assert os.path.exists(zip_path), os.listdir(str(config.output_dir))
    names = zipfile.ZipFile(zip_path).namelist()
    assert any(n.endswith("main.py") for n in names)
    assert any(n.endswith("training/step.py") for n in names)


def test_render_images_eval_from_disk(tiny_env):
    """render_images_eval: full from-disk rebuild + adapter load + render
    (reference: trainer/inference.py:409-493)."""
    import jax.numpy as jnp

    config, save_dir = _run_train(tiny_env, name="evalrender", max_train_steps=2)
    from sd_lora_trainer_tpu.inference import render_images_eval

    prompts = render_images_eval(
        tiny_env["ckpt"], save_dir, render_size=(64, 64), seed=1, n_imgs=1,
        n_steps=4, dtype=jnp.float32,
    )
    assert len(prompts) == 1
    # renders with train_step=0 prefix
    assert any(f.startswith("img_0000_") for f in os.listdir(save_dir))


def test_mesh_sharded_training_run(tiny_env):
    """train_batch_size divisible by the 8 virtual devices engages the mesh
    path inside train() (DP batch sharding + replicated adapters)."""
    config, save_dir = _run_train(
        tiny_env, name="meshdp", train_batch_size=8, max_train_steps=2
    )
    assert any(f.endswith("_lora.safetensors") for f in os.listdir(save_dir))


def test_bucketed_steps_per_call(tiny_env):
    """steps_per_call>1 now survives bucketing: each jitted call groups K
    same-resolution batches (grouped drawing in main.py:draw_bucketed; the
    buffered sampler preserves the plan's marginal bucket frequencies)."""
    config, save_dir = _run_train(
        tiny_env, name="bucketk", aspect_ratio_bucketing=True,
        max_train_steps=4, steps_per_call=2,
    )
    files = os.listdir(save_dir)
    assert any(f.endswith("_lora.safetensors") for f in files)
    args = json.load(open(os.path.join(save_dir, "training_args.json")))
    assert args["aspect_ratio_bucketing"] is True
    losses = args["training_attributes"]["final_losses"]["img_loss"]
    assert losses and all(np.isfinite(x) for x in losses)


def test_quantize_base_training_run(tiny_env, capsys):
    """quantize_base="int8" end-to-end: the frozen UNet trains as int8
    codes+scales (main.py wiring), adapters export normally, and the
    validation render merges LoRA over the dequantized base (merge_lora on
    QTensor leaves)."""
    config, save_dir = _run_train(
        tiny_env, name="baseq", quantize_base="int8",
        remat="save:attn_out*",
    )
    out = capsys.readouterr().out
    assert "[quantize_base] frozen UNet kernels -> int8" in out
    files = os.listdir(save_dir)
    assert any(f.endswith("_lora.safetensors") for f in files)
    args = json.load(open(os.path.join(save_dir, "training_args.json")))
    losses = args["training_attributes"]["final_losses"]["img_loss"]
    assert losses and all(np.isfinite(x) for x in losses)
    # the render path produced sample images over the quantized base
    assert any(f.startswith("img_") for f in files), files


def test_union_bucketing_ragged_tail_stash8(tiny_env):
    """The round-4 feature union in one run: bucketing + K-scan with a
    ragged single-step tail (7 = 3x2 + 1) + an int8 stash8 remat plan."""
    config, save_dir = _run_train(
        tiny_env, name="union", aspect_ratio_bucketing=True,
        max_train_steps=7, steps_per_call=2,
        remat="save:attn_out*,xattn_out*,ff_hidden*",
        remat_stash8="attn_out*,xattn_out*,ff_hidden*",
    )
    files = os.listdir(save_dir)
    assert any(f.endswith("_lora.safetensors") for f in files)
    # exact horizon: the final checkpoint is at step 7, not a K-rounded 8
    assert save_dir.rstrip("/").endswith("checkpoint-7"), save_dir
    args = json.load(open(os.path.join(save_dir, "training_args.json")))
    losses = args["training_attributes"]["final_losses"]["img_loss"]
    assert losses and all(np.isfinite(x) for x in losses)
