"""Tensor parallelism: a tp-sharded train run must equal the dp run.

sharding_mode="tp" builds a 2-D (data x model) mesh, Megatron-shards the
FROZEN UNet's attention/ff projections on 'model', and replicates the
adapters. The math is unchanged — XLA inserts the per-block psums — so the
trained artifacts must match the plain run on the same seed.
"""

import os

import numpy as np
import pytest
from PIL import Image

from sd_lora_trainer_tpu.config import TrainingConfig
from sd_lora_trainer_tpu.models.synthesize import (
    TINY_CLIP_G_CONFIG,
    TINY_CLIP_L_CONFIG,
    TINY_VAE_CONFIG,
    synthesize_checkpoint,
)
from sd_lora_trainer_tpu.models.unet import TINY_SDXL_UNET_CONFIG
from sd_lora_trainer_tpu.utils.safetensors_io import load_safetensors

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("tp")
    ckpt = str(root / "tiny_sdxl.safetensors")
    synthesize_checkpoint(
        ckpt, "sdxl", TINY_SDXL_UNET_CONFIG, TINY_VAE_CONFIG, TINY_CLIP_L_CONFIG,
        TINY_CLIP_G_CONFIG, seed=0,
    )
    data_dir = root / "dataset"
    data_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (96, 96, 3), np.uint8)).save(
            data_dir / f"img_{i}.jpg"
        )
        (data_dir / f"img_{i}.txt").write_text(f"test pattern {i}")
    return {"ckpt": ckpt, "data": str(data_dir), "root": root}


def _run(tiny_env, name, **overrides):
    from sd_lora_trainer_tpu.main import train

    cfg = dict(
        name=name,
        lora_training_urls=tiny_env["data"],
        concept_mode="style",
        caption_model="no_caption",
        sd_model_version="sdxl",
        ckpt_path=tiny_env["ckpt"],
        seed=0,
        resolution=64,
        validation_img_size=64,
        train_batch_size=4,
        max_train_steps=4,
        checkpointing_steps=100,
        n_sample_imgs=1,
        lora_rank=4,
        skip_gpt_cleanup=True,
        augment_imgs_up_to_n=0,
        output_dir=str(tiny_env["root"] / f"runs_{name}"),
    )
    cfg.update(overrides)
    gen = train(TrainingConfig(**cfg))
    while True:
        try:
            next(gen)
        except StopIteration as stop:
            return stop.value


def _adapters(save_dir):
    tensors = {}
    for f in os.listdir(save_dir):
        if f.endswith("_lora.safetensors") or f.endswith("_embeddings.safetensors"):
            tensors.update(load_safetensors(os.path.join(save_dir, f)))
    assert tensors
    return tensors


def test_tp_run_equals_dp_run(tiny_env, eight_cpu_devices):
    # quantize_base pinned off: "auto" resolves to int8 for SDXL LoRA under
    # dp but (by design) to none under tp, which would make the two runs
    # differ by the int8 rounding — this test isolates sharding equivalence
    _, dir_dp = _run(
        tiny_env, "tpdp", sharding_mode="dp", mesh_data_parallel=4,
        quantize_base="none",
    )
    _, dir_tp = _run(
        tiny_env, "tptp", sharding_mode="tp",
        mesh_data_parallel=8, mesh_model_parallel=2,  # 4 data x 2 model
        quantize_base="none",
    )
    a, b = _adapters(dir_dp), _adapters(dir_tp)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(
            np.asarray(a[k], np.float32), np.asarray(b[k], np.float32),
            rtol=1e-4, atol=1e-6, err_msg=k,
        )


def test_tp_falls_back_when_indivisible(tiny_env, capsys):
    # full finetune requests fsdp, not tp: tp on a non-lora run falls back
    _, save_dir = _run(
        tiny_env, "tpfall", sharding_mode="tp", is_lora=False,
        mesh_data_parallel=8, mesh_model_parallel=2,
    )
    assert os.path.exists(os.path.join(save_dir, "training_args.json"))
