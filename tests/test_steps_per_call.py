"""steps_per_call (scan-of-steps) equivalence: K=4 must equal K=1 exactly.

The train loop can run K optimizer steps per jitted call (lax.scan over a
K-stacked batch) to amortize dispatch overhead. Host batch draws happen in
the same order (K sequential draws per call) and the per-step device PRNG
keys derive from the scanned step counter, so the trained result must be
IDENTICAL — pinned here end-to-end through the exported artifacts.
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
    root = tmp_path_factory.mktemp("spc")
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
        train_batch_size=2,
        max_train_steps=8,
        checkpointing_steps=100,
        n_sample_imgs=1,
        lora_rank=4,
        skip_gpt_cleanup=True,
        augment_imgs_up_to_n=0,
        output_dir=str(tiny_env["root"] / f"runs_{name}"),
    )
    cfg.update(overrides)
    gen = train(TrainingConfig(**cfg))
    progress = []
    while True:
        try:
            progress.append(next(gen))
        except StopIteration as stop:
            return stop.value, progress


def _adapters(save_dir):
    tensors = {}
    for f in os.listdir(save_dir):
        if f.endswith("_lora.safetensors") or f.endswith("_embeddings.safetensors"):
            for k, v in load_safetensors(os.path.join(save_dir, f)).items():
                tensors[k] = v
    assert tensors
    return tensors


def test_scan_equals_stepwise(tiny_env):
    (_, dir_k1), prog1 = _run(tiny_env, "spc1", steps_per_call=1)
    (_, dir_k4), prog4 = _run(tiny_env, "spc4", steps_per_call=4)

    a, b = _adapters(dir_k1), _adapters(dir_k4)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(
            np.asarray(a[k], np.float32), np.asarray(b[k], np.float32),
            rtol=1e-5, atol=1e-7, err_msg=k,
        )
    # both report completion; K=4 just yields at coarser granularity
    assert prog1 and prog4 and len(prog4) <= len(prog1)


def test_rounding_and_loss_series(tiny_env):
    """max_train_steps not divisible by K rounds up; per-step metrics are
    still recorded individually (the scan returns [K]-stacked metrics)."""
    import json

    (cfg, save_dir), _ = _run(tiny_env, "spc5", max_train_steps=6, steps_per_call=4)
    args = json.load(open(os.path.join(save_dir, "training_args.json")))
    finals = args["training_attributes"]["final_losses"]
    # 6 rounds up to 8 steps -> at least 5 recorded img_loss values to slice
    assert len(finals["img_loss"]) == 5
    assert all(np.isfinite(v) for v in finals["img_loss"])
