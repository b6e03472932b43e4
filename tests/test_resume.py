"""Resume end-to-end: interrupt + resume must equal an uninterrupted run.

The reference cannot resume at all — its checkpoints are export-only
artifacts, never optimizer state (trainer/checkpoint.py, SURVEY.md §5). Here
`save_train_state=True` persists the full TrainState (trainable + optimizer
moments + step + PRNG key) via orbax, and `resume_from` restores it: a run
interrupted at step 4 and resumed for 4 more must produce the identical
final adapters to one uninterrupted 8-step run (same data order, same
caption-dropout stream, same per-step noise keys).
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
    root = tmp_path_factory.mktemp("resume")
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
    while True:
        try:
            next(gen)
        except StopIteration as stop:
            return stop.value


def _load_artifacts(save_dir):
    tensors = {}
    for f in os.listdir(save_dir):
        if f.endswith("_lora.safetensors") or f.endswith("_embeddings.safetensors"):
            tensors.update(
                {f"{f}:{k}": v for k, v in load_safetensors(os.path.join(save_dir, f)).items()}
            )
    assert tensors, f"no adapter artifacts in {save_dir}"
    return tensors


def test_interrupt_resume_equals_uninterrupted(tiny_env):
    # A: an 8-step run KILLED after step 4 — the rolling train_state
    # (refreshed every checkpointing_steps, here 4) is what survives the
    # crash. Same config horizon as the uninterrupted run, so every LR
    # schedule sees identical fractions.
    from sd_lora_trainer_tpu.main import train

    cfg_a = TrainingConfig(
        name="resA", lora_training_urls=tiny_env["data"], concept_mode="style",
        caption_model="no_caption", sd_model_version="sdxl",
        ckpt_path=tiny_env["ckpt"], seed=0, resolution=64,
        validation_img_size=64, train_batch_size=2, max_train_steps=8,
        checkpointing_steps=4, n_sample_imgs=1, lora_rank=4,
        skip_gpt_cleanup=True, augment_imgs_up_to_n=0,
        save_train_state=True,
        # the simulated crash needs step-granular yields; B and C below run
        # with the default steps_per_call (also proving K-mixed resume
        # equivalence: B resumes A's K=1 state under K>1)
        steps_per_call=1,
        output_dir=str(tiny_env["root"] / "runs_resA"),
    )
    gen = train(cfg_a)
    for _ in range(4):  # progress yields once per step at this run length
        next(gen)
    gen.close()  # simulated crash after step 4
    state_path = os.path.join(str(cfg_a.output_dir), "train_state")
    assert os.path.exists(state_path), "rolling train_state not written"

    # B: resume from A's crash state, run to step 8
    _, dir_b = _run(tiny_env, "resB", max_train_steps=8, resume_from=state_path)

    # C: uninterrupted 8 steps
    _, dir_c = _run(tiny_env, "resC", max_train_steps=8)

    art_b = _load_artifacts(dir_b)
    art_c = _load_artifacts(dir_c)
    # artifact filenames embed the run name; compare by key suffix
    norm = lambda d: {k.split(":", 1)[1]: v for k, v in d.items()}
    b, c = norm(art_b), norm(art_c)
    assert set(b) == set(c)
    for k in b:
        np.testing.assert_allclose(
            np.asarray(b[k], np.float32), np.asarray(c[k], np.float32),
            rtol=1e-5, atol=1e-7, err_msg=k,
        )

    # A2/B2: crash at step 5 — NOT a multiple of the resume run's
    # steps_per_call (default 4) — so the host-RNG fast-forward must replay
    # one full K-group plus one single draw (main.py resume replay), and the
    # remaining 3 steps exercise the trainer's sub-K tail. Must still equal
    # the uninterrupted run C bit-for-bit.
    cfg_a2 = TrainingConfig(
        name="resA2", lora_training_urls=tiny_env["data"], concept_mode="style",
        caption_model="no_caption", sd_model_version="sdxl",
        ckpt_path=tiny_env["ckpt"], seed=0, resolution=64,
        validation_img_size=64, train_batch_size=2, max_train_steps=8,
        checkpointing_steps=5, n_sample_imgs=1, lora_rank=4,
        skip_gpt_cleanup=True, augment_imgs_up_to_n=0,
        save_train_state=True, steps_per_call=1,
        output_dir=str(tiny_env["root"] / "runs_resA2"),
    )
    gen = train(cfg_a2)
    for _ in range(5):
        next(gen)
    gen.close()
    state_path2 = os.path.join(str(cfg_a2.output_dir), "train_state")
    assert os.path.exists(state_path2), "rolling train_state not written at 5"
    _, dir_b2 = _run(tiny_env, "resB2", max_train_steps=8, resume_from=state_path2)
    b2 = norm(_load_artifacts(dir_b2))
    assert set(b2) == set(c)
    for k in b2:
        np.testing.assert_allclose(
            np.asarray(b2[k], np.float32), np.asarray(c[k], np.float32),
            rtol=1e-5, atol=1e-7, err_msg=k,
        )


def test_resume_past_end_raises(tiny_env):
    _, dir_a = _run(tiny_env, "resD", max_train_steps=4, save_train_state=True)
    state_path = os.path.join(dir_a, "train_state")
    with pytest.raises(ValueError, match="nothing to train"):
        _run(tiny_env, "resE", max_train_steps=4, resume_from=state_path)
