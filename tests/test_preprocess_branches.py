"""Preprocess branch coverage: TOK handling, disable_ti rewrite,
prompt_modifier, validation-size derivation, mask-mode radii
(reference: trainer/preprocess.py:706-938)."""

import os

import numpy as np
import pytest
from PIL import Image

from sd_lora_trainer_tpu.config import TrainingConfig
from sd_lora_trainer_tpu.data.preprocess import preprocess


def _dataset(tmp_path, n=3, size=(96, 96), captions=True):
    d = tmp_path / "raw"
    d.mkdir(exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        Image.fromarray(rng.randint(0, 255, (size[1], size[0], 3), np.uint8)).save(
            d / f"img_{i}.jpg"
        )
        if captions:
            (d / f"img_{i}.txt").write_text(f"caption number {i}")
    return str(d)


def _cfg(tmp_path, **kw):
    base = dict(
        name="pp",
        lora_training_urls="unused",
        concept_mode="style",
        caption_model="no_caption",
        sd_model_version="sd15",
        ckpt_path="unused.safetensors",
        seed=0,
        resolution=64,
        skip_gpt_cleanup=True,
        augment_imgs_up_to_n=0,
        left_right_flip_augmentation=False,
        output_dir=str(tmp_path / "out"),
        _testing_no_output_dir=True,
    )
    base.update(kw)
    cfg = TrainingConfig(**base)
    os.makedirs(cfg.output_dir, exist_ok=True)
    return cfg


def _run(tmp_path, cfg, data):
    return preprocess(
        cfg,
        working_directory=cfg.output_dir,
        concept_mode=cfg.concept_mode,
        input_zip_path=data,
        caption_text=cfg.caption_prefix,
        mask_target_prompts=cfg.mask_target_prompts,
        target_size=cfg.resolution,
        crop_based_on_salience=cfg.crop_based_on_salience,
        use_face_detection_instead=cfg.use_face_detection_instead,
        left_right_flip_augmentation=cfg.left_right_flip_augmentation,
        augment_imgs_up_to_n=cfg.augment_imgs_up_to_n,
        caption_model=cfg.caption_model,
        seed=cfg.seed,
    )


def test_tok_injected_when_ti_enabled(tmp_path):
    data = _dataset(tmp_path)
    cfg = _cfg(tmp_path, disable_ti=False)
    cfg, out_dir = _run(tmp_path, cfg, data)
    import pandas as pd

    caps = pd.read_csv(os.path.join(out_dir, "captions.csv"))["caption"]
    assert all("TOK" in c for c in caps), list(caps)
    assert cfg.training_attributes["trigger_text"].startswith("in the style of TOK")


def test_disable_ti_strips_tok(tmp_path):
    data = _dataset(tmp_path)
    cfg = _cfg(tmp_path, disable_ti=True)
    cfg, out_dir = _run(tmp_path, cfg, data)
    import pandas as pd

    caps = pd.read_csv(os.path.join(out_dir, "captions.csv"))["caption"]
    assert all("TOK" not in c for c in caps), list(caps)


def test_prompt_modifier_applied(tmp_path):
    data = _dataset(tmp_path)
    cfg = _cfg(tmp_path, prompt_modifier="masterpiece, {}")
    cfg, out_dir = _run(tmp_path, cfg, data)
    import pandas as pd

    caps = pd.read_csv(os.path.join(out_dir, "captions.csv"))["caption"]
    assert all(c.startswith(("TOK, masterpiece", "masterpiece")) for c in caps), list(caps)


def test_lr_flips_double_dataset(tmp_path):
    data = _dataset(tmp_path, n=3)
    cfg = _cfg(tmp_path, left_right_flip_augmentation=True, concept_mode="object")
    cfg, out_dir = _run(tmp_path, cfg, data)
    srcs = [f for f in os.listdir(out_dir) if f.endswith(".src.jpg")]
    assert len(srcs) == 6


def test_augment_up_to_n(tmp_path):
    data = _dataset(tmp_path, n=3)
    cfg = _cfg(tmp_path, augment_imgs_up_to_n=7)
    cfg, out_dir = _run(tmp_path, cfg, data)
    srcs = [f for f in os.listdir(out_dir) if f.endswith(".src.jpg")]
    assert len(srcs) >= 7  # 3 originals + >=1 full augmentation round


def test_train_img_size_follows_aspect(tmp_path):
    data = _dataset(tmp_path, size=(128, 64))  # 2:1 landscape
    cfg = _cfg(tmp_path, resolution=128)
    cfg, out_dir = _run(tmp_path, cfg, data)
    w, h = cfg.train_img_size
    assert w > h
    assert w % 64 == 0 and h % 64 == 0
    # validation size derived (sd15: 1x multiplier), /64-rounded
    vw, vh = cfg.validation_img_size
    assert vw % 64 == 0 and vh % 64 == 0


def test_outputs_are_uniform_size(tmp_path):
    data = _dataset(tmp_path, n=2, size=(100, 90))
    cfg = _cfg(tmp_path)
    cfg, out_dir = _run(tmp_path, cfg, data)
    sizes = {
        Image.open(os.path.join(out_dir, f)).size
        for f in os.listdir(out_dir)
        if f.endswith(".src.jpg")
    }
    assert len(sizes) == 1  # salience-cropped to one aspect/size
