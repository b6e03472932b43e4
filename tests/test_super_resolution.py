"""Swin2SR super-resolution stage: gated upscale + loud passthrough.

Reference behavior: trainer/preprocess.py:118-163 (swin_ir_sr) + :785-788
(<50-image datasets get sub-threshold images upscaled). Uses a tiny random
Swin2SR checkpoint staged into model_paths['SR'] — exercises the real
transformers model path without full-size weights.
"""

import numpy as np
import pytest
from PIL import Image

from sd_lora_trainer_tpu.config import model_paths
from sd_lora_trainer_tpu.data.super_resolution import (
    maybe_upscale_small_dataset,
    sr_available,
    swin_ir_sr,
)


@pytest.fixture
def tiny_sr_model(tmp_path):
    """Stage a tiny random Swin2SR (2x) under model_paths['SR']."""
    from transformers import Swin2SRConfig, Swin2SRForImageSuperResolution

    cfg = Swin2SRConfig(
        image_size=16, patch_size=1, embed_dim=8, depths=[1], num_heads=[2],
        window_size=2, upscale=2, num_channels=3, mlp_ratio=1.0,
    )
    model_dir = tmp_path / "swin2sr"
    Swin2SRForImageSuperResolution(cfg).save_pretrained(model_dir)
    old = model_paths.get_path("SR")
    model_paths.set_path("SR", str(tmp_path))
    yield str(model_dir)
    model_paths.set_path("SR", old)


def _img(w, h):
    return Image.fromarray(np.random.randint(0, 255, (h, w, 3), np.uint8))


def test_swin_ir_sr_upscales_small_passes_large(tiny_sr_model):
    small, large = _img(20, 24), _img(64, 64)
    out = swin_ir_sr([small, large], target_size=(32, 32))
    # small image went through the 2x model (padded to window multiples first)
    assert out[0].size[0] >= 2 * small.size[0]
    assert out[0].size[1] >= 2 * small.size[1]
    # large image passes through untouched (identity, not a copy-resize)
    assert out[1] is large


def test_maybe_upscale_small_dataset_gating(tiny_sr_model):
    assert sr_available()
    imgs = [_img(20, 20), _img(100, 100)]
    out, backend = maybe_upscale_small_dataset(imgs, train_img_size=(64, 64))
    assert backend == "swin2sr"
    assert out[0].size[0] >= 40 and out[1] is imgs[1]

    # dataset >= 50 images: no SR regardless of sizes
    many = [_img(20, 20)] * 50
    out, backend = maybe_upscale_small_dataset(many, train_img_size=(64, 64))
    assert backend == "passthrough" and out is many

    # nothing below threshold: passthrough
    out, backend = maybe_upscale_small_dataset([_img(100, 100)], train_img_size=(64, 64))
    assert backend == "passthrough"


def test_maybe_upscale_degrades_loudly_without_weights(tmp_path):
    old = model_paths.get_path("SR")
    model_paths.set_path("SR", str(tmp_path / "empty"))
    try:
        assert not sr_available()
        imgs = [_img(20, 20)]
        out, backend = maybe_upscale_small_dataset(imgs, train_img_size=(64, 64))
        assert backend is None  # caller records the degradation
        assert out is imgs
    finally:
        model_paths.set_path("SR", old)
