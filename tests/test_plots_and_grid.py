"""Debug plotting + validation grid tests (write real PNGs/JPEGs)."""

import os

import numpy as np
import pytest
from PIL import Image

from sd_lora_trainer_tpu.data.io import make_validation_img_grid
from sd_lora_trainer_tpu.utils.plots import (
    plot_grad_norms,
    plot_loss,
    plot_lrs,
    plot_param_histogram,
    plot_token_stds,
)

matplotlib = pytest.importorskip("matplotlib")


def test_plot_loss_writes_png(tmp_path):
    losses = {
        "img_loss": list(np.random.rand(60) + 0.5),
        "tot_loss": list(np.random.rand(60) + 0.6),
        "short": [1.0, 0.9],  # too short for savgol smoothing branch
    }
    out = str(tmp_path / "losses.png")
    plot_loss(losses, out)
    assert os.path.getsize(out) > 1000


def test_other_plots_write_pngs(tmp_path):
    plot_lrs({"unet": [1e-4, 2e-4], "ti": [1e-3, 9e-4]}, str(tmp_path / "lrs.png"))
    plot_grad_norms({"total": [0.5, 0.4, 0.3]}, str(tmp_path / "gn.png"))
    plot_token_stds(
        {"te1_token_0": [0.01, 0.012]}, str(tmp_path / "stds.png"),
        target_value_dict={"te1_target": 0.014},
    )
    plot_param_histogram(np.random.randn(1000) * 0.1, str(tmp_path / "hist.png"))
    for f in ("lrs.png", "gn.png", "stds.png", "hist.png"):
        assert os.path.getsize(tmp_path / f) > 1000, f


def test_validation_grid(tmp_path):
    for i in range(5):
        Image.new("RGB", (32, 32), (i * 40, 10, 10)).save(tmp_path / f"img_0000_{i}.jpg")
    out = make_validation_img_grid(str(tmp_path))
    grid = Image.open(out)
    # 5 images -> 4 cols x 2 rows of 32px tiles
    assert grid.size == (128, 64)


def test_validation_grid_empty_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        make_validation_img_grid(str(tmp_path))
